"""Multi-chip execution through the facade: SAFE.mesh shards APSP and the
permutation null, and results agree with single-device runs."""

import networkx as nx
import numpy as np
import pandas as pd
import pytest

from safepy_tpu import SAFE
from safepy_tpu.parallel import make_mesh


@pytest.fixture(scope="module")
def network(tmp_path_factory):
    g = nx.connected_watts_strogatz_graph(64, 6, 0.3, seed=21)
    path = tmp_path_factory.mktemp("mesh") / "net.txt"
    with open(path, "w") as f:
        for u, v in g.edges():
            f.write(f"g{u}\tg{v}\t1.0\n")
    return str(path)


def _run(network, mesh, perms=160):
    sf = SAFE(verbose=False)
    sf.random_seed = 31
    sf.mesh = mesh
    sf.load_network(network_file=network, node_key_attribute="key")
    sf.define_neighborhoods()
    n = sf.graph.number_of_nodes()
    rng = np.random.default_rng(4)
    df = pd.DataFrame(rng.normal(size=(n, 1)),
                      index=[f"g{i}" for i in range(n)], columns=["q"])
    sf.load_attributes(attribute_file=df)
    sf.compute_pvalues(num_permutations=perms)
    return sf


@pytest.mark.slow
def test_mesh_neighborhoods_match_single(network):
    single = _run(network, None)
    meshed = _run(network, make_mesh({"data": 4, "perm": 2}))
    np.testing.assert_array_equal(single.neighborhoods, meshed.neighborhoods)


def test_mesh_null_statistics_agree(network):
    single = _run(network, None)
    meshed = _run(network, make_mesh({"perm": 8}))
    assert meshed.num_permutations == 160  # divisible: no round-up
    # independent keyed nulls: p-values agree within binomial noise
    diff = np.abs(single.pvalues_pos - meshed.pvalues_pos)
    assert np.nanmax(diff) < 0.25


def test_mesh_round_up(network):
    meshed = _run(network, make_mesh({"perm": 8}), perms=100)
    assert meshed.num_permutations == 104  # ceil(100/8)*8
    p_sum = meshed.pvalues_neg + meshed.pvalues_pos
    finite = ~np.isnan(p_sum)
    assert (p_sum[finite] >= 1.0 - 1e-9).all()


def test_run_pipeline_with_mesh(network):
    sf = SAFE(verbose=False)
    sf.random_seed = 31
    sf.mesh = make_mesh({"perm": 8})
    sf.load_network(network_file=network, node_key_attribute="key")
    n = sf.graph.number_of_nodes()
    rng = np.random.default_rng(4)
    df = pd.DataFrame(rng.normal(size=(n, 1)),
                      index=[f"g{i}" for i in range(n)], columns=["q"])
    sf.load_attributes(attribute_file=df)
    sf.run_pipeline(num_permutations=80)  # falls back to sharded stage path
    assert sf.nes is not None


def test_mesh_session_pickles(network, tmp_path):
    """SAFE.save must work with a mesh set (Device objects aren't picklable)."""
    import pickle
    sf = _run(network, make_mesh({"perm": 8}), perms=16)
    out = tmp_path / "mesh_session.p"
    sf.save(output_file=str(out))
    with open(out, "rb") as f:
        sf2 = pickle.load(f)
    assert sf2.mesh is None
    np.testing.assert_array_equal(sf2.neighborhoods, sf.neighborhoods)


def _binary_frame(n, rng):
    vals = np.zeros((n, 6))
    vals[: n // 2, :3] = (rng.random((n // 2, 3)) < 0.7)
    vals[n // 2:, 3:] = (rng.random((n - n // 2, 3)) < 0.7)
    return pd.DataFrame(vals, index=[f"g{i}" for i in range(n)],
                        columns=[f"a{i}" for i in range(6)])


def _run_binary(network, mesh, **pv_kwargs):
    sf = SAFE(verbose=False)
    sf.random_seed = 31
    sf.mesh = mesh
    sf.load_network(network_file=network, node_key_attribute="key")
    sf.define_neighborhoods()
    sf.load_attributes(attribute_file=_binary_frame(
        sf.graph.number_of_nodes(), np.random.default_rng(9)))
    sf.compute_pvalues(**pv_kwargs)
    return sf


def test_mesh_hypergeom_engine(network):
    """The staged facade reaches the column-sharded hypergeometric engine
    (census + sf tail inside the shard_map workers) and matches single-device."""
    single = _run_binary(network, None)
    meshed = _run_binary(network, make_mesh({"data": 2, "attr": 4}))
    # the mesh path stores log-sf in f32 (device finalization); the staged
    # single path finalizes in host f64 -> ~2e-8 relative, inside the 1e-6 budget
    assert np.nanmax(np.abs(single.pvalues_pos - meshed.pvalues_pos)) <= 1e-6
    np.testing.assert_array_equal(single.nes_binary, meshed.nes_binary)
    np.testing.assert_allclose(single.nes, meshed.nes, rtol=1e-5, atol=1e-6)


def test_mesh_hypergeom_engine_fdr(network):
    single = _run_binary(network, None, multiple_testing=True)
    meshed = _run_binary(network, make_mesh({"attr": 8}), multiple_testing=True)
    assert np.nanmax(np.abs(single.pvalues_pos - meshed.pvalues_pos)) <= 1e-6
    np.testing.assert_array_equal(single.nes_binary, meshed.nes_binary)


@pytest.mark.slow
def test_run_pipeline_mesh_fused_hypergeom(network):
    """run_pipeline composes the mesh with the FUSED program (sharded FW +
    sharded sf tail in one dispatch) instead of falling back to stages."""
    def _pipeline(mesh):
        sf = SAFE(verbose=False)
        sf.random_seed = 31
        sf.mesh = mesh
        sf.load_network(network_file=network, node_key_attribute="key")
        sf.load_attributes(attribute_file=_binary_frame(
            sf.graph.number_of_nodes(), np.random.default_rng(9)))
        sf.run_pipeline()
        return sf

    single = _pipeline(None)
    meshed = _pipeline(make_mesh({"data": 2, "attr": 4}))
    np.testing.assert_array_equal(single.neighborhoods, meshed.neighborhoods)
    np.testing.assert_array_equal(single.nes_binary, meshed.nes_binary)
    assert np.nanmax(np.abs(single.pvalues_pos - meshed.pvalues_pos)) <= 1e-9


def test_run_pipeline_mesh_fused_permutation_exact_replay(network):
    """Bit-exact correctness pin for the sharded null (not a tolerance): the
    psum-reduced sharded counts must equal the same per-device keys replayed
    through scan_counts on a single device (the reference's host sum over
    worker results, safe.py:516-519, as an identity)."""
    import jax
    import jax.numpy as jnp

    from safepy_tpu.ops import permutation as perm_ops
    from safepy_tpu.ops import score as score_ops

    mesh = make_mesh({"perm": 8})
    sf = SAFE(verbose=False)
    sf.random_seed = 31
    sf.mesh = mesh
    sf.load_network(network_file=network, node_key_attribute="key")
    n = sf.graph.number_of_nodes()
    rng = np.random.default_rng(4)
    df = pd.DataFrame(rng.normal(size=(n, 1)),
                      index=[f"g{i}" for i in range(n)], columns=["q"])
    sf.load_attributes(attribute_file=df)
    sf.run_pipeline(num_permutations=80)
    assert sf.num_permutations == 80
    sharded_pos = np.rint(sf.pvalues_pos * sf.num_permutations)
    sharded_neg = np.rint(sf.pvalues_neg * sf.num_permutations)

    # replay: same key split, same per-device count and batch size, one device
    n2a = sf.node2attribute
    valid = np.flatnonzero(np.sum(~np.isnan(n2a), axis=1))
    nbr = jnp.asarray(sf.neighborhoods, jnp.float32)
    obs = score_ops.compute_neighborhood_score(nbr, n2a, "sum", "highest")
    nbr_valid, vals, mask = perm_ops.prepare_valid(nbr, n2a, valid)
    per_dev = 80 // 8
    batch = perm_ops.default_batch_size(len(valid), n2a.shape[1], per_dev)
    keys = jax.random.split(jax.random.PRNGKey(31), 8)
    total_neg = np.zeros(obs.shape, np.int64)
    total_pos = np.zeros(obs.shape, np.int64)
    for device in range(8):
        cn, cp = perm_ops.scan_counts(nbr_valid, vals, mask, obs, keys[device],
                                      score_type="sum", num_permutations=per_dev,
                                      batch_size=batch)
        total_neg += np.asarray(cn, np.int64)
        total_pos += np.asarray(cp, np.int64)

    finite = ~np.isnan(sf.ns)
    np.testing.assert_array_equal(sharded_pos[finite], total_pos[finite])
    np.testing.assert_array_equal(sharded_neg[finite], total_neg[finite])


def test_mesh_2d_apsp_through_facade(network):
    """A (row, col) mesh routes APSP through the 2-D block-sharded kernel in
    both the staged and fused paths, matching single-device results."""
    single = _run(network, None)
    meshed = _run(network, make_mesh({"row": 2, "col": 4}))
    np.testing.assert_array_equal(single.neighborhoods, meshed.neighborhoods)

    sf = SAFE(verbose=False)
    sf.random_seed = 31
    sf.mesh = make_mesh({"row": 2, "col": 4})
    sf.load_network(network_file=network, node_key_attribute="key")
    n = sf.graph.number_of_nodes()
    rng = np.random.default_rng(4)
    df = pd.DataFrame(rng.normal(size=(n, 1)),
                      index=[f"g{i}" for i in range(n)], columns=["q"])
    sf.load_attributes(attribute_file=df)
    sf.run_pipeline(num_permutations=80)
    np.testing.assert_array_equal(single.neighborhoods, sf.neighborhoods)
