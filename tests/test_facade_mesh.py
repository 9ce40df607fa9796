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
