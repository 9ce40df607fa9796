"""Auxiliary subsystems: stage timers, npz checkpoint/resume, scatter pipeline."""

import logging
import os

import networkx as nx
import numpy as np
import pandas as pd
import pytest

from safepy_tpu import SAFE
from safepy_tpu.checkpoint import load_session, save_session
from safepy_tpu.profiling import StageTimer, log_compile_time


def test_stage_timer():
    t = StageTimer()
    with t.stage("a"):
        x = sum(range(1000))
    with t.stage("b"):
        pass
    assert set(t.stages) == {"a", "b"}
    report = t.report()
    assert "a:" in report and "total" in report


def test_log_compile_time():
    import jax
    import jax.numpy as jnp
    out = log_compile_time(jax.jit(lambda x: x * 2), jnp.arange(4.0),
                           label="double")
    np.testing.assert_allclose(np.asarray(out), [0, 2, 4, 6])


@pytest.fixture(scope="module")
def analyzed(tmp_path_factory):
    rng = np.random.default_rng(5)
    n = 60
    g = nx.connected_watts_strogatz_graph(n, 4, 0.2, seed=4)
    path = tmp_path_factory.mktemp("ck") / "net.txt"
    with open(path, "w") as f:
        for u, v in g.edges():
            f.write(f"g{u}\tg{v}\t1.0\n")
    sf = SAFE(verbose=False)
    sf.random_seed = 2
    sf.load_network(network_file=str(path), node_key_attribute="key")
    sf.define_neighborhoods()
    labels = [sf.graph.nodes[i]["key"] for i in range(n)]
    vals = (rng.random((n, 4)) < 0.3).astype(float)
    df = pd.DataFrame(vals, index=labels, columns=list("abcd"))
    sf.load_attributes(attribute_file=df)
    sf.compute_pvalues()
    return sf


def test_pickle_stores_compact_statistics(tmp_path):
    """Fused-pipeline sessions keep statistics device-resident and pickle the
    COMPACT forms (int8 indicator, f32 log-survival); the properties
    rematerialize f64 identically after loading — the f64 forms are 3.5 GB
    each at band-GO scale."""
    import pickle

    rng = np.random.default_rng(9)
    n = 80
    g = nx.connected_watts_strogatz_graph(n, 4, 0.2, seed=1)
    path = tmp_path / "net.txt"
    with open(path, "w") as f:
        for u, v in g.edges():
            f.write(f"g{u}\tg{v}\t1.0\n")
    sf = SAFE(verbose=False)
    sf.load_network(network_file=str(path), node_key_attribute="key")
    labels = [sf.graph.nodes[i]["key"] for i in range(n)]
    vals = (rng.random((n, 4)) < 0.3).astype(float)
    sf.load_attributes(attribute_file=pd.DataFrame(vals, index=labels,
                                                   columns=list("abcd")))
    sf.run_pipeline()

    blob = pickle.dumps(sf)  # BEFORE property access materializes f64
    expect_p = sf.pvalues_pos.copy()
    expect_b = sf.nes_binary.copy()
    sf2 = pickle.loads(blob)
    compact_p = sf2._pvalues_pos_np is None
    compact_b = sf2._nes_binary_np is None
    if compact_p:
        assert sf2._logsf_np is not None and sf2._logsf_np.dtype == np.float32
    if compact_b:
        assert sf2._nes_binary_i8_np is not None
        assert sf2._nes_binary_i8_np.dtype == np.int8
    # the fused hypergeometric path keeps both statistics device-resident,
    # so a freshly-analyzed session must pickle at least one compact form
    assert compact_p or compact_b
    np.testing.assert_array_equal(sf2.pvalues_pos, expect_p)
    np.testing.assert_array_equal(sf2.nes_binary, expect_b)
    assert sf2.nes_binary.dtype == np.float64  # public API dtype preserved


def test_checkpoint_roundtrip(analyzed, tmp_path):
    sf = analyzed
    base = str(tmp_path / "session")
    save_session(sf, base)
    assert os.path.exists(base + ".npz")
    assert os.path.exists(base + ".meta.json")

    sf2 = load_session(base, graph=sf.graph, verbose=False)
    np.testing.assert_array_equal(sf2.neighborhoods, sf.neighborhoods)
    np.testing.assert_allclose(sf2.nes, sf.nes, rtol=1e-6)
    np.testing.assert_allclose(sf2.pvalues_pos, sf.pvalues_pos, rtol=1e-6)
    assert list(sf2.attributes["name"]) == list(sf.attributes["name"])
    assert sf2.neighborhood_radius == sf.neighborhood_radius

    # resume: downstream stages run on the restored state
    sf2.define_top_attributes(attribute_enrichment_min_size=2)
    assert "top" in sf2.attributes


def test_scatter_pipeline(tmp_path, rng):
    """Scatter input: edgeless graph, euclidean neighborhoods, graph_euclidean
    pseudo-network for the unimodality check (reference: safe.py:297-309)."""
    n = 50
    coords = rng.uniform(0, 1, (n, 2))
    path = tmp_path / "emb.scatter"
    with open(path, "w") as f:
        f.write("key\tx\ty\tlabel\n")
        for i in range(n):
            f.write(f"k{i}\t{coords[i,0]:.4f}\t{coords[i,1]:.4f}\tlab{i}\n")

    sf = SAFE(verbose=False)
    sf.load_network(network_file=str(path), node_key_attribute="key")
    assert sf.graph.number_of_edges() == 0
    assert sf.graph_euclidean is not None
    assert sf.graph_euclidean.number_of_edges() > 0

    sf.define_neighborhoods(node_distance_metric="euclidean",
                            neighborhood_radius=0.2)
    labels = [f"k{i}" for i in range(n)]
    vals = (rng.random((n, 3)) < 0.3).astype(float)
    df = pd.DataFrame(vals, index=labels, columns=list("xyz"))
    sf.load_attributes(attribute_file=df)
    sf.compute_pvalues()
    sf.define_top_attributes(attribute_enrichment_min_size=2)
    assert "top" in sf.attributes
