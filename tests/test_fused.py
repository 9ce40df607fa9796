"""Fused single-dispatch pipeline == stage-based pipeline, both engines."""

import networkx as nx
import numpy as np
import pandas as pd
import pytest

from safepy_tpu import SAFE


@pytest.fixture(scope="module")
def network(tmp_path_factory):
    g = nx.connected_watts_strogatz_graph(90, 6, 0.3, seed=8)
    path = tmp_path_factory.mktemp("fused") / "net.txt"
    with open(path, "w") as f:
        for u, v in g.edges():
            f.write(f"g{u}\tg{v}\t1.0\n")
    return str(path)


def _mk(network):
    sf = SAFE(verbose=False)
    sf.random_seed = 17
    sf.load_network(network_file=network, node_key_attribute="key")
    return sf


def test_fused_hypergeom_matches_stages(network, rng):
    sf1, sf2 = _mk(network), _mk(network)
    n = sf1.graph.number_of_nodes()
    labels = [sf1.graph.nodes[i]["key"] for i in range(n)]
    vals = (rng.random((n, 5)) < 0.2).astype(float)
    vals[rng.random((n, 5)) < 0.1] = np.nan
    df = pd.DataFrame(vals, index=labels, columns=list("abcde"))

    sf1.load_attributes(attribute_file=df)
    sf1.define_neighborhoods()
    sf1.compute_pvalues()

    sf2.load_attributes(attribute_file=df)
    sf2.run_pipeline()

    np.testing.assert_array_equal(sf1.neighborhoods, sf2.neighborhoods)
    # fused path recovers p host-side as exp(float64(f32 log_sf)): abs<=2e-8
    np.testing.assert_allclose(sf1.pvalues_pos, sf2.pvalues_pos, atol=1e-7)
    ok = np.isfinite(sf1.nes)
    np.testing.assert_allclose(sf1.nes[ok], sf2.nes[ok], rtol=1e-6, atol=1e-5)
    np.testing.assert_array_equal(sf1.nes_binary, sf2.nes_binary)


def test_fused_permutation_matches_stages(network, rng):
    sf1, sf2 = _mk(network), _mk(network)
    n = sf1.graph.number_of_nodes()
    labels = [sf1.graph.nodes[i]["key"] for i in range(n)]
    vals = rng.normal(size=(n, 2))
    vals[rng.random((n, 2)) < 0.2] = np.nan
    df = pd.DataFrame(vals, index=labels, columns=["u", "v"])

    sf1.load_attributes(attribute_file=df)
    sf1.define_neighborhoods()
    sf1.compute_pvalues(num_permutations=120)

    sf2.load_attributes(attribute_file=df)
    sf2.run_pipeline(num_permutations=120)

    # identical seeds + identical batching -> identical counts
    np.testing.assert_array_equal(sf1.neighborhoods, sf2.neighborhoods)
    np.testing.assert_allclose(sf1.pvalues_pos, sf2.pvalues_pos, equal_nan=True)
    np.testing.assert_allclose(sf1.nes, sf2.nes, equal_nan=True)


def test_fused_falls_back_for_euclidean(network, rng):
    sf = _mk(network)
    n = sf.graph.number_of_nodes()
    labels = [sf.graph.nodes[i]["key"] for i in range(n)]
    df = pd.DataFrame((rng.random((n, 2)) < 0.3).astype(float), index=labels,
                      columns=["a", "b"])
    sf.load_attributes(attribute_file=df)
    sf.run_pipeline(node_distance_metric="euclidean")
    assert sf.nes is not None
    assert sf.node_distance_metric == "euclidean"


def test_fused_zscore_matches_stages(network, rng):
    sf1, sf2 = _mk(network), _mk(network)
    n = sf1.graph.number_of_nodes()
    labels = [sf1.graph.nodes[i]["key"] for i in range(n)]
    vals = rng.normal(size=(n, 2))
    vals[rng.random((n, 2)) < 0.15] = np.nan
    df = pd.DataFrame(vals, index=labels, columns=["u", "v"])

    sf1.load_attributes(attribute_file=df)
    sf1.define_neighborhoods()
    sf1.compute_pvalues(num_permutations=80, neighborhood_score_type="z-score")

    sf2.load_attributes(attribute_file=df)
    sf2.run_pipeline(num_permutations=80, neighborhood_score_type="z-score")

    np.testing.assert_allclose(sf1.pvalues_pos, sf2.pvalues_pos, equal_nan=True)
    np.testing.assert_allclose(sf1.nes, sf2.nes, equal_nan=True)
