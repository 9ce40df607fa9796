"""End-to-end SAFE pipeline on synthetic data, pinned against independent oracles.

The reference validates with golden-value integration tests on the Costanzo-2016
dataset (not vendored here); these tests build an equivalent miniature pipeline and
pin every stage against scipy/networkx oracles computed independently.
"""

import os

import networkx as nx
import numpy as np
import pandas as pd
import pytest
from scipy import stats

import safepy_tpu
from safepy_tpu import SAFE


@pytest.fixture(scope="module")
def network_txt(tmp_path_factory):
    """A 3-column tab-delimited network file (the reference's txt format)."""
    rng = np.random.default_rng(7)
    n = 120
    g = nx.connected_watts_strogatz_graph(n, 6, 0.3, seed=3)
    path = tmp_path_factory.mktemp("data") / "net.txt"
    with open(path, "w") as f:
        for u, v in g.edges():
            f.write(f"gene{u}\tgene{v}\t1.0\n")
    return str(path), g


@pytest.fixture(scope="module")
def loaded(network_txt):
    path, g = network_txt
    sf = SAFE(verbose=False)
    sf.random_seed = 11
    sf.load_network(network_file=path, node_key_attribute="key")
    return sf


def test_load_network(loaded, network_txt):
    _, g = network_txt
    assert loaded.graph.number_of_nodes() == g.number_of_nodes()
    assert loaded.graph.number_of_edges() == g.number_of_edges()
    # layout + edge lengths present
    assert all("length" in d for _, _, d in loaded.graph.edges(data=True))
    assert loaded.nodes.shape[0] == g.number_of_nodes()


def test_neighborhoods_match_networkx(loaded):
    sf = loaded
    sf.define_neighborhoods()

    # oracle: networkx dijkstra with the same cutoff
    x = [sf.graph.nodes[i]["x"] for i in sf.graph]
    nr = sf.neighborhood_radius * (max(x) - min(x))
    spl = dict(nx.all_pairs_dijkstra_path_length(sf.graph, weight="length",
                                                 cutoff=nr))
    want = np.zeros_like(sf.neighborhoods)
    for s in spl:
        for t in spl[s]:
            want[s, t] = 1
    # f32 FW vs f64 dijkstra can disagree only at radius-boundary ties
    diff = sf.neighborhoods != want
    if diff.any():
        dist = sf.node_distances
        assert np.all(np.abs(dist[diff] - nr) < nr * 1e-4), (
            "non-boundary neighborhood mismatch")
        assert diff.sum() < 0.001 * want.size


def test_neighborhoods_shortpath_and_euclidean(loaded):
    sf = loaded
    sf.define_neighborhoods(node_distance_metric="shortpath", neighborhood_radius=2)
    spl = dict(nx.all_pairs_shortest_path_length(sf.graph, cutoff=2))
    want = np.zeros_like(sf.neighborhoods)
    for s in spl:
        for t in spl[s]:
            want[s, t] = 1
    np.testing.assert_array_equal(sf.neighborhoods, want)

    sf.define_neighborhoods(node_distance_metric="euclidean",
                            neighborhood_radius=0.15)
    coords = np.array([[sf.graph.nodes[i]["x"], sf.graph.nodes[i]["y"]]
                       for i in sf.graph])
    from scipy.spatial.distance import pdist, squareform
    d = squareform(pdist(coords))
    nr = 0.15 * (coords[:, 0].max() - coords[:, 0].min())
    np.testing.assert_array_equal(sf.neighborhoods, (d < nr).astype(int))
    # restore default for downstream tests
    sf.define_neighborhoods(node_distance_metric="shortpath_weighted_layout",
                            neighborhood_radius=0.1)


def _binary_attributes(sf, rng, num_attrs=12):
    n = sf.graph.number_of_nodes()
    labels = [sf.graph.nodes[i]["key"] for i in range(n)]
    vals = (rng.random((n, num_attrs)) < 0.15).astype(float)
    vals[rng.random((n, num_attrs)) < 0.1] = np.nan
    return pd.DataFrame(vals, index=labels,
                        columns=[f"attr {i}" for i in range(num_attrs)])


def test_hypergeom_pipeline_matches_scipy(loaded, rng):
    sf = loaded
    df = _binary_attributes(sf, rng)
    sf.load_attributes(attribute_file=df)
    sf.compute_pvalues(multiple_testing=False)

    # independent oracle
    n2a = df.values
    nodes_not_nan = np.any(~np.isnan(n2a), axis=1)
    n = nodes_not_nan.sum()
    K = np.nansum(n2a, axis=0)
    nbr = sf.neighborhoods.astype(float)
    nsize = nbr @ nodes_not_nan.astype(float)
    counts = nbr @ np.nan_to_num(n2a)
    want_p = stats.hypergeom.sf(counts - 1, n, K[None, :], nsize[:, None])

    np.testing.assert_allclose(sf.pvalues_pos, want_p, atol=1e-9)
    with np.errstate(divide="ignore"):
        want_nes = -np.log10(want_p)
    ok = np.isfinite(want_nes)
    np.testing.assert_allclose(sf.nes[ok], want_nes[ok], rtol=1e-6)
    assert (sf.attributes["num_neighborhoods_enriched"].values
            == (sf.nes_binary > 0).sum(axis=0)).all()


def test_hypergeom_with_fdr(loaded, rng):
    sf = loaded
    df = _binary_attributes(sf, rng)
    sf.load_attributes(attribute_file=df)
    sf.compute_pvalues(multiple_testing=True)
    assert np.all((sf.pvalues_pos >= 0) & (sf.pvalues_pos <= 1))
    # FDR only increases p-values
    sf2_p = stats.hypergeom.sf(
        (sf.neighborhoods.astype(float) @ np.nan_to_num(df.values)) - 1,
        np.any(~np.isnan(df.values), axis=1).sum(),
        np.nansum(df.values, axis=0)[None, :],
        (sf.neighborhoods.astype(float)
         @ np.any(~np.isnan(df.values), axis=1).astype(float))[:, None])
    assert np.all(sf.pvalues_pos >= sf2_p - 1e-12)


def test_randomization_pipeline(loaded, rng):
    sf = loaded
    n = sf.graph.number_of_nodes()
    labels = [sf.graph.nodes[i]["key"] for i in range(n)]
    vals = rng.normal(size=(n, 1))
    vals[rng.random(n) < 0.2, 0] = np.nan
    df = pd.DataFrame(vals, index=labels, columns=["quant"])
    sf.load_attributes(attribute_file=df)
    sf.random_seed = 42
    sf.compute_pvalues(num_permutations=200)

    # auto mode dispatched to randomization (values not binary)
    assert sf.pvalues_neg is not None
    p_sum = sf.pvalues_neg + sf.pvalues_pos
    finite = ~np.isnan(p_sum)
    assert (p_sum[finite] >= 1.0 - 1e-9).all()  # two-sided with ties
    # determinism given the same seed
    nes1 = sf.nes.copy()
    sf.compute_pvalues(num_permutations=200)
    np.testing.assert_array_equal(nes1, sf.nes)


def test_attribute_signs(loaded, rng):
    sf = loaded
    n = sf.graph.number_of_nodes()
    labels = [sf.graph.nodes[i]["key"] for i in range(n)]
    vals = rng.normal(size=(n, 1))
    df = pd.DataFrame(vals, index=labels, columns=["quant"])
    sf.load_attributes(attribute_file=df)
    sf.random_seed = 5

    sf.attribute_sign = "highest"
    sf.compute_pvalues(num_permutations=100)
    nes_pos = sf.nes.copy()
    sf.attribute_sign = "lowest"
    sf.compute_pvalues(num_permutations=100)
    nes_neg = sf.nes.copy()
    sf.attribute_sign = "both"
    sf.compute_pvalues(num_permutations=100)
    np.testing.assert_allclose(sf.nes, nes_pos - nes_neg, atol=1e-12)


def test_background_network(loaded, rng):
    sf = loaded
    n = sf.graph.number_of_nodes()
    labels = [sf.graph.nodes[i]["key"] for i in range(n)]
    vals = (rng.random((n, 3)) < 0.2).astype(float)
    vals[rng.random((n, 3)) < 0.5] = np.nan
    df = pd.DataFrame(vals, index=labels, columns=list("abc"))
    sf.load_attributes(attribute_file=df)
    sf.compute_pvalues(background="network")
    assert not np.isnan(sf.node2attribute).any()
    sf.background = "attribute_file"


def test_domains_and_output(loaded, rng, tmp_path):
    sf = loaded
    # structured attributes: enrich two disjoint graph regions
    n = sf.graph.number_of_nodes()
    labels = [sf.graph.nodes[i]["key"] for i in range(n)]
    vals = np.zeros((n, 8))
    # attributes 0-3 annotate nodes 0..n/2, 4-7 annotate n/2..n (correlated blocks)
    vals[: n // 2, :4] = (rng.random((n // 2, 4)) < 0.6)
    vals[n // 2:, 4:] = (rng.random((n - n // 2, 4)) < 0.6)
    df = pd.DataFrame(vals, index=labels, columns=[f"a{i}" for i in range(8)])
    sf.load_attributes(attribute_file=df)
    sf.compute_pvalues(multiple_testing=False)

    sf.define_top_attributes(attribute_enrichment_min_size=5)
    assert "top" in sf.attributes
    if sf.attributes["top"].sum() >= 2:
        sf.define_domains()
        sf.trim_domains()
        assert sf.domains is not None
        assert "primary_domain" in sf.node2domain

        sf.print_output_files(output_dir=str(tmp_path))
        for f in ("attribute_properties_annotation.txt",
                  "node_properties_annotation.txt"):
            assert os.path.exists(tmp_path / f)


def test_save_and_reload(loaded, tmp_path):
    sf = loaded
    out = tmp_path / "session.p"
    sf.save(output_file=str(out))
    import pickle
    with open(out, "rb") as f:
        sf2 = pickle.load(f)
    assert sf2.graph.number_of_nodes() == sf.graph.number_of_nodes()


def test_validation_errors():
    sf = SAFE(verbose=False)
    sf.background = "bogus"
    with pytest.raises(ValueError):
        sf.validate_config()
    assert sf.background == "attribute_file"  # restored

    sf.num_permutations = 5
    with pytest.raises(ValueError):
        sf.validate_config()
    assert sf.num_permutations == 1000
