"""Device-accelerated domain stage (ops/domains_device.py).

The GEMM jaccard path must be BIT-identical to scipy's pdist (the linkage
input is the same doubles, so the dendrogram and every downstream artifact
are provably unchanged); the device aggregates must match the host loop
including NaN NES columns and empty domains. Reference: safe.py:672-700.
"""

import numpy as np
import pandas as pd
import pytest
from scipy.spatial.distance import pdist

from safepy_tpu import domains as _domains
from safepy_tpu.ops import domains_device as dd


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _random_binary(rng, n, a, density=0.15):
    return (rng.random((n, a)) < density).astype(np.int8)


@pytest.mark.parametrize("n,a,density", [(64, 12, 0.3), (257, 33, 0.05),
                                         (100, 20, 0.6)])
def test_jaccard_condensed_bit_exact_vs_scipy(rng, n, a, density):
    b = _random_binary(rng, n, a, density)
    b[:, 3] = 0                       # empty column -> union-0 pairs
    b[:, 5] = b[:, 6]                 # identical columns -> distance 0
    inter = dd.enrichment_intersections(b)
    ours = dd.jaccard_condensed_from_counts(inter)
    ref = pdist(b.T.astype(np.float64), metric="jaccard")
    # scipy's double jaccard of two all-zero vectors is 0 — same convention
    assert ours.shape == ref.shape
    np.testing.assert_array_equal(ours, ref)


def test_intersections_accept_device_and_numpy(rng):
    import jax.numpy as jnp
    b = _random_binary(rng, 50, 8)
    np.testing.assert_array_equal(dd.enrichment_intersections(b),
                                  dd.enrichment_intersections(jnp.asarray(b)))


def _domain_inputs(rng, n=300, a=140, nan_frac=0.2):
    nes_binary = _random_binary(rng, n, a, 0.12).astype(np.float64)
    nes = rng.normal(2.0, 1.0, size=(n, a)).astype(np.float64)
    nes[rng.random((n, a)) < nan_frac] = np.nan
    attributes = pd.DataFrame({"id": np.arange(a),
                               "name": [f"t{i}" for i in range(a)]})
    attributes["top"] = rng.random(a) < 0.8
    attributes.loc[:1, "top"] = True  # ensure >= 2 top attributes
    return attributes, nes, nes_binary


def test_define_domains_gemm_matches_scipy(rng):
    attributes, nes, nes_binary = _domain_inputs(rng)
    a_s, n2d_s = _domains.define_domains(
        attributes.copy(), nes, nes_binary, cluster_engine="scipy",
        verbose=False)
    a_g, n2d_g = _domains.define_domains(
        attributes.copy(), nes, nes_binary, cluster_engine="gemm",
        verbose=False)
    np.testing.assert_array_equal(a_s["domain"].values, a_g["domain"].values)
    pd.testing.assert_frame_equal(n2d_s, n2d_g)


def test_define_domains_gemm_all_top_no_domain_zero(rng):
    attributes, nes, nes_binary = _domain_inputs(rng, a=60)
    attributes["top"] = True
    a_s, n2d_s = _domains.define_domains(
        attributes.copy(), nes, nes_binary, cluster_engine="scipy",
        verbose=False)
    a_g, n2d_g = _domains.define_domains(
        attributes.copy(), nes, nes_binary, cluster_engine="gemm",
        verbose=False)
    np.testing.assert_array_equal(a_s["domain"].values, a_g["domain"].values)
    pd.testing.assert_frame_equal(n2d_s, n2d_g)


def test_define_domains_gemm_accepts_precomputed_intersections(rng):
    attributes, nes, nes_binary = _domain_inputs(rng, a=80)
    inter = dd.enrichment_intersections(nes_binary.astype(np.int8))
    a_g, n2d_g = _domains.define_domains(
        attributes.copy(), nes, nes_binary, cluster_engine="gemm",
        intersections=inter, verbose=False)
    a_s, n2d_s = _domains.define_domains(
        attributes.copy(), nes, nes_binary, cluster_engine="scipy",
        verbose=False)
    pd.testing.assert_frame_equal(n2d_s, n2d_g)


def test_gemm_rejects_non_jaccard(rng):
    attributes, nes, nes_binary = _domain_inputs(rng, a=30)
    with pytest.raises(ValueError, match="jaccard"):
        _domains.define_domains(attributes.copy(), nes, nes_binary,
                                cluster_engine="gemm",
                                distance_metric="euclidean", verbose=False)


def test_domain_aggregates_match_host_loop(rng):
    n, a = 200, 40
    nes_binary = _random_binary(rng, n, a, 0.2)
    nes = rng.normal(size=(n, a)).astype(np.float32)
    nes[rng.random((n, a)) < 0.3] = np.nan
    dom_raw = rng.integers(0, 6, size=a)   # includes an unused id sometimes
    unique = np.sort(np.unique(dom_raw))
    dom_pos = np.searchsorted(unique, dom_raw)
    counts, max_nes = dd.domain_aggregates(nes_binary, nes, dom_pos,
                                           len(unique))
    for i, d in enumerate(unique):
        np.testing.assert_array_equal(
            counts[:, i], nes_binary[:, dom_raw == d].sum(axis=1))
        with np.errstate(invalid="ignore"):
            expect = np.nanmax(
                np.where(np.isnan(nes[:, dom_raw == d]), -np.inf,
                         nes[:, dom_raw == d]), axis=1, initial=-np.inf)
        np.testing.assert_array_equal(max_nes[:, i],
                                      expect.astype(np.float64))


def test_indicator_csc_matches_dense(rng):
    import jax.numpy as jnp
    b = _random_binary(rng, 73, 11, 0.2)
    b[:, 4] = 0  # empty column
    csc = dd.indicator_csc(jnp.asarray(b), b.sum(axis=0))
    np.testing.assert_array_equal(csc.toarray(), b)
    empty = dd.indicator_csc(jnp.asarray(np.zeros((5, 3), np.int8)),
                             np.zeros(3))
    assert empty.nnz == 0 and empty.shape == (5, 3)


def test_define_top_attributes_sparse_matches_dense(rng):
    import networkx as nx
    import scipy.sparse as sp
    n, a = 120, 9
    g = nx.random_geometric_graph(n, 0.2, seed=4)
    nes_binary = _random_binary(rng, n, a, 0.15).astype(np.float64)
    attributes = pd.DataFrame({"id": np.arange(a),
                               "name": [f"t{i}" for i in range(a)]})
    attributes["num_neighborhoods_enriched"] = nes_binary.sum(axis=0)
    dense = _domains.define_top_attributes(
        attributes.copy(), nes_binary, g, min_size=3, verbose=False)
    sparse = _domains.define_top_attributes(
        attributes.copy(), sp.csc_matrix(nes_binary, dtype=np.int8), g,
        min_size=3, verbose=False)
    np.testing.assert_array_equal(dense["top"].values, sparse["top"].values)
    np.testing.assert_array_equal(dense["num_connected_components"].values,
                                  sparse["num_connected_components"].values)


def test_facade_cluster_engines_agree(tmp_path):
    """End-to-end: a small facade run clustered by both engines yields the
    identical node2domain, and re-clustering reuses the cached
    intersections."""
    import safepy_tpu

    # geometric network with spatially-clustered binary attributes so the
    # hypergeometric stage yields connected (top) enriched regions
    rng = np.random.default_rng(5)
    n = 260
    coords = rng.uniform(-1, 1, (n, 2))
    from scipy.spatial import cKDTree
    _, nn = cKDTree(coords).query(coords, k=5)
    net = tmp_path / "net.txt"
    with open(net, "w") as f:
        for i in range(n):
            for j in nn[i, 1:]:
                a, b = min(i, int(j)), max(i, int(j))
                f.write(f"g{a}\tg{b}\t1.0\n")
    centers = coords[rng.choice(n, 8, replace=False)]
    cols = {}
    for c_i, c in enumerate(centers):
        ball = (np.hypot(coords[:, 0] - c[0], coords[:, 1] - c[1])
                < 0.45).astype(float)
        cols[f"attr{2 * c_i}"] = ball
        jitter = ball.copy()
        jitter[rng.choice(n, 6, replace=False)] = 1.0
        cols[f"attr{2 * c_i + 1}"] = jitter
    attrs = pd.DataFrame(cols, index=[f"g{i}" for i in range(n)])

    sf = safepy_tpu.SAFE(verbose=False)
    sf.load_network(network_file=str(net), node_key_attribute="key")
    sf.load_attributes(attribute_file=attrs)
    sf.define_neighborhoods()
    sf.compute_pvalues()
    sf.define_top_attributes(attribute_enrichment_min_size=5)
    if int(sf.attributes["top"].sum()) < 2:
        pytest.skip("not enough top attributes in the synthetic instance")

    sf.cluster_engine = "scipy"
    sf.define_domains()
    n2d_scipy = sf.node2domain.copy()

    sf.cluster_engine = "gemm"
    sf.define_domains()
    n2d_gemm = sf.node2domain.copy()
    pd.testing.assert_frame_equal(n2d_scipy, n2d_gemm)

    # re-clustering at a different threshold still matches the scipy engine
    sf.define_domains(attribute_distance_threshold=0.6)
    n2d_gemm2 = sf.node2domain.copy()
    sf.cluster_engine = "scipy"
    sf.define_domains(attribute_distance_threshold=0.6)
    pd.testing.assert_frame_equal(sf.node2domain, n2d_gemm2)
