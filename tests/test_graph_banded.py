"""Graph-derived (landmark) band certificate: band-scale APSP without the
Euclidean contract — hop metrics and arbitrary edge lengths (reference
safe.py:408-410 serves these via host Dijkstra; here the band-storage engine
serves them on device)."""

import numpy as np
import pandas as pd
import pytest

from safepy_tpu import SAFE
from safepy_tpu.ops.apsp_banded import graph_banded_order


def _knn_graph(n=400, k=6, seed=3):
    rng = np.random.default_rng(seed)
    coords = rng.uniform(-1, 1, (n, 2))
    from scipy.spatial import cKDTree
    _, nn = cKDTree(coords).query(coords, k=k)
    pairs = sorted({(min(i, int(j)), max(i, int(j)))
                    for i in range(n) for j in nn[i, 1:]})
    return coords, np.asarray(pairs, np.int64)


def test_landmark_certificate_holds_hop_metric():
    """Every pair within hop distance r must sit within the certified band."""
    _, edges = _knn_graph()
    n = 400
    w = np.ones(len(edges))
    r = 3.0
    order, band = graph_banded_order(n, edges, w, r)

    from scipy.sparse import coo_matrix
    from scipy.sparse.csgraph import shortest_path
    g = coo_matrix((w, (edges[:, 0], edges[:, 1])), shape=(n, n))
    d = shortest_path(g, directed=False, unweighted=True)
    rank = np.empty(n, np.int64)
    rank[order] = np.arange(n)
    uu, vv = np.nonzero(d <= r)
    assert np.abs(rank[uu] - rank[vv]).max() <= band


def test_landmark_certificate_weighted_and_disconnected():
    rng = np.random.default_rng(1)
    _, edges = _knn_graph(n=300, seed=5)
    # two disconnected copies with random weights
    e2 = np.concatenate([edges, edges + 300])
    w2 = rng.uniform(0.1, 2.0, len(e2))
    n = 600
    r = 1.5
    order, band = graph_banded_order(n, e2, w2, r)

    from scipy.sparse import coo_matrix
    from scipy.sparse.csgraph import shortest_path
    g = coo_matrix((w2, (e2[:, 0], e2[:, 1])), shape=(n, n))
    d = shortest_path(g, directed=False)
    rank = np.empty(n, np.int64)
    rank[order] = np.arange(n)
    uu, vv = np.nonzero(d <= r)
    assert np.abs(rank[uu] - rank[vv]).max() <= band
    assert band < n // 2  # the order actually pays on a geometric graph


def _write_net(tmp_path, coords, edges, lengths=None):
    net = tmp_path / "net.txt"
    with open(net, "w") as f:
        for idx, (a, b) in enumerate(edges):
            wcol = 1.0 if lengths is None else lengths[idx]
            f.write(f"g{a}\tg{b}\t{wcol}\n")
    return str(net)


def _binary_attrs(n, a=5, seed=0):
    rng = np.random.default_rng(seed)
    vals = (rng.random((n, a)) < 0.1).astype(float)
    vals[rng.random((n, a)) < 0.1] = np.nan
    return pd.DataFrame(vals, index=[f"g{i}" for i in range(n)],
                        columns=[f"go{j}" for j in range(a)])


def _run(net, attrs, mode, metric, radius, **kwargs):
    sf = SAFE(verbose=False)
    sf.apsp_mode = mode
    sf.random_seed = 11
    sf.neighborhood_radius = radius
    sf.load_network(network_file=net, node_key_attribute="key")
    sf.load_attributes(attribute_file=attrs)
    sf.run_pipeline(node_distance_metric=metric, **kwargs)
    return sf


@pytest.mark.slow
def test_band_shortpath_hop_metric_matches_full(tmp_path):
    """'shortpath' (hop counts, absolute radius): band engine == dense engine
    — the capability the Euclidean certificate could not serve."""
    coords, edges = _knn_graph(n=350, seed=9)
    net = _write_net(tmp_path, coords, edges)
    attrs = _binary_attrs(350, seed=2)

    full = _run(net, attrs, "full", "shortpath", 3)
    band = _run(net, attrs, "band", "shortpath", 3)

    from safepy_tpu.ops.apsp_bandstore import BandedMatrix
    assert isinstance(band._neighborhoods_dev, BandedMatrix)
    np.testing.assert_array_equal(band.neighborhoods, full.neighborhoods)
    assert np.nanmax(np.abs(band.pvalues_pos - full.pvalues_pos)) <= 1e-6
    np.testing.assert_array_equal(band.nes_binary, full.nes_binary)


@pytest.mark.slow
def test_band_non_geometric_lengths_matches_full(tmp_path):
    """shortpath_weighted_layout with lengths that are NOT the endpoint
    distances (the Euclidean certificate fails): the landmark certificate
    must route the band engine, and results must match the dense engine."""
    coords, edges = _knn_graph(n=350, seed=12)
    rng = np.random.default_rng(4)
    n = 350
    import networkx as nx
    from safepy_tpu.io.layout import calculate_edge_lengths
    g = nx.Graph()
    g.add_nodes_from(range(n))
    g.add_edges_from(edges)
    for i in range(n):
        g.nodes[i]["label"] = g.nodes[i]["key"] = f"g{i}"
        g.nodes[i]["x"] = float(coords[i, 0])
        g.nodes[i]["y"] = float(coords[i, 1])
    calculate_edge_lengths(g, verbose=False)
    # perturb lengths away from the geometric contract
    for u, v, d in g.edges(data=True):
        d["length"] = float(d["length"]) * float(rng.uniform(0.5, 2.0))

    attrs = _binary_attrs(n, seed=6)

    def run(mode):
        sf = SAFE(verbose=False)
        sf.apsp_mode = mode
        sf.random_seed = 11
        sf.neighborhood_radius = 0.15
        sf.load_network(network_file=g, node_key_attribute="key")
        sf.load_attributes(attribute_file=attrs)
        sf.run_pipeline()
        return sf

    full = run("full")
    band = run("band")
    from safepy_tpu.ops.apsp_bandstore import BandedMatrix
    assert isinstance(band._neighborhoods_dev, BandedMatrix)
    np.testing.assert_array_equal(band.neighborhoods, full.neighborhoods)
    assert np.nanmax(np.abs(band.pvalues_pos - full.pvalues_pos)) <= 1e-6


def test_band_small_world_falls_back(tmp_path):
    """A small-world graph at hop radius 3 reaches most of the network: the
    measured band cannot pay, and 'auto' must keep the dense engine."""
    rng = np.random.default_rng(0)
    n = 300
    edges = {(i, (i + 1) % n) for i in range(n)}
    edges |= {tuple(sorted(rng.integers(0, n, 2))) for _ in range(400)}
    edges = np.asarray(sorted(e for e in edges if e[0] != e[1]))
    net = _write_net(tmp_path, None, edges)
    attrs = _binary_attrs(n, seed=8)

    sf = SAFE(verbose=False)
    sf.apsp_mode = "auto"
    sf.band_storage_min_nodes = 100  # make 'auto' consider the band at n=300
    sf.random_seed = 11
    sf.neighborhood_radius = 3
    sf.load_network(network_file=net, node_key_attribute="key")
    sf.load_attributes(attribute_file=attrs)
    sf.run_pipeline(node_distance_metric="shortpath")
    from safepy_tpu.ops.apsp_bandstore import BandedMatrix
    assert not isinstance(sf._neighborhoods_dev, BandedMatrix)
