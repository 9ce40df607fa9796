"""Plot smoke tests on the Agg backend: every figure renders without error."""

import matplotlib

matplotlib.use("Agg")

import matplotlib.pyplot as plt
import networkx as nx
import numpy as np
import pandas as pd
import pytest

from safepy_tpu import SAFE
from safepy_tpu.colormaps import MidpointRangeNormalize, get_colors


@pytest.fixture(scope="module")
def analyzed(tmp_path_factory):
    """A pipeline state guaranteed to have >= 2 domains: two ring communities."""
    rng = np.random.default_rng(0)
    n = 80
    # two dense communities bridged by one edge -> two spatial regions
    g = nx.ring_of_cliques = nx.Graph()
    half = n // 2
    g.add_edges_from(nx.connected_watts_strogatz_graph(half, 6, 0.1, seed=1).edges())
    g2 = nx.connected_watts_strogatz_graph(n - half, 6, 0.1, seed=2)
    g.add_edges_from(((u + half, v + half) for u, v in g2.edges()))
    g.add_edge(0, half)
    path = tmp_path_factory.mktemp("plotdata") / "net.txt"
    with open(path, "w") as f:
        for u, v in g.edges():
            f.write(f"g{u}\tg{v}\t1.0\n")
    sf = SAFE(verbose=False)
    sf.random_seed = 3
    sf.load_network(network_file=str(path), node_key_attribute="key")
    sf.define_neighborhoods()
    labels = [sf.graph.nodes[i]["key"] for i in range(n)]
    vals = np.zeros((n, 6))
    vals[:half, :3] = (rng.random((half, 3)) < 0.8)
    vals[half:, 3:] = (rng.random((n - half, 3)) < 0.8)
    df = pd.DataFrame(vals, index=labels, columns=[f"attr {i}" for i in range(6)])
    sf.load_attributes(attribute_file=df)
    sf.compute_pvalues()
    sf.define_top_attributes(attribute_enrichment_min_size=3)
    if sf.attributes["top"].sum() >= 2:
        sf.define_domains()
        sf.trim_domains()
    return sf


def test_fixture_has_domains(analyzed):
    assert analyzed.domains is not None, (
        "plot fixture must produce domains; adjust the synthetic input")


def test_plot_network(analyzed):
    ax = analyzed.plot_network()
    assert ax is not None
    plt.close("all")


def test_plot_network_with_labels(analyzed):
    ax = analyzed.plot_network(labels=["g0", "g1", "not-there"])
    assert ax is not None
    plt.close("all")


def test_plot_composite_network(analyzed):
    fig, axes = analyzed.plot_composite_network(show_each_domain=False,
                                                color_seed=0)
    assert len(axes) >= 2
    plt.close("all")


def test_plot_composite_network_each_domain(analyzed, tmp_path):
    out = tmp_path / "composite.png"
    fig, axes = analyzed.plot_composite_network(show_each_domain=True,
                                                color_seed=0,
                                                save_fig=str(out))
    assert out.exists()
    plt.close("all")


def test_plot_composite_network_contours(analyzed):
    fig, axes = analyzed.plot_composite_network_contours(color_seed=0)
    assert len(axes) == 2
    plt.close("all")


def test_plot_sample_attributes(analyzed, tmp_path):
    out = tmp_path / "fig.png"
    fig, axes = analyzed.plot_sample_attributes(
        attributes=["attr 0"], show_raw_data=True, show_significant_nodes=True,
        save_fig=str(out))
    assert out.exists()
    plt.close("all")


def test_midpoint_normalize():
    norm = MidpointRangeNormalize(vmin=-10, vmax=10,
                                  midrange=[-1.3, 0, 1.3])
    out = np.asarray(norm(np.array([-10, -1.3, 0, 1.3, 10])))
    np.testing.assert_allclose(out, [0, 0.25, 0.5, 0.75, 1])


def test_get_colors_seeded():
    c1 = get_colors("hsv", 7, seed=4)
    c2 = get_colors("hsv", 7, seed=4)
    np.testing.assert_array_equal(c1, c2)
    assert tuple(c1[0]) == (0, 0, 0, 1)
