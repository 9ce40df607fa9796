"""'shortpath' metric must honor edge 'weight' attributes — NetworkX Dijkstra's
default weight key in the reference (safe.py:409-410)."""

import networkx as nx
import numpy as np
import pandas as pd
import pytest

from safepy_tpu import SAFE


@pytest.fixture(scope="module")
def weighted_sf():
    g = nx.Graph()
    # weighted path graph: 0 -2.5- 1 -0.5- 2 -0.5- 3 plus a long shortcut 0-3
    g.add_edge(0, 1, weight=2.5)
    g.add_edge(1, 2, weight=0.5)
    g.add_edge(2, 3, weight=0.5)
    g.add_edge(0, 3, weight=5.0)
    for i in g:
        g.nodes[i]["label"] = g.nodes[i]["key"] = f"n{i}"
        g.nodes[i]["x"] = float(i)
        g.nodes[i]["y"] = 0.0
    from safepy_tpu.io.layout import calculate_edge_lengths
    calculate_edge_lengths(g, verbose=False)
    sf = SAFE(verbose=False)
    sf.load_network(network_file=g, node_key_attribute="key")
    return sf


def test_shortpath_uses_weights(weighted_sf):
    sf = weighted_sf
    sf.define_neighborhoods(node_distance_metric="shortpath",
                            neighborhood_radius=1)
    # oracle: weighted Dijkstra with cutoff=1
    spl = dict(nx.all_pairs_dijkstra_path_length(sf.graph, cutoff=1))
    want = np.zeros((4, 4), int)
    for s in spl:
        for t in spl[s]:
            want[s, t] = 1
    np.testing.assert_array_equal(sf.neighborhoods, want)
    # weighted distances, not hop counts: 1->3 costs 1.0 (in), 0->1 costs 2.5 (out)
    assert sf.neighborhoods[1, 3] == 1
    assert sf.neighborhoods[0, 1] == 0


def test_run_pipeline_shortpath_weights(weighted_sf):
    sf = weighted_sf
    df = pd.DataFrame({"q": [1.0, 2.0, 3.0, 4.0]},
                      index=[f"n{i}" for i in range(4)])
    sf.load_attributes(attribute_file=df)
    sf.random_seed = 1
    sf.run_pipeline(node_distance_metric="shortpath", neighborhood_radius=1,
                    num_permutations=20)
    spl = dict(nx.all_pairs_dijkstra_path_length(sf.graph, cutoff=1))
    want = np.zeros((4, 4), int)
    for s in spl:
        for t in spl[s]:
            want[s, t] = 1
    np.testing.assert_array_equal(sf.neighborhoods, want)
