"""Bridging NetworkX graphs to the dense arrays the device core consumes,
plus small graph/text utilities shared by the pipeline and plotting.

``graph_to_arrays`` is the single host->device seam: it extracts node coordinates,
the integer edge list, and the layout-derived edge lengths in one pass so the
pipeline can build the dense FW initialization (`dense_initial_distances`) and the
euclidean coordinate matrix without touching NetworkX again.
"""

from __future__ import annotations

import logging
import re
from collections import Counter

import networkx as nx
import numpy as np


def graph_to_arrays(G):
    """(coords[N,2] f64, edges[E,2] int64, lengths[E] f64 or None, weights[E] f64).

    Nodes must be labeled 0..N-1 (every loader in safepy_tpu.io guarantees this).
    Lengths come from the 'length' edge attribute when present (the
    shortpath_weighted_layout weights, safepy/safe_io.py:311-333); weights from
    the 'weight' attribute with a default of 1 (the weights NetworkX Dijkstra
    uses for the plain 'shortpath' metric, reference safe.py:409-410).
    """
    n = G.number_of_nodes()
    xs = dict(G.nodes.data("x"))
    ys = dict(G.nodes.data("y"))
    has_coords = all(xs.get(i) is not None for i in range(n)) and len(xs) == n
    coords = None
    if has_coords:
        coords = np.empty((n, 2), np.float64)
        for i in range(n):
            coords[i, 0] = xs[i]
            coords[i, 1] = ys[i]

    edges = np.asarray(list(G.edges()), dtype=np.int64).reshape(-1, 2)
    lengths = None
    weights = np.ones(len(edges), np.float64)
    if G.number_of_edges():
        raw = [d.get("length") for _, _, d in G.edges(data=True)]
        if all(v is not None for v in raw):
            lengths = np.asarray(raw, np.float64)
        weights = np.asarray(
            [float(d.get("weight", 1)) for _, _, d in G.edges(data=True)],
            np.float64)
    return coords, edges, lengths, weights


def get_node_coordinates(graph, labels=()):
    """(N, 2) layout coordinates; with labels, also which labels were found.

    Mirrors safepy/safe_io.py:649-690 including the warning for missing labels.
    """
    x = dict(graph.nodes.data("x"))
    y = dict(graph.nodes.data("y"))
    node_xy = np.column_stack([np.asarray(list(x.values()), float),
                               np.asarray(list(y.values()), float)])

    if len(labels) == 0:
        return node_xy

    node_labels = nx.get_node_attributes(graph, "label")
    label2node = {v: k for k, v in node_labels.items()}
    found = [lb for lb in labels if lb in label2node]
    missing = [lb for lb in labels if lb not in label2node]
    if missing:
        logging.warning("These labels are missing from the network (case sensitive): %s"
                        % ", ".join(missing))
    idx = [label2node[lb] for lb in found]
    return node_xy[idx, :], found


def chop_and_filter(s) -> str:
    """Five most frequent words of a name series, minus stopwords — the domain
    label heuristic (safepy/safe_io.py:735-745)."""
    single_str = s.str.cat(sep=" ")
    words = re.findall(r"[\w']+", single_str)
    counts = Counter(words)
    ranked = [w for w in sorted(counts, key=counts.get, reverse=True)]
    stop = {"of", "a", "the", "an", ",", "via", "to", "into", "from"}
    kept = [w for w in ranked if w not in stop]
    return ", ".join(kept[:5])
