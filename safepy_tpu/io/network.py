"""Network loaders: tab text, gpickle, MATLAB sessions, Cytoscape bundles, scatter.

Behavioral spec is the reference loader suite (safepy/safe_io.py:30-285); the
implementations here are independent:

  * ``load_network_from_txt`` — 3-column (key1, key2, weight) or 5-column
    (label1, key1, label2, key2, weight) tab files, ``.gz`` supported; ``.txt`` has
    no header, ``.tsv`` has one. The primary engine is the native C++ parser
    (native/edgelist.cpp); the fallback is a pure-Python single pass. Both number
    nodes by first appearance (endpoint-1 column before endpoint-2 column — the
    order the reference's table concat produces, safe_io.py:90-97), then apply the
    layout and edge lengths.
  * ``load_network_from_gpickle`` — a pickled, fully-prepared graph.
  * ``load_network_from_mat`` — legacy MATLAB SAFE session
    (``layout.edges/label/label_orf/x/y``) with fixed coordinates.
  * ``load_network_from_cys`` — a Cytoscape session zip, parsed directly from the
    archive streams (never extracted to disk): node x/y from the XGMML view, edges
    from the network XML, node attributes from the SHARED_ATTRS node.cytable; node
    ids relabeled to 0..N-1.
  * ``load_network_from_scatter`` — a TSV of (key, x, y, label): an edgeless graph
    of positioned nodes for annotating UMAP/t-SNE-style embeddings.
"""

from __future__ import annotations

import csv
import gzip
import io as _io
import itertools
import logging
import pickle
import zipfile
from os.path import expanduser
from pathlib import Path
from xml.dom import minidom

import networkx as nx
import numpy as np
import pandas as pd

from safepy_tpu.io.layout import apply_network_layout, calculate_edge_lengths
from safepy_tpu.io.matlab import load_mat

# ------------------------------------------------------------------ tab text


def _open_text(filename):
    if filename.endswith(".gz"):
        return gzip.open(filename, "rt")
    return open(filename, "rt")


def _sniff_format(filename):
    """-> (num_cols, has_header). .txt = headerless, .tsv = one header line;
    format decided by the FIRST suffix so 'net.txt.gz' still reads as .txt."""
    kind = Path(filename).suffixes[0]
    if kind not in (".txt", ".tsv"):
        raise ValueError(f"extension {kind} not supported")
    with _open_text(filename) as fh:
        num_cols = len(fh.readline().rstrip("\n").split("\t"))
    if num_cols not in (3, 5):
        raise ValueError("Unknown network file format. 3 or 5 columns are expected.")
    return num_cols, kind == ".tsv"


def _coerce_column(values):
    """Whole-column type inference for 5-column files (the reference leaves these
    to pandas, safe_io.py:81): all-int -> ints, all-float -> floats, else strings."""
    for cast in (int, float):
        try:
            return [cast(v) for v in values]
        except ValueError:
            break
    return values


def _graph_from_endpoints(labels1, keys1, labels2, keys2, node_key_attribute):
    """Nodes numbered by first appearance of their (label, key) pair; edges
    resolved by label."""
    index_by_pair = {}
    for pair in itertools.chain(zip(labels1, keys1), zip(labels2, keys2)):
        index_by_pair.setdefault(pair, len(index_by_pair))
    index_by_label = {}
    for (label, _key), idx in index_by_pair.items():
        index_by_label.setdefault(label, idx)

    G = nx.Graph()
    for (label, key), idx in index_by_pair.items():
        G.add_node(idx)
        G.nodes[idx]["label"] = label
        G.nodes[idx][node_key_attribute] = key
    G.add_edges_from((index_by_label[a], index_by_label[b])
                     for a, b in zip(labels1, labels2))
    return G


def load_network_from_txt(filename, layout="spring_embedded", node_key_attribute="key",
                          seed=None, verbose=True, engine="auto"):
    """Load a network from a tab-delimited text file and apply a layout.

    engine: 'auto' (native C++ parser when available, else pure Python),
    'native', or 'python'. All engines produce identical graphs (node ordering
    included).
    """
    filename = filename.replace("~", expanduser("~"))
    num_cols, has_header = _sniff_format(filename)

    if engine in ("auto", "native"):
        from safepy_tpu import native

        parsed = native.parse_edgelist(filename, num_cols, skip_header=has_header)
        if parsed is not None:
            labels, keys, edge_idx, _weights = parsed
            G = nx.Graph()
            G.add_nodes_from(range(len(labels)))
            for n, (label, key) in enumerate(zip(labels, keys)):
                G.nodes[n]["label"] = label
                G.nodes[n][node_key_attribute] = key
            G.add_edges_from(map(tuple, edge_idx))
            G = apply_network_layout(G, layout=layout, seed=seed, verbose=verbose)
            return calculate_edge_lengths(G, verbose=verbose)
        if engine == "native":
            raise RuntimeError("native edge-list parser unavailable "
                               "(g++ build failed?)")

    with _open_text(filename) as fh:
        lines = fh.read().splitlines()
    if has_header:
        lines = lines[1:]
    cells = [line.split("\t") for line in lines if line.strip()]
    columns = [list(col) for col in zip(*cells)]

    if num_cols == 3:
        # (key1, key2, weight): keys double as labels and stay strings, like the
        # reference's explicit str dtype (safe_io.py:71-77)
        labels1 = keys1 = columns[0]
        labels2 = keys2 = columns[1]
    else:
        labels1, keys1, labels2, keys2 = map(_coerce_column, columns[:4])

    G = _graph_from_endpoints(labels1, keys1, labels2, keys2, node_key_attribute)
    G = apply_network_layout(G, layout=layout, seed=seed, verbose=verbose)
    return calculate_edge_lengths(G, verbose=verbose)


# ------------------------------------------------------------------ gpickle


def load_network_from_gpickle(filename, verbose=True):
    filename = filename.replace("~", expanduser("~"))
    with open(filename, "rb") as f:
        return pickle.load(f)


# ------------------------------------------------------------------ MATLAB


def load_network_from_mat(filename, verbose=True):
    filename = filename.replace("~", expanduser("~"))
    if verbose:
        logging.info("Loading the mat file...")
    mat = load_mat(filename)
    # layout.edges is an adjacency matrix (dense ndarray or MATLAB sparse)
    edges = mat["layout"]["edges"]
    if hasattr(edges, "toarray") or hasattr(edges, "tocoo"):
        G = nx.from_scipy_sparse_array(edges)
    else:
        G = nx.from_numpy_array(np.asarray(edges))
    for n in G:
        G.nodes[n]["label"] = mat["layout"]["label"][n]
        G.nodes[n]["key"] = mat["layout"]["label_orf"][n]
        G.nodes[n]["x"] = mat["layout"]["x"][n]
        G.nodes[n]["y"] = mat["layout"]["y"][n]
    return calculate_edge_lengths(G, verbose=verbose)


# ---------------------------------------------------------------- Cytoscape


def _xgmml_view_nodes(stream):
    """XGMML view -> {cy:nodeId: (label, x, y)} for nodes that carry graphics."""
    doc = minidom.parse(stream)
    placed = {}
    for node in doc.getElementsByTagName("node"):
        try:
            node_id = int(node.attributes["cy:nodeId"].value)
            label = node.attributes["label"].value
        except KeyError:
            continue
        graphics = [child for child in node.childNodes
                    if child.nodeType == child.ELEMENT_NODE
                    and child.tagName == "graphics"]
        if graphics:
            placed[node_id] = (label,
                               float(graphics[0].attributes["x"].value),
                               float(graphics[0].attributes["y"].value))
    return placed


def _xgmml_network_edges(stream):
    """Network XML -> [(source_id, target_id), ...]."""
    doc = minidom.parse(stream)
    edges = []
    for edge in doc.getElementsByTagName("edge"):
        attrs = edge.attributes
        if attrs.get("source") is not None and attrs.get("target") is not None:
            edges.append((int(attrs["source"].value), int(attrs["target"].value)))
    return edges


def _cytable_rows(text):
    """node.cytable CSV -> (column names, data rows keyed by int SUID).

    The format front-loads metadata: somewhere in the first rows sits a header row
    whose first cell is 'SUID', and the data begins at the first row whose first
    cell is an integer.
    """
    rows = list(csv.reader(_io.StringIO(text)))
    header = next((row for row in rows[:7] if row and row[0] == "SUID"), None)
    if header is None:
        return None, []
    data = [(int(row[0]), row) for row in rows
            if row and row[0].isdigit() and len(row) == len(header)]
    return header, data


def load_network_from_cys(filename, view_name=None, verbose=True):
    """Cytoscape session bundle, parsed in-stream (nothing extracted to disk)."""
    filename = filename.replace("~", expanduser("~"))
    if verbose:
        logging.info("Loading the cys file %s..." % filename)

    with zipfile.ZipFile(filename, "r") as bundle:
        members = bundle.namelist()

        views = [m for m in members if "/views/" in m]
        if view_name:
            views = [m for m in views if m.endswith(view_name + ".xgmml")]
        if not views:
            raise ValueError(f"no matching view in {filename}")
        if verbose:
            logging.info("Loading the view: %s" % views[0])
        with bundle.open(views[0]) as stream:
            placed = _xgmml_view_nodes(stream)

        network = next(m for m in members if "/networks/" in m)
        if verbose:
            logging.info("Loading the first network: %s" % network)
        with bundle.open(network) as stream:
            edge_list = _xgmml_network_edges(stream)

        G = nx.Graph()
        G.add_edges_from(edge_list)
        # keep only nodes the view places; everything else has no coordinates
        for node in [n for n in G.nodes if n not in placed]:
            G.remove_node(node)
        for node in G.nodes:
            label, x, y = placed[node]
            G.nodes[node].update(label=label, x=x, y=y)

        # node attribute table: the SHARED_ATTRS node.cytable belonging to the
        # loaded network
        network_name = Path(network).stem
        tables = [m for m in members
                  if "/tables/" in m and network_name in m
                  and "SHARED_ATTRS" in m and "node.cytable" in m]
        if tables:
            text = bundle.read(tables[0]).decode("utf-8", errors="replace")
            header, rows = _cytable_rows(text)
            if header:
                for suid, row in rows:
                    if suid in G.nodes:
                        G.nodes[suid].update(zip(header[1:], row[1:]))

    G = nx.relabel_nodes(G, {node: ix for ix, node in enumerate(G.nodes)})
    return calculate_edge_lengths(G, verbose=verbose)


# ------------------------------------------------------------------ scatter


def load_network_from_scatter(filename, node_key_attribute="key", verbose=True):
    filename = filename.replace("~", expanduser("~"))
    if verbose:
        logging.info("Loading the file of node coordinates...")
    scatter = pd.read_csv(filename, sep="\t")
    scatter.columns = ["key", "x", "y", "label"]
    G = nx.Graph()
    G.add_nodes_from((idx, attrs) for idx, attrs in scatter.T.to_dict().items())
    return G
