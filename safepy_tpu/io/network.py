"""Network loaders: tab text, gpickle, MATLAB sessions, Cytoscape bundles, scatter.

Behavioral spec is the reference loader suite (safepy/safe_io.py:30-285):

  * ``load_network_from_txt`` — 3-column (key1, key2, weight) or 5-column
    (label1, key1, label2, key2, weight) tab files, ``.gz`` supported; ``.txt`` has
    no header, ``.tsv`` has one. Nodes renumbered 0..N-1; spring layout + edge
    lengths applied.
  * ``load_network_from_gpickle`` — a pickled, fully-prepared graph.
  * ``load_network_from_mat`` — legacy MATLAB SAFE session
    (``layout.edges/label/label_orf/x/y``) with fixed coordinates.
  * ``load_network_from_cys`` — a Cytoscape session zip: node x/y from the XGMML
    view, edges from the network XML, node attributes from the SHARED_ATTRS
    node.cytable CSV; node ids relabeled to 0..N-1.
  * ``load_network_from_scatter`` — a TSV of (key, x, y, label): an edgeless graph
    of positioned nodes for annotating UMAP/t-SNE-style embeddings.
"""

from __future__ import annotations

import gzip
import logging
import os
import pickle
import shutil
import tempfile
import zipfile
from os.path import expanduser
from pathlib import Path
from xml.dom import minidom

import networkx as nx
import numpy as np
import pandas as pd

from safepy_tpu.io.layout import apply_network_layout, calculate_edge_lengths
from safepy_tpu.io.matlab import load_mat


def load_network_from_txt(filename, layout="spring_embedded", node_key_attribute="key",
                          seed=None, verbose=True, engine="auto"):
    """Load a network from a tab-delimited text file and apply a layout.

    engine: 'auto' (native C++ parser when available, else pandas), 'native', or
    'pandas'. Both engines produce identical graphs (node ordering included).
    """
    filename = filename.replace("~", expanduser("~"))

    opener = gzip.open if Path(filename).suffix == ".gz" else open
    with opener(filename, "rt") as f:
        num_cols = len(f.readline().split("\t"))

    first_suffix = Path(filename).suffixes[0]
    if first_suffix == ".txt":
        read_kws = dict(header=None)
    elif first_suffix == ".tsv":
        read_kws = dict(header=0, names=range(num_cols))
    else:
        raise ValueError(f"extension {first_suffix} not supported")

    if engine in ("auto", "native") and num_cols in (3, 5):
        from safepy_tpu import native
        parsed = native.parse_edgelist(filename, num_cols,
                                       skip_header=first_suffix == ".tsv")
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

    if num_cols == 3:
        data = pd.read_table(filename, sep="\t", dtype={0: str, 1: str, 2: float},
                             **read_kws)
        data = data.rename(columns={0: "node_key1", 1: "node_key2", 2: "edge_weight"})
        data["node_label1"] = data["node_key1"]
        data["node_label2"] = data["node_key2"]
    elif num_cols == 5:
        data = pd.read_table(filename, sep="\t", **read_kws)
        data = data.rename(columns={0: "node_label1", 1: "node_key1",
                                    2: "node_label2", 3: "node_key2",
                                    4: "edge_weight"})
    else:
        raise ValueError("Unknown network file format. 3 or 5 columns are expected.")

    t1 = data[["node_label1", "node_key1"]]
    t2 = data[["node_label2", "node_key2"]].rename(
        columns={"node_label2": "node_label1", "node_key2": "node_key1"})
    nodes = pd.concat([t1, t2], ignore_index=True).drop_duplicates()
    nodes = nodes.reset_index(drop=True)

    nodes_by_label = nodes.reset_index().set_index("node_label1")
    data["node_index1"] = nodes_by_label.loc[data["node_label1"], "index"].values
    data["node_index2"] = nodes_by_label.loc[data["node_label2"], "index"].values

    G = nx.Graph()
    nodes_by_index = nodes_by_label.reset_index().set_index("index")
    G.add_nodes_from(nodes_by_index.index.values)
    for n in G:
        G.nodes[n]["label"] = nodes_by_index.loc[n, "node_label1"]
        G.nodes[n][node_key_attribute] = nodes_by_index.loc[n, "node_key1"]

    G.add_edges_from(tuple(x) for x in data[["node_index1", "node_index2"]].values)

    G = apply_network_layout(G, layout=layout, seed=seed, verbose=verbose)
    G = calculate_edge_lengths(G, verbose=verbose)
    return G


def load_network_from_gpickle(filename, verbose=True):
    filename = filename.replace("~", expanduser("~"))
    with open(filename, "rb") as f:
        return pickle.load(f)


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


def load_network_from_cys(filename, view_name=None, verbose=True):
    filename = filename.replace("~", expanduser("~"))
    if verbose:
        logging.info("Loading the cys file %s..." % filename)

    # Extract into a private temp dir (the reference unzips into cwd and deletes
    # afterwards, safe_io.py:162-266 — same lifecycle, safer location).
    workdir = tempfile.mkdtemp(prefix="safepy_cys_")
    try:
        with zipfile.ZipFile(filename, "r") as zf:
            files = zf.namelist()
            zf.extractall(workdir)

        view_files = [f for f in files if "/views/" in f]
        if view_name:
            view_file = [v for v in view_files if v.endswith(view_name + ".xgmml")][0]
        else:
            view_file = view_files[0]
        if verbose:
            logging.info("Loading the view: %s" % view_file)

        doc = minidom.parse(os.path.join(workdir, view_file))
        node_labels, node_xs, node_ys = {}, {}, {}
        for node in doc.getElementsByTagName("node"):
            node_id = int(node.attributes["cy:nodeId"].value)
            node_labels[node_id] = node.attributes["label"].value
            for child in node.childNodes:
                if child.nodeType == 1 and child.tagName == "graphics":
                    node_xs[node_id] = float(child.attributes["x"].value)
                    node_ys[node_id] = float(child.attributes["y"].value)

        network_file = [f for f in files if "/networks/" in f][0]
        if verbose:
            logging.info("Loading the first network: %s" % network_file)
        doc = minidom.parse(os.path.join(workdir, network_file))
        edge_list = []
        for edge in doc.getElementsByTagName("edge"):
            attrs = edge.attributes.keys()
            if "source" in attrs and "target" in attrs:
                edge_list.append((int(edge.attributes["source"].value),
                                  int(edge.attributes["target"].value)))

        G = nx.Graph()
        G.add_edges_from(edge_list)

        to_remove = []
        for node in G.nodes:
            if node in node_labels:
                G.nodes[node]["label"] = node_labels[node]
                G.nodes[node]["x"] = node_xs[node]
                G.nodes[node]["y"] = node_ys[node]
            else:
                to_remove.append(node)
        for node in to_remove:
            G.remove_node(node)

        # Node attribute table (SHARED_ATTRS node.cytable next to the network).
        file_name = os.path.splitext(os.path.basename(network_file))[0]
        contains = ["/tables/", file_name, "SHARED_ATTRS", "node.cytable"]
        attr_files = [f for f in files if all(c in f for c in contains)]
        if attr_files:
            attributes = pd.read_csv(os.path.join(workdir, attr_files[0]),
                                     sep=",", header=None, skiprows=1)
            col_headers, row_start = [], 0
            for ix_row in range(min(7, len(attributes))):
                val = attributes.iloc[ix_row, 0]
                if val == "SUID":
                    col_headers = list(attributes.iloc[ix_row, :])
                elif str(val).isnumeric():
                    row_start = ix_row
                    break
            if col_headers:
                attributes.columns = col_headers
                attributes = attributes.iloc[row_start:, :]
                attributes["SUID"] = attributes["SUID"].astype(int)
                for _, row in attributes.iterrows():
                    if row["SUID"] in G.nodes:
                        for c in col_headers[1:]:
                            G.nodes[row["SUID"]][c] = row[c]

        mapping = {node: ix for ix, node in enumerate(G.nodes)}
        G = nx.relabel_nodes(G, mapping)
        return calculate_edge_lengths(G, verbose=verbose)
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


def load_network_from_scatter(filename, node_key_attribute="key", verbose=True):
    filename = filename.replace("~", expanduser("~"))
    if verbose:
        logging.info("Loading the file of node coordinates...")
    scatter = pd.read_csv(filename, sep="\t")
    scatter.columns = ["key", "x", "y", "label"]
    G = nx.Graph()
    G.add_nodes_from((idx, attrs) for idx, attrs in scatter.T.to_dict().items())
    return G
