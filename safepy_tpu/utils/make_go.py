"""GO annotation matrix builder: OBO ontology + GAF annotations -> gene x term
binary matrix with ancestor propagation.

Reference analog: safepy/utils/make_go.py (which targets the removed NetworkX 1.x
``graph.node`` API). Same inputs and outputs, modern implementation:

  * stream-parse the OBO v1.2 dump into term records;
  * build the is_a DiGraph for the requested branch (p/c/f);
  * propagate annotations to all ancestors with one toposort pass instead of
    per-term recursive predecessor walks;
  * genes with no surviving term are assigned to the branch root.

CLI::

    python -m safepy_tpu.utils.make_go --path-to-obo go-basic.obo \
        --path-to-annotations sgd.gaf --go-branch p
"""

from __future__ import annotations

import argparse
import os
import pickle
from collections import defaultdict

import networkx as nx
import numpy as np
import pandas as pd

NAMESPACES = {"p": "biological_process", "c": "cellular_component",
              "f": "molecular_function"}


def parse_go_obo(path_to_obo):
    """Yield one dict per [Term] stanza of an OBO v1.2 file."""
    with open(path_to_obo, "r") as infile:
        current = None
        for line in infile:
            line = line.strip()
            if not line:
                continue
            if line == "[Term]":
                if current:
                    yield _finish_term(current)
                current = defaultdict(list)
            elif line == "[Typedef]":
                # yield the pending term first (the reference silently drops the
                # term preceding the first [Typedef], make_go.py:111-113)
                if current:
                    yield _finish_term(current)
                current = None
            elif current is not None:
                key, _, val = line.partition(":")
                val_id, _, _ = val.partition("!")
                current[key].append(val_id.strip())
        if current:
            yield _finish_term(current)


def _finish_term(term):
    out = dict(term)
    for key, value in out.items():
        if key != "is_a" and len(value) == 1:
            out[key] = value[0]
    return out


def get_go_graph(path_to_obo):
    """OBO -> {'go_graph': DiGraph(parent -> child), 'go_details': DataFrame}."""
    if os.path.splitext(path_to_obo)[1] == ".p":
        return pd.read_pickle(path_to_obo)

    go_graph = nx.DiGraph()
    rows = []
    for go_term in parse_go_obo(path_to_obo):
        name = go_term.get("name", "")
        if isinstance(name, str) and name.startswith("obsolete"):
            continue
        rows.append({k: go_term.get(k, "") for k in ("id", "name", "namespace")})
        go_graph.add_node(go_term["id"], namespace=go_term.get("namespace", ""))
        for parent in go_term.get("is_a", []):
            if parent not in go_graph:
                go_graph.add_node(parent, namespace=go_term.get("namespace", ""))
            go_graph.add_edge(parent, go_term["id"])

    go_details = pd.DataFrame(rows)
    if len(go_details):
        go_details.index = go_details["id"]
    return {"go_graph": go_graph, "go_details": go_details}


def ancestors_closure(graph):
    """{term: set of term + all is_a ancestors}, one pass in topological order."""
    closure = {}
    for node in nx.topological_sort(graph):
        s = {node}
        for parent in graph.predecessors(node):
            s |= closure[parent]
        closure[node] = s
    return closure


def read_annotations(path_to_annotations):
    """GAF file -> DataFrame indexed by the gene id column (column 1)."""
    go_annotations = pd.read_csv(path_to_annotations, delimiter="\t", header=None,
                                 comment="!", dtype={1: str, 10: str})
    go_annotations.index = go_annotations[1]
    return go_annotations


def make_locus2term(go_graph, go_annotations):
    """Binary (loci x terms) matrix with ancestor propagation."""
    go_terms = sorted(go_graph.nodes())
    loci = sorted(set(go_annotations.index))
    term_index = {t: i for i, t in enumerate(go_terms)}
    locus_index = {l: i for i, l in enumerate(loci)}
    closure = ancestors_closure(go_graph)

    locus2term = np.zeros((len(loci), len(go_terms)), dtype=np.int8)
    pairs = go_annotations[[1, 4]].drop_duplicates()
    for gene, term in pairs.itertuples(index=False):
        if term not in closure:
            continue
        r = locus_index[gene]
        for t in closure[term]:
            locus2term[r, term_index[t]] = 1

    df = pd.DataFrame(locus2term, index=loci, columns=go_terms)

    # drop empty terms; orphan loci get the branch root
    df = df.loc[:, df.sum(axis=0) > 0]
    roots = [n for n, d in go_graph.in_degree() if d == 0]
    orphans = df.sum(axis=1) == 0
    if roots:
        df.loc[orphans, roots[0]] = 1
    print("%d loci had 0 terms and were assigned to the root."
          % int(orphans.sum()))
    return df.astype(int)


def make_go_matrix(path_to_obo="", path_to_annotations="", go_branch="p"):
    """End-to-end: OBO + GAF -> propagated matrix, pickled + TSV'd next to the GAF."""
    dirname = os.path.dirname(path_to_annotations)

    go = get_go_graph(path_to_obo)
    go_graph = go["go_graph"]
    go_annotations = read_annotations(path_to_annotations)

    branch_nodes = [n for n in go_graph
                    if go_graph.nodes[n].get("namespace") == NAMESPACES[go_branch]]
    go_graph_branch = go_graph.subgraph(branch_nodes)

    go_matrix = make_locus2term(go_graph_branch, go_annotations)

    output = {"go_matrix": go_matrix,
              "go_details": go["go_details"],
              "locus_details": go_annotations,
              "tree_path": path_to_obo,
              "annotations_path": path_to_annotations}

    pickle_path = os.path.join(dirname, "go_" + go_branch + ".p")
    print("Saving the results at %s" % pickle_path)
    with open(pickle_path, "wb") as handle:
        pickle.dump(output, handle)

    txt_path = os.path.join(dirname, "go_" + go_branch + "_matrix.txt")
    print("Printing the gene-to-term matrix at %s" % txt_path)
    go_matrix.to_csv(txt_path, sep="\t")
    return go_matrix


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Generate a matrix of gene (locus) to GO term associations.")
    parser.add_argument("--path-to-obo", type=str,
                        help="Path to file containing the GO tree")
    parser.add_argument("--path-to-annotations", type=str,
                        help="Path to gene-to-term annotation file")
    parser.add_argument("--go-branch", default="p", type=str, help="p, c or f")
    args = parser.parse_args(argv)
    make_go_matrix(path_to_obo=args.path_to_obo,
                   path_to_annotations=args.path_to_annotations,
                   go_branch=args.go_branch)


if __name__ == "__main__":
    main()
