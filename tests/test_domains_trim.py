"""Trimming a MIDDLE domain: renumbering must stay consistent end-to-end.

The reference renumbers domain ids densely after trimming (safe.py:728-735) but
leaves node2domain's per-domain count columns under the original cluster ids, so
its node report (safe.py:1294) silently misindexes once a middle domain is trimmed.
trim_domains here folds trimmed columns into domain 0 and renames the survivors;
print_output_files then reports correct num_domains (divergence noted in PARITY.md).
"""

from __future__ import annotations

import types

import networkx as nx
import numpy as np
import pandas as pd

from safepy_tpu import domains as dm
from safepy_tpu import output as out


def _fixture():
    # 6 attributes over 3 domains (1, 2, 3); domain 2 is primary for only one
    # node and gets trimmed at min_size=2
    attributes = pd.DataFrame({
        "id": np.arange(6),
        "name": ["alpha one", "alpha two", "beta odd", "gamma one",
                 "gamma two", "unclustered"],
        "domain": [1, 1, 2, 3, 3, 0],
        "top": [True, True, True, True, True, False],
    })
    node2domain = pd.DataFrame({
        0: [0, 0, 0, 0, 0],
        1: [2, 2, 0, 0, 0],
        2: [0, 1, 2, 0, 0],
        3: [0, 0, 0, 3, 3],
    })
    node2domain["primary_domain"] = [1, 1, 2, 3, 3]
    node2domain["primary_nes"] = [2.0, 2.5, 1.4, 3.0, 3.1]
    return attributes, node2domain


def test_trim_middle_domain_renumbers_everything():
    attributes, node2domain = _fixture()
    attributes, node2domain, domains = dm.trim_domains(
        attributes, node2domain, min_size=2, verbose=False)

    # old domain 3 becomes 2; old domain 2 folds into 0
    assert list(attributes["domain"]) == [1, 1, 0, 2, 2, 0]
    assert list(node2domain["primary_domain"]) == [1, 1, 0, 2, 2]
    assert list(domains["id"]) == [0, 1, 2]

    count_cols = [c for c in node2domain.columns
                  if c not in ("primary_domain", "primary_nes")]
    assert count_cols == [0, 1, 2]
    # trimmed domain's counts folded into the unassigned column
    assert list(node2domain[0]) == [0, 1, 2, 0, 0]
    # surviving domains keep their counts under the NEW ids
    assert list(node2domain[2]) == [0, 0, 0, 3, 3]


def test_output_num_domains_after_middle_trim(tmp_path):
    attributes, node2domain = _fixture()
    attributes, node2domain, domains = dm.trim_domains(
        attributes, node2domain, min_size=2, verbose=False)

    graph = nx.empty_graph(5)
    for n in graph:
        graph.nodes[n]["key"] = graph.nodes[n]["label"] = f"g{n}"
    sf = types.SimpleNamespace(graph=graph, attributes=attributes,
                               node2domain=node2domain, domains=domains,
                               nodes=None, nes=None,
                               output_dir=str(tmp_path))

    out.print_output_files(sf)

    report = pd.read_csv(tmp_path / "node_properties_annotation.txt",
                         sep="\t", index_col=0)
    # num_domains = enriched top attributes within SURVIVING domains (domain 0
    # is dropped from the report): node 2's only enrichments were in the trimmed
    # domain -> 0, never the misindexed count the reference would report
    assert list(report["num_domains"]) == [2, 2, 0, 3, 3]
    assert list(report["domain"]) == [1, 1, 0, 2, 2]
