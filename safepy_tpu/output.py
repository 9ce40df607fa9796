"""TSV report writers.

Same three files and column schemas as the reference (safepy/safe.py:1267-1306)
into ``output_dir``: domain properties, attribute properties, and node properties
(key / label / primary domain / NES / num_domains — or the full NES matrix when no
domains have been computed). One deliberate fix: ``num_domains`` sums the
*renumbered* per-domain count columns (kept consistent by ``trim_domains``), where
the reference indexes renumbered ids into original-id columns (safe.py:1294) and
silently reports wrong counts after a middle domain is trimmed.
"""

from __future__ import annotations

import logging
import os

import networkx as nx
import pandas as pd


def _node_table(sf):
    """The node-properties DataFrame: domain summary when domains exist, the
    full NES matrix otherwise."""
    keyed = nx.get_node_attributes(sf.graph, "key")
    labels = nx.get_node_attributes(sf.graph, "label")

    if sf.node2domain is None:
        table = pd.DataFrame(sf.nes, columns=sf.attributes["name"])
        table.insert(loc=0, column="key", value=list(keyed.values()))
        table.insert(loc=1, column="label", value=list(labels.values()))
        return table

    surviving = sf.domains["id"]
    return pd.DataFrame({
        "id": list(keyed.keys()),
        "key": list(keyed.values()),
        "label": list(labels.values()),
        "domain": sf.node2domain["primary_domain"].values,
        "nes": sf.node2domain["primary_nes"].values,
        "num_domains": sf.node2domain[surviving].sum(axis=1).values,
    })


def print_output_files(sf, **kwargs):
    if "output_dir" in kwargs:
        sf.output_dir = kwargs["output_dir"]

    def _emit(frame, filename):
        path = os.path.join(sf.output_dir, filename)
        frame.to_csv(path, sep="\t")
        logging.info(path)

    if sf.domains is not None:
        # the unassigned pseudo-domain (id 0) is not a reportable domain
        sf.domains.drop(labels=[0], axis=0, inplace=True, errors="ignore")
        _emit(sf.domains, "domain_properties_annotation.txt")

    _emit(sf.attributes, "attribute_properties_annotation.txt")

    sf.nodes = _node_table(sf)
    _emit(sf.nodes, "node_properties_annotation.txt")
