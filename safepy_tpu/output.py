"""TSV report writers (reference: safepy/safe.py:1267-1306).

Three files into ``output_dir``: domain properties, attribute properties, and node
properties (key/label/primary domain/NES/num-domains — or the full NES matrix when
no domains have been computed).
"""

from __future__ import annotations

import logging
import os

import networkx as nx
import pandas as pd


def print_output_files(sf, **kwargs):
    if "output_dir" in kwargs:
        sf.output_dir = kwargs["output_dir"]

    path_domains = os.path.join(sf.output_dir, "domain_properties_annotation.txt")
    if sf.domains is not None:
        sf.domains.drop(labels=[0], axis=0, inplace=True, errors="ignore")
        sf.domains.to_csv(path_domains, sep="\t")
        logging.info(path_domains)

    path_attributes = os.path.join(sf.output_dir, "attribute_properties_annotation.txt")
    sf.attributes.to_csv(path_attributes, sep="\t")
    logging.info(path_attributes)

    path_nodes = os.path.join(sf.output_dir, "node_properties_annotation.txt")

    t = nx.get_node_attributes(sf.graph, "key")
    ids = list(t.keys())
    keys = list(t.values())
    labels = list(nx.get_node_attributes(sf.graph, "label").values())

    if sf.node2domain is not None:
        domains = sf.node2domain["primary_domain"].values
        ness = sf.node2domain["primary_nes"].values
        num_domains = sf.node2domain[sf.domains["id"]].sum(axis=1).values
        sf.nodes = pd.DataFrame(data={"id": ids, "key": keys, "label": labels,
                                      "domain": domains, "nes": ness,
                                      "num_domains": num_domains})
    else:
        sf.nodes = pd.DataFrame(sf.nes)
        sf.nodes.columns = sf.attributes["name"]
        sf.nodes.insert(loc=0, column="key", value=keys)
        sf.nodes.insert(loc=1, column="label", value=labels)

    sf.nodes.to_csv(path_nodes, sep="\t")
    logging.info(path_nodes)
