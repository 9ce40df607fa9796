"""Host graph/data layer: file loaders, layouts, attribute alignment.

Thin NetworkX/pandas tier between the filesystem and the device core. Mirrors the
loader surface of the reference (safepy/safe_io.py): txt/tsv(.gz), gpickle, MATLAB
.mat sessions, Cytoscape .cys bundles, and .scatter coordinate tables, plus the
spring/Kamada-Kawai layouts and layout-derived edge lengths.
"""

from safepy_tpu.io.network import (
    load_network_from_txt,
    load_network_from_gpickle,
    load_network_from_mat,
    load_network_from_cys,
    load_network_from_scatter,
)
from safepy_tpu.io.layout import apply_network_layout, calculate_edge_lengths
from safepy_tpu.io.attributes import read_attributes
from safepy_tpu.io.matlab import load_mat
from safepy_tpu.io.graph_arrays import (
    graph_to_arrays,
    get_node_coordinates,
    chop_and_filter,
)

__all__ = [
    "load_network_from_txt",
    "load_network_from_gpickle",
    "load_network_from_mat",
    "load_network_from_cys",
    "load_network_from_scatter",
    "apply_network_layout",
    "calculate_edge_lengths",
    "read_attributes",
    "load_mat",
    "graph_to_arrays",
    "get_node_coordinates",
    "chop_and_filter",
]
