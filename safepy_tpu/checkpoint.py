"""Stage-level checkpoint / resume.

The reference checkpoints by pickling the whole SAFE object (safepy/safe.py:237-242)
— resume is "unpickle and keep calling methods", since every pipeline stage reads
and writes instance attributes. That workflow is preserved (``SAFE.save`` pickles),
and this module adds an array-native alternative:

  * :func:`save_session` — one ``.npz`` with the dense pipeline state
    (neighborhoods, distances, scores, p-values, NES) plus a JSON sidecar of
    settings and the attributes/domains tables — portable, inspectable, and not
    tied to Python pickles of the class;
  * :func:`load_session` — rebuilds a SAFE instance at the same stage; every stage
    method can then be re-run independently.
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd

_SETTINGS = [
    "node_key_attribute", "attribute_sign", "node_distance_metric",
    "neighborhood_radius_type", "neighborhood_radius", "background",
    "num_permutations", "multiple_testing", "neighborhood_score_type",
    "enrichment_type", "enrichment_threshold", "enrichment_max_log10",
    "attribute_enrichment_min_size", "random_seed",
    "attribute_unimodality_metric", "attribute_distance_metric",
    "attribute_distance_threshold", "output_dir",
]

_ARRAYS = ["node2attribute", "ns", "pvalues_neg", "pvalues_pos", "nes",
           "nes_binary"]


def save_session(sf, path: str) -> None:
    """Write <path>.npz (arrays) + <path>.meta.json (settings/tables).

    Band-stored sessions (huge networks, ops/apsp_bandstore.py) checkpoint
    the O(N*W) band itself — the dense matrices may be guarded or plainly
    impossible at that scale."""
    from safepy_tpu.ops.apsp_bandstore import BandedMatrix

    arrays = {}
    nbr_dev = getattr(sf, "_neighborhoods_dev", None)
    if isinstance(nbr_dev, BandedMatrix) and not nbr_dev.dense_ok():
        # keep the band's own dtype: int8 plain, uint8 = BIT-packed (8
        # cells/byte, ops/apsp_bandstore.is_packed_bits — dtype IS the format)
        band_np = np.asarray(nbr_dev.data)
        arrays["neighborhoods_band"] = (
            band_np if band_np.dtype == np.uint8
            else band_np.astype(np.int8, copy=False))
        arrays["band_rank"] = np.asarray(nbr_dev.rank, dtype=np.int64)
        arrays["band_meta"] = np.asarray(
            [nbr_dev.n, nbr_dev.band, nbr_dev.block], dtype=np.int64)
        nd_dev = getattr(sf, "_node_distances_dev", None)
        if isinstance(nd_dev, BandedMatrix):
            arrays["node_distances_band"] = np.asarray(nd_dev.data,
                                                       dtype=np.float32)
    else:
        nbr = sf.neighborhoods
        if nbr is not None:
            arrays["neighborhoods"] = np.asarray(nbr, dtype=np.int8)
        nd = sf.node_distances
        if nd is not None:
            arrays["node_distances"] = np.asarray(nd, dtype=np.float32)
    for name in _ARRAYS:
        val = getattr(sf, name)
        if val is not None:
            arrays[name] = np.asarray(val)

    np.savez_compressed(path + ".npz", **arrays)

    meta = {"settings": {k: getattr(sf, k) for k in _SETTINGS}}
    if sf.attributes is not None:
        meta["attributes"] = sf.attributes.to_json(orient="split",
                                                   default_handler=str)
    if sf.node2domain is not None:
        meta["node2domain"] = sf.node2domain.to_json(orient="split",
                                                     default_handler=str)
    if sf.domains is not None:
        meta["domains"] = sf.domains.to_json(orient="split", default_handler=str)
    with open(path + ".meta.json", "w") as f:
        json.dump(meta, f)


def load_session(path: str, graph=None, verbose: bool = True):
    """Rebuild a SAFE instance from :func:`save_session` output.

    The graph itself is not stored in the npz (it lives in its own gpickle via
    ``SAFE.save_network``); pass it here to re-enable graph-dependent stages.
    """
    from safepy_tpu.safe import SAFE
    import io as _io

    sf = SAFE(verbose=verbose)
    with open(path + ".meta.json") as f:
        meta = json.load(f)
    for k, v in meta["settings"].items():
        setattr(sf, k, v)

    data = np.load(path + ".npz", allow_pickle=False)
    if "neighborhoods_band" in data:
        from safepy_tpu.ops.apsp_bandstore import BandedMatrix
        n, band, block = (int(x) for x in data["band_meta"])
        rank = data["band_rank"]
        # the saved indicator band stays int8 on load: it is the dominant
        # HBM/upload object at 100k+ nodes (4x smaller than f32), and every
        # banded consumer casts per block inside its contraction loop
        sf._neighborhoods_dev = BandedMatrix(
            data["neighborhoods_band"], rank, n, band, block, fill=0.0)
        sf._neighborhoods_np = None
        if "node_distances_band" in data:
            sf._node_distances_dev = BandedMatrix(
                data["node_distances_band"], rank, n, band, block,
                fill=np.inf)
            sf._node_distances_np = None
    if "neighborhoods" in data:
        sf.neighborhoods = data["neighborhoods"].astype(int)
    if "node_distances" in data:
        sf.node_distances = data["node_distances"].astype(np.float64)
    for name in _ARRAYS:
        if name in data:
            setattr(sf, name, data[name])

    for key in ("attributes", "node2domain", "domains"):
        if key in meta:
            setattr(sf, key, pd.read_json(_io.StringIO(meta[key]), orient="split"))

    if graph is not None:
        sf.graph = graph
    return sf
