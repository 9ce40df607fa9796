"""Attribute matrix loading and alignment to the network's node order.

Reference semantics (safepy/safe_io.py:336-430):

  * accepts a legacy GO ``.mat`` (``go.term2orf`` transposed, orfs x term_ids), a
    tab-delimited ``.txt``/``.gz`` (first column = node label, remaining columns
    numeric attributes), or an in-memory pandas DataFrame;
  * coerces everything to numeric (non-numeric -> NaN), averages duplicate labels,
    reindexes rows to the network node order with a NaN fill;
  * optional ``mask_duplicates``: keeps one random network node per duplicated
    label, NaNs the rest;
  * logs the input census (labels x attributes, NaN/zero/positive/negative counts)
    — those log lines are part of the de-facto API (the reference's tests assert
    the same statistics).
"""

from __future__ import annotations

import logging
import os
from os.path import expanduser

import numpy as np
import pandas as pd

from safepy_tpu.io.matlab import load_mat


def read_attributes(attribute_file="", node_label_order=None, mask_duplicates=False,
                    fill_value=np.nan, verbose=True, rng=None):
    """Load and align an attribute matrix.

    Returns ``(attributes_df, node_label_order, node2attribute)`` where
    ``attributes_df`` has columns id/name, and ``node2attribute`` is the (N, A)
    float ndarray aligned to ``node_label_order``.
    """

    if isinstance(attribute_file, str):
        file_name = attribute_file.replace("~", expanduser("~"))
        _, ext = os.path.splitext(file_name)

        if ext == ".mat":
            mat = load_mat(file_name)
            node2attribute = pd.DataFrame(
                data=np.transpose(mat["go"]["term2orf"]),
                index=mat["go"]["orfs"],
                columns=mat["go"]["term_ids"])
            node2attribute = node2attribute.apply(pd.to_numeric, downcast="unsigned")
            attributes = pd.DataFrame(
                data={"id": mat["go"]["term_ids"], "name": mat["go"]["term_names"]})
        elif ext in (".txt", ".gz", ".tsv"):
            node2attribute = pd.read_csv(file_name, sep="\t", dtype={0: str})
            node2attribute.set_index(node2attribute.columns[0], drop=True, inplace=True)
            node2attribute = node2attribute.apply(
                pd.to_numeric, downcast="float", errors="coerce")
            attributes = pd.DataFrame(
                data={"id": np.arange(len(node2attribute.columns)),
                      "name": node2attribute.columns})
            node2attribute.columns = np.arange(len(node2attribute.columns))
        else:
            raise ValueError("Only attribute files with the following extensions "
                             "are accepted: .mat, .txt, .gz.")
    elif isinstance(attribute_file, pd.DataFrame):
        node2attribute = attribute_file
        attributes = pd.DataFrame(
            data={"id": np.arange(len(node2attribute.columns)),
                  "name": node2attribute.columns})
    else:
        raise ValueError(type(attribute_file))

    # Coerce to numeric — skip the per-column pandas pass when the frame is
    # already numeric (the common case; the full coercion costs ~15 s on a
    # 4,373-column GO matrix).
    if not all(pd.api.types.is_numeric_dtype(t) for t in node2attribute.dtypes):
        node2attribute = node2attribute.apply(pd.to_numeric, errors="coerce")
    attributes["name"] = attributes["name"].astype(str)

    if not node2attribute.index.is_unique:
        logging.info("\nThe attribute file contains multiple values for the same "
                     "labels. Their values will be averaged.")
        node2attribute = node2attribute.groupby(node2attribute.index).mean()

    if node_label_order is None or len(node_label_order) == 0:
        node_label_order = list(node2attribute.index.values)

    node_label_in_file = node2attribute.index.values
    known_labels = set(node_label_order)
    node_label_not_mapped = [x for x in node_label_in_file
                             if x not in known_labels]

    # skip the 100+ MB reindex copy when the frame is already in node order
    # (the common case for programmatically-built DataFrames)
    if not node2attribute.index.equals(pd.Index(node_label_order)):
        node2attribute = node2attribute.reindex(index=node_label_order,
                                                fill_value=fill_value)

    if mask_duplicates:
        rng = np.random.default_rng() if rng is None else rng
        idx = rng.permutation(np.arange(len(node2attribute)))
        mask_dups = node2attribute.iloc[idx].index.duplicated(keep="first")
        num_dups = int(mask_dups.sum())
        logging.info("\nThe network contains %d nodes with duplicate labels. "
                     "Only one random node per label will be considered. "
                     "The attribute values of all other nodes will be set to NaN." % num_dups)
        node2attribute.iloc[idx[mask_dups], :] = np.nan

    # No-copy view where pandas allows it (a full copy of a GO-scale matrix
    # costs seconds of first-touch page faults in this runtime). Pandas 3
    # copy-on-write usually hands the view out READ-ONLY; the one mutating
    # consumer (compute_pvalues with background='network') makes its own
    # writable copy on demand. The SOURCE float dtype is preserved: the text
    # loader's to_numeric(downcast='float') yields float32 frames, and
    # forcing float64 here measured 109 s of conversion writes at GO scale
    # (99,840 x 4,373) in this runtime — every compute consumer casts to its
    # own precision anyway (the device pipeline runs the f32 copy, counts
    # are exact in f32 below 2^24, and duplicate-label averaging already
    # happened on the pandas frame above).
    dt = node2attribute.dtypes.iloc[0] if len(node2attribute.columns) else None
    keep = (dt is not None and (node2attribute.dtypes == dt).all()
            and dt in (np.float32, np.float64))
    values = node2attribute.to_numpy(dtype=dt if keep else np.float64,
                                     copy=False)

    if verbose:
        logging.info("\nAttribute data provided: %d labels x %d attributes"
                     % (len(node_label_in_file), attributes.shape[0]))
        n_show = min(len(node_label_not_mapped), 3)
        if n_show > 0:
            m = len(node_label_not_mapped) - n_show
            logging.info(", ".join(map(str, node_label_not_mapped[:n_show]))
                         + " and %d other labels in the attribute file were not found "
                           "in the network." % m)
        n_mapped = len(node_label_in_file) - len(node_label_not_mapped)
        logging.info("\nAttribute data mapped onto the network: %d labels x %d attributes"
                     % (n_mapped, attributes.shape[0]))
        finite = ~np.isnan(values)
        logging.info("Values: %d NaNs" % int(np.sum(~finite)))
        logging.info("Values: %d zeros" % int(np.sum(values[finite] == 0)))
        logging.info("Values: %d positives" % int(np.sum(values[finite] > 0)))
        logging.info("Values: %d negatives" % int(np.sum(values[finite] < 0)))

    return attributes, node_label_order, values
