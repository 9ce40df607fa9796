"""MATLAB session loading for legacy SAFE inputs.

Reference semantics: safepy/safe_io.py:694-732 — ``scipy.io.loadmat`` with
mat-structs recursively converted to nested Python dicts.
"""

from __future__ import annotations

import scipy.io as spio


def load_mat(filename: str) -> dict:
    """loadmat with mat_struct entries converted to nested dicts."""
    data = spio.loadmat(filename, struct_as_record=False, squeeze_me=True)
    return _convert_keys(data)


def _convert_keys(d: dict) -> dict:
    for key in d:
        if isinstance(d[key], spio.matlab.mat_struct):
            d[key] = _to_dict(d[key])
    return d


def _to_dict(matobj) -> dict:
    out = {}
    for field in matobj._fieldnames:
        elem = matobj.__dict__[field]
        if isinstance(elem, spio.matlab.mat_struct):
            out[field] = _to_dict(elem)
        else:
            out[field] = elem
    return out
