"""Input validation and NaN policing.

SURVEY §5: the reference has no sanitizers; the rebuild's pure-functional core
removes the shared-state hazard class, and this module covers the remaining
data-quality checks:

  * :func:`validate_network_arrays` — structural checks on the dense inputs the
    device core consumes (symmetry, non-negative weights, zero diagonal);
  * :func:`validate_attributes` — attribute-matrix sanity (shape alignment,
    all-NaN columns, non-finite garbage that is not NaN);
  * :func:`checkify_pipeline` — wraps a jitted pipeline function with
    ``jax.experimental.checkify`` NaN/OOB checks for debugging device NaNs.
"""

from __future__ import annotations

import logging

import numpy as np


class ValidationError(ValueError):
    pass


def validate_network_arrays(dist0: np.ndarray) -> None:
    """Check a dense FW initialization: square, zero diagonal, symmetric,
    non-negative finite-or-inf entries."""
    if dist0.ndim != 2 or dist0.shape[0] != dist0.shape[1]:
        raise ValidationError(f"distance init must be square, got {dist0.shape}")
    diag = np.diagonal(dist0)
    if not np.all(diag == 0):
        raise ValidationError("distance init diagonal must be exactly 0")
    finite = np.isfinite(dist0)
    if np.any(dist0[finite] < 0):
        raise ValidationError("negative edge lengths are not allowed "
                              "(min-plus shortest paths require >= 0)")
    if np.isnan(dist0).any():
        raise ValidationError("distance init contains NaN (use +inf for "
                              "non-edges)")
    # spot-check symmetry on a sample to keep this O(N) not O(N^2) for huge N
    n = dist0.shape[0]
    rng = np.random.default_rng(0)
    ii = rng.integers(0, n, min(4096, n * 4))
    jj = rng.integers(0, n, ii.size)
    if not np.array_equal(dist0[ii, jj], dist0[jj, ii]):
        raise ValidationError("distance init is not symmetric")


def validate_attributes(node2attribute: np.ndarray, num_nodes: int,
                        warn=True) -> None:
    if node2attribute.ndim != 2:
        raise ValidationError(f"attribute matrix must be 2-D, got "
                              f"{node2attribute.shape}")
    if node2attribute.shape[0] != num_nodes:
        raise ValidationError(
            f"attribute matrix has {node2attribute.shape[0]} rows for "
            f"{num_nodes} network nodes — misaligned labels?")
    # temp-free inf check: isinf().any() allocates an (N, A) bool temp that
    # costs ~19 s at GO scale in this runtime's degraded allocator; two
    # nan-reductions touch no scratch
    if node2attribute.size:
        with np.errstate(invalid="ignore"):
            lo = np.nanmin(node2attribute)
            hi = np.nanmax(node2attribute)
        if np.isinf(lo) or np.isinf(hi):
            raise ValidationError("attribute matrix contains +/-inf; use NaN "
                                  "for missing values")
    if warn:
        all_nan = np.all(np.isnan(node2attribute), axis=0)
        if all_nan.any():
            logging.warning("%d attribute column(s) are entirely NaN and will "
                            "produce empty enrichments", int(all_nan.sum()))


def checkify_pipeline(fn):
    """Wrap a jittable fn with checkify NaN/index checks; returns (err, out)."""
    from jax.experimental import checkify

    checked = checkify.checkify(
        fn, errors=checkify.float_checks | checkify.index_checks)

    def run(*args, **kwargs):
        err, out = checked(*args, **kwargs)
        err.throw()
        return out

    return run
