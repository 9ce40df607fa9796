"""Neighborhood scores on the MXU, with explicit NaN masks.

Reference semantics: safepy/safe_extras.py:6-33 — ``AB = neighborhoods @
nan_to_zero(node2attribute)`` is the 'sum' score; the 'z-score' variant divides the
per-neighborhood mean by the per-neighborhood standard deviation computed via
``E[X^2] - E[X]^2`` with a NaN-count matmul, and NaNs out neighborhoods with zero
variance or fewer than 3 annotated members.

TPU-native notes: NaNs are carried as an explicit 0/1 mask instead of NaN arithmetic,
so every contraction is a clean dense GEMM for the MXU. ``precision=HIGHEST`` keeps
f32 matmuls at full f32 accumulation (the default TPU f32 path decomposes through
bf16), which keeps integer-valued scores exact — the permutation null counts ties with
``<=`` / ``>=`` so score determinism matters.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_PRECISIONS = {"highest": jax.lax.Precision.HIGHEST,
               "high": jax.lax.Precision.HIGH,
               "default": jax.lax.Precision.DEFAULT}


def dot_kwargs(precision: str = "highest"):
    """Matmul precision for the score contractions. 'highest' keeps f32
    accumulation exact for integer-valued scores (full tie parity with the
    reference's counting); 'high' is the 3-pass bf16 decomposition (~2x faster,
    near-f32 fidelity); 'default' uses the single-pass bf16 MXU path — fastest
    at large N, with obs and permuted scores rounded identically so tie
    semantics stay consistent."""
    return dict(precision=_PRECISIONS[precision],
                preferred_element_type=jnp.float32)


_DOT_KW = dot_kwargs()


def zscore_from_contractions(AB, N, EXX_sum):
    """z-scores from the three neighborhood contractions (value sum, annotated
    count, squared-value sum) — shared by the dense, permuted-batch, and
    banded score paths. NaN where std == 0 or fewer than 3 annotated members
    (reference safe_extras.py:19-31)."""
    safe_N = jnp.where(N > 0, N, 1.0)
    M = AB / safe_N
    EXX = EXX_sum / safe_N
    std = jnp.sqrt(jnp.maximum(EXX - M * M, 0.0))
    score = jnp.where(std > 0, M / jnp.where(std > 0, std, 1.0), jnp.nan)
    return jnp.where(N < 3, jnp.nan, score)


@functools.partial(jax.jit, static_argnames=("score_type", "precision"))
def compute_neighborhood_score(neighborhoods, node2attribute,
                               score_type: str = "sum",
                               precision: str = "highest"):
    """Per-neighborhood attribute scores.

    Args:
      neighborhoods: (N, N) 0/1 indicator, row i = members of node i's neighborhood.
      node2attribute: (N, A) attribute values, NaN = unannotated.
      score_type: 'sum' or 'z-score'.
      precision: 'highest' (default) or 'default' — see :func:`dot_kwargs`.

    Returns:
      (N, A) f32 scores; NaN where undefined (z-score with std 0 or < 3 members).
    """
    _DOT_KW = dot_kwargs(precision)
    A = jnp.asarray(neighborhoods, jnp.float32)
    vals = jnp.asarray(node2attribute, jnp.float32)
    mask = jnp.isfinite(vals)
    B = jnp.where(mask, vals, 0.0)

    AB = jnp.dot(A, B, **_DOT_KW)  # sum of attribute values in a neighborhood

    if score_type == "sum":
        return AB

    if score_type != "z-score":
        raise ValueError(f"unknown neighborhood_score_type: {score_type!r}")

    NB = mask.astype(jnp.float32)
    N = jnp.dot(A, NB, **_DOT_KW)  # annotated members per neighborhood
    EXX_sum = jnp.dot(A, B * B, **_DOT_KW)
    return zscore_from_contractions(AB, N, EXX_sum)
