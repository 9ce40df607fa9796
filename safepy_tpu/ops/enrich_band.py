"""Enrichment statistics over band-storage neighborhoods — never densified.

The dense enrichment kernels contract an (N, N) indicator against (N, A)
attributes (reference safe.py:587-594, safe_extras.py:15). At band-storage
scale (ops/apsp_bandstore.py) the indicator only exists as the skewed radius
band, so every contraction becomes a block-row slab product:

  * :func:`band_score` — observed neighborhood scores (sum / z-score,
    reference safe_extras.py:6-33) via ONE banded pass (the z-score's three
    contractions ride a single stacked matmul);
  * :func:`scan_counts_band` — the two-sided permutation null
    (safe_extras.py:36-70): permuted operands come from the same keyed
    stable-sort (or index gather) as the dense engine, contracted against the
    valid-column-compacted band;
  * :func:`hypergeom_tail_band` — census + survival tail + device
    finalization (safe.py:556-608) with the census matmuls banded.

Everything here lives in the PERMUTED (banded-order) node frame; callers
un-permute the (N, A) row outputs with one row gather.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from safepy_tpu.ops.apsp_bandstore import band_matmul, band_matmul_batch
from safepy_tpu.ops.hypergeom import _sf_parts, finalize_logsf_device
from safepy_tpu.ops.permutation import (permuted_operands_sorted,
                                        uses_sort_path)
from safepy_tpu.ops.score import zscore_from_contractions


def _pad_rows_to(x, rows: int):
    return jnp.pad(x, ((0, rows - x.shape[0]),) + ((0, 0),) * (x.ndim - 1))


def band_score(s_ind, vals, *, bt: int, block: int = 128,
               score_type: str = "sum", precision: str = "highest"):
    """Observed neighborhood scores from the banded indicator.

    vals: (n, A) attribute values with NaNs, rows in the PERMUTED frame.
    Returns (npad, A) f32 scores (permuted frame; rows past n are pad junk).
    """
    npad = s_ind.shape[0] - 2 * bt * block
    vals = jnp.asarray(vals, jnp.float32)
    mask = jnp.isfinite(vals)
    B = _pad_rows_to(jnp.where(mask, vals, 0.0), npad)

    if score_type == "sum":
        return band_matmul(s_ind, B, bt=bt, block=block, precision=precision)
    if score_type != "z-score":
        raise ValueError(f"unknown neighborhood_score_type: {score_type!r}")

    NB = _pad_rows_to(mask.astype(jnp.float32), npad)
    stacked = jnp.concatenate([B, NB, B * B], axis=1)
    out = band_matmul(s_ind, stacked, bt=bt, block=block, precision=precision)
    AB, N, EXX_sum = jnp.split(out, 3, axis=1)
    return zscore_from_contractions(AB, N, EXX_sum)


def scan_counts_band(compact, starts, vals, mask, obs, key, *,
                     score_type: str, num_permutations: int, batch_size: int,
                     bt: int, block: int = 128, precision: str = "highest"):
    """Two-sided permutation counts against the compacted band.

    Args:
      compact: ((nb+2bt)*b, w_c) valid-column-compacted indicator
        (ops/apsp_bandstore.compact_band_columns).
      starts: (nb,) int32 slab starts (valid-rank frame).
      vals, mask: (V, A) f32 NaN->0 values / finite masks of the VALID rows,
        in permuted order (the rows the reference permutes, safe_extras.py:50).
      obs: (npad, A) observed scores in the permuted frame.

    Returns int32 (npad, A) counts_neg / counts_pos.
    """
    V, A = vals.shape
    w_c = compact.shape[1]
    v_pad = V + w_c  # slack so starts[i] + w_c never overruns
    num_chunks = -(-num_permutations // batch_size)
    chunk_keys = jax.random.split(key, num_chunks)
    sort_path = uses_sort_path(A)
    zscore = score_type == "z-score"

    def chunk_scores(chunk_key):
        if sort_path:
            Bp, NBp = permuted_operands_sorted(vals, mask, chunk_key,
                                               batch_size, zscore)
        else:
            perm_keys = jax.random.split(chunk_key, batch_size)
            perm_idx = jax.vmap(lambda k: jax.random.permutation(k, V))(perm_keys)
            Bp = jnp.take(vals, perm_idx, axis=0)
            NBp = jnp.take(mask, perm_idx, axis=0) if zscore else None
        if not zscore:
            Bp = jnp.pad(Bp, ((0, 0), (0, v_pad - V), (0, 0)))
            return band_matmul_batch(compact, Bp, starts, bt=bt, block=block,
                                     precision=precision)
        stacked = jnp.concatenate([Bp, NBp, Bp * Bp], axis=-1)
        stacked = jnp.pad(stacked, ((0, 0), (0, v_pad - V), (0, 0)))
        out = band_matmul_batch(compact, stacked, starts, bt=bt, block=block,
                                precision=precision)
        AB, Np, EXX_sum = jnp.split(out, 3, axis=-1)
        return zscore_from_contractions(AB, Np, EXX_sum)

    def chunk_body(carry, inputs):
        counts_neg, counts_pos = carry
        chunk_key, chunk_start = inputs
        scores = chunk_scores(chunk_key)
        live = (chunk_start + jnp.arange(batch_size)) < num_permutations
        live = live[:, None, None]
        counts_neg = counts_neg + jnp.sum(
            jnp.where(live & (scores <= obs[None]), 1, 0), axis=0,
            dtype=jnp.int32)
        counts_pos = counts_pos + jnp.sum(
            jnp.where(live & (scores >= obs[None]), 1, 0), axis=0,
            dtype=jnp.int32)
        return (counts_neg, counts_pos), None

    zeros = jnp.zeros(obs.shape, jnp.int32)
    zeros = zeros + (chunk_keys.ravel()[0] * 0).astype(jnp.int32)
    starts_ = jnp.arange(num_chunks) * batch_size
    (counts_neg, counts_pos), _ = jax.lax.scan(
        chunk_body, (zeros, zeros), (chunk_keys, starts_))
    return counts_neg, counts_pos


def hypergeom_tail_band(s_ind, vals, lgt, M, enrichment_threshold, *,
                        iterations: int, bt: int, block: int = 128,
                        precision: str = "highest"):
    """Hypergeometric census + survival tail over the banded indicator.

    vals: (n, A) binary annotations with NaNs, rows in the PERMUTED frame.
    Returns (nes_f32, log_sf_f32, nes_binary_int8) in the permuted frame —
    identical semantics to pipeline._hypergeom_tail with the two census
    matmuls (safe.py:587-594) riding one banded pass.
    """
    npad = s_ind.shape[0] - 2 * bt * block
    vals = jnp.asarray(vals, jnp.float32)
    finite = jnp.isfinite(vals)
    nan0 = jnp.where(finite, vals, 0.0)
    nodes_not_nan = jnp.any(finite, axis=1).astype(jnp.float32)

    stacked = _pad_rows_to(
        jnp.concatenate([nodes_not_nan[:, None], nan0], axis=1), npad)
    prod = band_matmul(s_ind, stacked, bt=bt, block=block, precision=precision)
    nsize = prod[:, 0]
    counts = prod[:, 1:]

    K = jnp.sum(nan0, axis=0)
    k64 = counts.astype(jnp.float64)
    K64 = jnp.broadcast_to(K.astype(jnp.float64)[None, :], counts.shape)
    n64 = jnp.broadcast_to(nsize.astype(jnp.float64)[:, None], counts.shape)
    parts = _sf_parts(k64, M, K64, n64, lgt, iterations)
    return finalize_logsf_device(parts, enrichment_threshold)


# jitted single-dispatch wrappers for the STAGED facade paths (the fused
# pipelines in safepy_tpu/pipeline.py trace the raw functions directly)
band_score_jit = functools.partial(
    jax.jit, static_argnames=("bt", "block", "score_type", "precision"))(
        band_score)
run_permutations_band = functools.partial(
    jax.jit, static_argnames=("score_type", "num_permutations", "batch_size",
                              "bt", "block", "precision"))(scan_counts_band)
hypergeom_tail_band_jit = functools.partial(
    jax.jit, static_argnames=("iterations", "bt", "block", "precision"))(
        hypergeom_tail_band)
