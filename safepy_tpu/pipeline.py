"""Fused single-dispatch pipelines: graph in, enrichment out, one jit call.

The stage-based facade issues one device dispatch per pipeline stage, which is
fine on a local TPU host but dominated by round-trip latency on tunneled/remote
hosts (~0.3-0.4 s per call measured on the dev tunnel). These fused programs run
APSP -> threshold -> scores -> null in ONE compiled computation, returning the
device-resident matrices plus the scalar stats:

  * :func:`fused_permutation_pipeline` — shortest-path neighborhoods + two-sided
    permutation null (the Example_1 / default workflow);
  * :func:`fused_hypergeom_pipeline` — shortest-path neighborhoods + the census
    matmuls and survival-function tail parts for binary annotation matrices.

``SAFE.run_pipeline`` drives these and then populates the same instance
attributes the stage methods produce.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from safepy_tpu.ops.apsp import _apsp_jax, _on_tpu
from safepy_tpu.ops.hypergeom import _sf_parts  # device tail-sum core
from safepy_tpu.ops.neighborhoods import threshold_and_stats
from safepy_tpu.ops.permutation import prepare_valid, scan_counts
from safepy_tpu.ops.score import compute_neighborhood_score

_DOT_KW = dict(precision=jax.lax.Precision.HIGHEST,
               preferred_element_type=jnp.float32)


def _apsp_inline(d0, block):
    if _on_tpu():
        from safepy_tpu.ops.apsp_pallas import apsp_blocked_fw
        return apsp_blocked_fw(d0, block=block)
    return _apsp_jax(d0)


@functools.partial(jax.jit, static_argnames=(
    "score_type", "num_permutations", "batch_size", "strict", "block",
    "precision"))
def fused_permutation_pipeline(d0, vals, valid_rows, key, radius, *,
                               score_type: str = "sum",
                               num_permutations: int = 1000,
                               batch_size: int = 1000,
                               strict: bool = False, block: int = 128,
                               precision: str = "highest"):
    """APSP + neighborhoods + observed scores + permutation counts, one dispatch.

    Returns (dist, nbr, obs, counts_neg, counts_pos, mean_size, std_size); the
    matrices stay on device.
    """
    dist = _apsp_inline(d0, block)
    nbr, mean, std = threshold_and_stats(dist, radius, strict=strict)
    obs = compute_neighborhood_score(nbr, vals, score_type, precision)
    nbr_valid, v, m = prepare_valid(nbr, vals, valid_rows)
    counts_neg, counts_pos = scan_counts(
        nbr_valid, v, m, obs, key, score_type=score_type,
        num_permutations=num_permutations, batch_size=batch_size,
        precision=precision)
    return dist, nbr, obs, counts_neg, counts_pos, mean, std


@functools.partial(jax.jit, static_argnames=("iterations", "strict", "block"))
def fused_hypergeom_pipeline(d0, vals, lgt, M, radius, enrichment_threshold, *,
                             iterations: int, strict: bool = False,
                             block: int = 128):
    """APSP + neighborhoods + hypergeometric enrichment, one dispatch.

    vals: (N, A) with NaNs. Returns (dist, nbr, nes_f32, log_sf_f32,
    nes_binary_int8, mean_size, std_size). p-values come from host-side
    ``exp(float64(log_sf))`` — see ops/hypergeom.finalize_logsf_device for the
    precision recipe; the N x N matrices stay on device and the downloads are
    two f32 (N, A) matrices plus an int8 indicator.
    """
    from safepy_tpu.ops.hypergeom import finalize_logsf_device

    dist = _apsp_inline(d0, block)
    nbr, mean, std = threshold_and_stats(dist, radius, strict=strict)

    finite = jnp.isfinite(vals)
    nan0 = jnp.where(finite, vals, 0.0).astype(jnp.float32)
    nodes_not_nan = jnp.any(finite, axis=1)
    nsize = jnp.dot(nbr, nodes_not_nan.astype(jnp.float32), **_DOT_KW)
    counts = jnp.dot(nbr, nan0, **_DOT_KW)
    K = jnp.sum(nan0, axis=0)

    k64 = counts.astype(jnp.float64)
    K64 = jnp.broadcast_to(K.astype(jnp.float64)[None, :], counts.shape)
    n64 = jnp.broadcast_to(nsize.astype(jnp.float64)[:, None], counts.shape)
    parts = _sf_parts(k64, M, K64, n64, lgt, iterations)
    nes32, log_sf32, nes_binary = finalize_logsf_device(parts,
                                                        enrichment_threshold)
    return dist, nbr, nes32, log_sf32, nes_binary, mean, std
