"""Hypergeometric census with attribute columns sharded over the mesh.

TPU-native replacement for the reference CLI's column-chunked multiprocessing pool
(safepy/safe.py:1335-1355): the (N, A) annotation matrix is column-sharded, every
device computes its slice of the neighborhood-count matmul locally, and there is
NO inter-device traffic until the final host gather — the neighborhood indicator
is replicated. Uneven column counts are zero-padded internally and sliced back.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

_DOT_KW = dict(precision=jax.lax.Precision.HIGHEST,
               preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("mesh", "axis"))
def _census(nbr, vals, not_nan, *, mesh, axis):
    @functools.partial(jax.shard_map, mesh=mesh,
                       in_specs=(P(), P(None, axis), P()),
                       out_specs=(P(None, axis), P()))
    def worker(nbr, vals_slice, not_nan):
        counts = jnp.dot(nbr, vals_slice, **_DOT_KW)
        nsize = jnp.dot(nbr, not_nan, **_DOT_KW)
        return counts, nsize

    return worker(nbr, vals, not_nan)


def hypergeom_counts_sharded(neighborhoods, node2attribute, *, mesh: Mesh,
                             axis: str = "attr"):
    """Sharded census for the hypergeometric test.

    Returns (counts (N, A), neighborhood_size (N,)) with counts sharded over
    `axis`.
    """
    nbr = jnp.asarray(neighborhoods, jnp.float32)
    n2a = jnp.asarray(node2attribute, jnp.float32)
    finite = jnp.isfinite(n2a)
    vals = jnp.where(finite, n2a, 0.0)
    nodes_not_nan = jnp.any(finite, axis=1).astype(jnp.float32)

    ndev = mesh.shape[axis]
    A = vals.shape[1]
    pad = (-A) % ndev
    if pad:
        vals = jnp.pad(vals, ((0, 0), (0, pad)))

    counts, nsize = _census(nbr, vals, nodes_not_nan, mesh=mesh, axis=axis)
    return counts[:, :A], nsize


@functools.partial(jax.jit, static_argnames=("mesh", "axis", "M", "iterations",
                                             "threshold"))
def _enrichment(nbr, vals, lgt, *, mesh, axis, M, iterations, threshold):
    from safepy_tpu.pipeline import _hypergeom_tail

    nes32, log_sf32, nes_binary = _hypergeom_tail(
        nbr, vals, lgt, M, threshold, iterations=iterations,
        mesh=mesh, attr_axis=axis)
    # per-attribute enriched counts reduced on device (the only download the
    # count-consuming workflows need)
    counts = jnp.sum(nes_binary, axis=0, dtype=jnp.int32)
    return nes32, log_sf32, nes_binary, counts


def hypergeom_enrichment_sharded(neighborhoods, node2attribute, *, mesh: Mesh,
                                 axis: str = "attr",
                                 enrichment_threshold: float = 0.05,
                                 iterations: int | None = None,
                                 node2attribute_device=None):
    """Full sharded hypergeometric enrichment for the staged facade path.

    Columns of ``node2attribute`` shard over `axis`; every device runs its own
    census matmuls AND survival-function tail (ops/hypergeom._sf_parts) with no
    inter-device traffic — the GO-scale flagship batch case on as many chips as
    the mesh provides (reference analog: the column-chunked CLI pool,
    safepy/safe.py:1335-1355).

    Returns ``(nes_f32, log_sf_f32, nes_binary_int8, enriched_counts_int32)``;
    the matrices are (N, A) sharded over `axis`, the counts are (A,); p-values
    materialize host-side as ``exp(float64(log_sf))``.
    """
    import numpy as np

    from safepy_tpu.ops.hypergeom import lgamma_table, tail_iterations

    # `node2attribute` must be the HOST array (the scalar prep below would
    # otherwise download a device copy); pass an f32 device copy separately
    # via `node2attribute_device` to skip the re-upload on repeat calls.
    n2a = np.asarray(node2attribute, dtype=np.float64)
    M = int(np.any(~np.isnan(n2a), axis=1).sum())
    if iterations is None:
        totals = np.nansum(n2a, axis=0)
        k_max = int(max(1, np.nanmax(totals))) if totals.size else 1
        iterations = tail_iterations(M, min(k_max, max(M, 1)))
    lgt = jnp.asarray(lgamma_table(max(M, 1)))
    nbr = jnp.asarray(neighborhoods, jnp.float32)
    vals_dev = (node2attribute_device if node2attribute_device is not None
                else jnp.asarray(n2a, jnp.float32))
    return _enrichment(nbr, vals_dev, lgt, mesh=mesh, axis=axis,
                       M=M, iterations=int(iterations),
                       threshold=float(enrichment_threshold))
