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
