"""Permutation null sharded over the device mesh.

TPU-native replacement for the reference's multiprocessing pool
(safepy/safe.py:501-519): the permutation batch is split evenly over the mesh axis
(rounded up, exactly like the reference rounds to a multiple of the worker count,
safe.py:503-504), every device runs an independent keyed slice of the null, and the
two-sided count stacks are psum-reduced over ICI instead of pickled back to the
host.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from safepy_tpu.ops.permutation import default_batch_size, prepare_valid, scan_counts


def run_permutations_sharded(neighborhoods, node2attribute, valid_rows, obs, key,
                             *, mesh: Mesh, axis: str = "perm",
                             score_type: str = "sum",
                             num_permutations: int = 1000,
                             batch_size: int | None = None):
    """Sharded two-sided permutation counts.

    Returns ``(counts_neg, counts_pos, total_permutations)`` — the total is
    ``num_permutations`` rounded up to a multiple of the mesh axis size; divide the
    counts by it.
    """
    ndev = mesh.shape[axis]
    per_dev = -(-num_permutations // ndev)
    total = per_dev * ndev

    obs = jnp.asarray(obs, jnp.float32)
    nbr_valid, vals, mask = prepare_valid(neighborhoods, node2attribute, valid_rows)
    V, A = vals.shape
    if batch_size is None:
        batch_size = default_batch_size(V, A, per_dev)

    keys = jax.random.split(key, ndev)  # (ndev, key)

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(axis)),
        out_specs=(P(), P()),
    )
    def worker(nbr_valid, vals, mask, obs, key_slice):
        cn, cp = scan_counts(nbr_valid, vals, mask, obs, key_slice[0],
                             score_type=score_type, num_permutations=per_dev,
                             batch_size=batch_size)
        return jax.lax.psum(cn, axis), jax.lax.psum(cp, axis)

    counts_neg, counts_pos = jax.jit(worker)(nbr_valid, vals, mask, obs, keys)
    return counts_neg, counts_pos, total
