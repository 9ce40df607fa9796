"""Neighborhood indicator matrices for the three node-distance metrics.

Reference semantics (safepy/safe.py:369-430):

  * ``euclidean`` — pairwise layout distances, neighborhood = ``dist < r`` (strict),
    with r = ``neighborhood_radius * (max(x) - min(x))``.
  * ``shortpath_weighted_layout`` (default) — Dijkstra over edge attribute 'length'
    with ``cutoff = r`` (same relative radius): neighborhood = ``dist <= r``
    (NetworkX cutoff keeps paths with length <= cutoff).
  * ``shortpath`` — unweighted hop distance with absolute cutoff
    ``r = neighborhood_radius``: neighborhood = ``hops <= r``.

The diagonal stays 1 (a node is in its own neighborhood): self-distance is 0 under
every metric, matching the reference's commented-out ``fill_diagonal`` (safe.py:419).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def euclidean_distance_matrix(coords):
    """Dense pairwise Euclidean distances of an (N, 2) coordinate array."""
    coords = jnp.asarray(coords)
    sq = jnp.sum(coords * coords, axis=1)
    d2 = sq[:, None] + sq[None, :] - 2.0 * coords @ coords.T
    d2 = jnp.maximum(d2, 0.0)
    d = jnp.sqrt(d2)
    # exact zero diagonal despite float cancellation
    n = coords.shape[0]
    return d * (1.0 - jnp.eye(n, dtype=d.dtype))


def neighborhoods_from_distances(dist, radius, *, strict: bool):
    """Indicator matrix: dist < r (euclidean) or dist <= r (shortest-path)."""
    dist = jnp.asarray(dist)
    r = jnp.asarray(radius, dist.dtype)
    ind = (dist < r) if strict else (dist <= r)
    return ind.astype(jnp.float32)


def inclusive_radius(nr: float) -> np.float32:
    """The f32 threshold for `dist <= nr` on f32 FW distances: one relative ulp
    of slack so f64-exact boundary paths (NetworkX keeps length <= cutoff,
    reference safe.py:406) don't fall out to f32 rounding."""
    return np.float32(nr) * np.float32(1 + 1e-6)


@functools.partial(jax.jit, static_argnames=("strict",))
def threshold_and_stats(dist, radius, *, strict: bool):
    """(indicator f32, mean size, std size) — the single source of truth for the
    neighborhood threshold, shared by the staged facade and the fused pipeline.
    The two scalars feed the reference's mean +/- std log line (safe.py:428)
    without downloading the N x N matrix."""
    nbr = neighborhoods_from_distances(dist, radius, strict=strict)
    sizes = jnp.sum(nbr, axis=1)
    return nbr, jnp.mean(sizes), jnp.std(sizes)


def dense_initial_distances(num_nodes: int, edges, weights=None, dtype=np.float32) -> np.ndarray:
    """Host-side dense (N, N) FW initialization from an undirected edge list.

    inf off-edge, 0 diagonal, weight (or 1.0) on edges; symmetric. Parallel edges
    keep the minimum weight.
    """
    d = np.empty((num_nodes, num_nodes), dtype=dtype)
    d.fill(np.inf)  # ~10x faster than np.full at this size
    np.fill_diagonal(d, 0.0)
    edges = np.asarray(edges)
    if edges.size:
        u, v = edges[:, 0].astype(np.int64), edges[:, 1].astype(np.int64)
        w = (np.ones(len(u), dtype=dtype) if weights is None
             else np.asarray(weights, dtype=dtype))
        # min-reduce duplicates
        np.minimum.at(d, (u, v), w)
        np.minimum.at(d, (v, u), w)
    return d
