"""All-pairs shortest paths as dense min-plus linear algebra.

The reference computes neighborhoods with N sequential NetworkX Dijkstra runs
(safepy/safe.py:406-410) — an interpreted host hot loop. Here the graph is a dense
(N, N) distance-initialized matrix (inf off-edge, 0 diagonal, edge length on-edge) and
APSP is tropical-semiring matrix algebra on the TPU VPU:

  * :func:`apsp` — public entry; dispatches to the Pallas blocked Floyd-Warshall
    kernel on TPU (see ``apsp_pallas.py``) with a pure-jnp fallback for other
    backends and as a small-size oracle.
  * :func:`min_plus_product` — one min-plus matrix product (Pallas on TPU).
  * repeated min-plus *squaring* (``D <- D (x) D``, log2(max_hops) times) and the
    3-phase *blocked Floyd-Warshall* are both available; blocked FW does a single
    O(N^3) pass and is the default on TPU.

Semantics notes (parity with the reference):
  * unreachable pairs stay ``+inf`` — thresholding a full distance matrix at radius r
    is then equivalent to the reference's Dijkstra-with-cutoff reachability test
    (``cutoff=nr`` keeps paths with length <= nr, see safe.py:406-410);
  * the diagonal is 0, so every node lands in its own neighborhood — matching the
    reference's deliberately-commented-out ``fill_diagonal(..., 0)`` (safe.py:419-420).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def pad_distances(dist, block: int):
    """Pad an (N, N) distance matrix to a multiple of ``block``.

    Padding nodes are unreachable (inf rows/cols) with 0 self-distance, which keeps
    the tropical semiring identity structure intact.
    """
    n = dist.shape[0]
    m = (-n) % block
    if m == 0:
        return dist
    np_ = n + m
    out = jnp.full((np_, np_), jnp.inf, dist.dtype)
    out = out.at[:n, :n].set(dist)
    pad_idx = jnp.arange(n, np_)
    return out.at[pad_idx, pad_idx].set(0.0)


@jax.jit
def _apsp_jax(dist):
    """Textbook Floyd-Warshall, one k per step — the oracle / non-TPU fallback."""
    n = dist.shape[0]

    def body(k, d):
        col = jax.lax.dynamic_slice(d, (0, k), (n, 1))
        row = jax.lax.dynamic_slice(d, (k, 0), (1, n))
        return jnp.minimum(d, col + row)

    return jax.lax.fori_loop(0, n, body, dist)


def min_plus_relax_jax(c, a, b):
    """min(c, a (x) b) via a k-loop — the non-Pallas fallback, O(m n) memory.

    Shared by the fallback product here and the sharded Floyd-Warshall's
    off-TPU path (parallel/apsp_sharded.py).
    """
    m, k_dim = a.shape

    def body(k, acc):
        col = jax.lax.dynamic_slice(a, (0, k), (m, 1))
        row = jax.lax.dynamic_slice(b, (k, 0), (1, b.shape[1]))
        return jnp.minimum(acc, col + row)

    return jax.lax.fori_loop(0, k_dim, body, c)


@jax.jit
def _min_plus_jax(a, b):
    init = jnp.full((a.shape[0], b.shape[1]), jnp.inf, a.dtype)
    return min_plus_relax_jax(init, a, b)


def _on_tpu(x=None) -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def min_plus_product(a, b, *, method: str = "auto", block: int = 128):
    """(a (x) b)[i, j] = min_k a[i, k] + b[k, j]."""
    if method == "auto":
        method = "pallas" if _on_tpu() else "jax"
    if method == "pallas":
        from safepy_tpu.ops import apsp_pallas
        return apsp_pallas.min_plus_pallas(a, b, block=block)
    return _min_plus_jax(jnp.asarray(a), jnp.asarray(b))


def apsp(dist, *, method: str = "auto", block: int = 128,
         max_hops: int | None = None, symmetric: bool = False):
    """All-pairs shortest path distances of a dense initialized distance matrix.

    Args:
      dist: (N, N) array — 0 diagonal, edge weight where an edge exists, inf
        elsewhere. Any float dtype; compute happens in the input dtype on the jax
        path and f32 on the Pallas path.
      method: 'auto' (Pallas blocked FW on TPU, jnp elsewhere), 'pallas_fw',
        'pallas_squaring', or 'jax'.
      block: Pallas tile size.
      max_hops: for the squaring method, an upper bound on the hop-diameter; default
        N (always safe). Squaring runs ceil(log2(max_hops)) products.
      symmetric: the caller guarantees ``dist`` is symmetric (undirected
        graph); the Pallas FW then computes only upper triangles and mirrors
        (bit-identical, ~2x less VPU work).

    Returns:
      (N, N) shortest-path distances, inf where unreachable.
    """
    dist = jnp.asarray(dist)
    n = dist.shape[0]
    if method == "auto":
        method = "pallas_fw" if _on_tpu() else "jax"

    if method == "jax":
        return _apsp_jax(dist)

    from safepy_tpu.ops import apsp_pallas

    if method == "pallas_fw":
        return apsp_pallas.apsp_blocked_fw(dist, block=block,
                                           symmetric=symmetric)
    if method == "pallas_squaring":
        hops = int(max_hops) if max_hops is not None else n
        n_sq = max(1, int(np.ceil(np.log2(max(2, hops)))))
        d = pad_distances(dist.astype(jnp.float32), block)
        for _ in range(n_sq):
            d = apsp_pallas.min_plus_pallas(d, d, block=block)
        return d[:n, :n]
    raise ValueError(f"unknown apsp method: {method!r}")
