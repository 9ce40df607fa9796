"""Radius-bounded banded Floyd-Warshall: the fast path for neighborhood APSP.

The SAFE pipeline never needs distances beyond the neighborhood radius ``nr`` —
the reference's Dijkstra runs with ``cutoff=nr`` (safepy/safe.py:406) and keeps
only within-cutoff distances. When edge lengths are the Euclidean distances of
their endpoints (the `shortpath_weighted_layout` contract with unit weights,
safe_io.py:318-331), the triangle inequality gives a certificate:

    graph_distance(u, v) <= nr  =>  ||u - v|| <= nr,

and every intermediate node w on a <= nr path satisfies ||u - w|| <= nr AND
||w - v|| <= nr (each is bounded by the partial path length). Sort the nodes by
a spatial order, let B be the maximum index separation over all Euclidean
nr-pairs, and ALL triples (u, w, v) relevant to <= nr paths lie within B of each
other. Blocked Floyd-Warshall then only needs to relax, per pivot block, the
(2B + block)-wide window around the pivot — an O(N * W^2) sweep instead of
O(N^3), a (N/W)^2 work reduction with identical <= nr results:

  * in-band entries of the result are EXACT for every pair whose true distance
    is <= nr (the full relaxation set of such pairs is inside the windows);
  * every entry is always an upper bound on the true distance (min over genuine
    path lengths), so thresholding at the radius is exact everywhere — pairs
    beyond nr can never leak in.

The band is measured, not assumed: :func:`banded_order` evaluates Hilbert-,
x- and y-orderings with a KD-tree over the actual nr-pairs and returns the best
certified half-width. Callers fall back to the full kernel when the band does
not pay (W ~ N) or the geometric contract does not hold (non-unit edge weights,
hop-count metric).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from safepy_tpu.ops import apsp_pallas
from safepy_tpu.ops.apsp import min_plus_relax_jax as _relax_jnp, _on_tpu


def hilbert_order(coords: np.ndarray, bits: int = 16) -> np.ndarray:
    """Permutation sorting 2-D points along a Hilbert curve (iterative d2xy)."""
    xy = np.asarray(coords, dtype=np.float64)
    lo = xy.min(axis=0)
    span = np.maximum(xy.max(axis=0) - lo, 1e-12)
    side = (1 << bits) - 1
    x = np.minimum((xy[:, 0] - lo[0]) / span[0] * side, side).astype(np.uint64)
    y = np.minimum((xy[:, 1] - lo[1]) / span[1] * side, side).astype(np.uint64)

    rx = np.zeros_like(x)
    ry = np.zeros_like(y)
    d = np.zeros_like(x)
    s = np.uint64(1) << np.uint64(bits - 1)
    while s > 0:
        rx = ((x & s) > 0).astype(np.uint64)
        ry = ((y & s) > 0).astype(np.uint64)
        d += s * s * ((np.uint64(3) * rx) ^ ry)
        # rotate quadrant
        swap = ry == 0
        flip = swap & (rx == 1)
        x_f, y_f = x.copy(), y.copy()
        x[flip] = s - np.uint64(1) - x_f[flip]
        y[flip] = s - np.uint64(1) - y_f[flip]
        x_s = x.copy()
        x[swap] = y[swap]
        y[swap] = x_s[swap]
        s >>= np.uint64(1)
    return np.argsort(d, kind="stable")


def radius_pairs(coords: np.ndarray, radius: float) -> np.ndarray:
    """All index pairs within Euclidean `radius` (the certificate's witnesses)."""
    from scipy.spatial import cKDTree

    return cKDTree(coords).query_pairs(float(radius), output_type="ndarray")


def band_halfwidth(coords: np.ndarray, order: np.ndarray, radius: float,
                   pairs: np.ndarray | None = None) -> int:
    """Certified band: max index separation over all Euclidean radius-pairs."""
    if pairs is None:
        pairs = radius_pairs(coords, radius)
    if len(pairs) == 0:
        return 1
    rank = np.empty(len(order), dtype=np.int64)
    rank[order] = np.arange(len(order))
    return int(np.abs(rank[pairs[:, 0]] - rank[pairs[:, 1]]).max())


def window_halfwidth(values: np.ndarray, radius: float) -> int:
    """O(n log n) certified half-width for the sort-by-``values`` order: the
    max number of OTHER nodes in any closed window of width ``radius``.
    Valid because |v_u - v_v| <= ||u - v|| <= r for every radius pair (each
    coordinate difference is bounded by the Euclidean distance), so every
    pair's rank separation is at most the worst window occupancy — no pair
    enumeration needed. On uniform geometries the bound equals the measured
    width to within sampling noise (2148 measured vs 2156 bound at 99,840
    nodes); only strongly anisotropic layouts pay, and the exact path below
    covers those."""
    s = np.sort(np.asarray(values, dtype=np.float64), kind="stable")
    if len(s) == 0:
        return 1
    hi = np.searchsorted(s, s + radius, side="right")
    return max(1, int((hi - np.arange(len(s))).max()) - 1)


def banded_order(coords: np.ndarray, radius: float,
                 exact_below: int = 50_000):
    """Best (order, half-width B) among Hilbert / x-sort / y-sort orderings.

    Above ``exact_below`` nodes the x/y sorts are certified by the
    :func:`window_halfwidth` bound (O(n log n)); the KD-tree radius-pair
    enumeration + per-candidate measurement (~6 s at 100k, ~17 s at 300k on
    this host) only runs when the cheap bound is inconclusive (> n/8 — e.g.
    diagonally-striped layouts, where the Hilbert candidate can win). At or
    below ``exact_below`` the band is always MEASURED over the actual
    radius-pairs, shared across candidates; any ordering is correct — only
    the width differs. Graph bandwidth minimizers (Reverse Cuthill-McKee on
    the radius-pair graph) were measured and tie the spatial sorts exactly:
    for geometric neighborhoods the band floor is the separator size
    (~N * radius / extent), which the spatial orders already achieve. The
    Hilbert candidate only matters for pathological layouts — measured
    half-widths 83,243 (hilbert) vs 2,148 (x-sort) at 99,840 uniform nodes."""
    n = len(coords)
    if n > exact_below:
        bx = window_halfwidth(coords[:, 0], radius)
        by = window_halfwidth(coords[:, 1], radius)
        if min(bx, by) <= n // 8:
            axis = 0 if bx <= by else 1
            return (np.argsort(coords[:, axis], kind="stable"), min(bx, by))
    pairs = radius_pairs(coords, radius)
    candidates = [hilbert_order(coords),
                  np.argsort(coords[:, 0], kind="stable"),
                  np.argsort(coords[:, 1], kind="stable")]
    best = None
    for order in candidates:
        width = band_halfwidth(coords, order, radius, pairs)
        if best is None or width < best[1]:
            best = (order, width)
    return best


def graph_banded_order(n: int, edges: np.ndarray, weights: np.ndarray,
                       radius: float):
    """(order, half-width B) certified WITHOUT coordinates — any metric.

    The Euclidean certificate (module docstring) needs edge lengths to be the
    endpoint distances; hop-count networks ('shortpath', reference
    safe.py:408-410) and arbitrary user lengths have no such geometry. The
    landmark triangle inequality supplies a graph-native certificate instead:
    with ``ds`` the shortest-path distance from any fixed source,

        d(u, v) <= r  =>  |ds(u) - ds(v)| <= d(u, v) <= r,

    so ordering nodes by (component, ds) bounds the rank separation of EVERY
    within-radius pair — and of every intermediate node w of a <= r path,
    since d(u, w) <= r as well — by the maximum number of nodes in any
    closed ds-window of width r (an exact sorted two-pointer count, no APSP
    required). The source is chosen peripheral per component by a double
    sweep, which flattens the level sets and tightens the window.

    Returns (order, band); callers compare ``band_nbytes`` against dense
    storage exactly as with the geometric certificate.
    """
    from scipy.sparse import coo_matrix
    from scipy.sparse.csgraph import connected_components, dijkstra

    edges = np.asarray(edges)
    if len(edges) == 0:
        return np.arange(n), max(1, n - 1)
    w = np.asarray(weights, np.float64)
    u2 = np.concatenate([edges[:, 0], edges[:, 1]])
    v2 = np.concatenate([edges[:, 1], edges[:, 0]])
    g = coo_matrix((np.concatenate([w, w]), (u2, v2)), shape=(n, n)).tocsr()

    ncomp, labels = connected_components(g, directed=False)
    # one seed per component -> distances to nearest seed; the per-component
    # argmax of that sweep is a peripheral node (double-sweep heuristic)
    seeds = np.unique(labels, return_index=True)[1]
    d0 = dijkstra(g, indices=seeds, min_only=True)
    d0 = np.where(np.isfinite(d0), d0, 0.0)
    by_comp = np.lexsort((d0, labels))
    far = by_comp[np.searchsorted(labels[by_comp], np.arange(ncomp),
                                  side="right") - 1]
    ds = dijkstra(g, indices=far, min_only=True)
    ds = np.where(np.isfinite(ds), ds, 0.0)

    order = np.lexsort((ds, labels))
    # max nodes in any closed per-component ds-window of width `radius`: shift
    # each component's ds range into a disjoint block so one two-pointer
    # searchsorted covers them all
    span = float(ds.max()) + float(radius) + 1.0
    keys = labels[order] * (2.0 * span) + ds[order]
    band = window_halfwidth(keys, float(radius))
    return order, band


def window_width(n: int, band: int, block: int = 128) -> int:
    """Static window span covering [pivot - B, pivot + block + B), padded to a
    block multiple and capped at the (padded) matrix size."""
    npad = -(-n // block) * block
    w = -(-(2 * band + block) // block) * block
    return min(w, npad)


@functools.partial(jax.jit, static_argnames=("block", "window", "use_pallas",
                                             "symmetric"))
def apsp_banded_fw(dist, *, window: int, block: int = 128,
                   use_pallas: bool | None = None, symmetric: bool = True):
    """Blocked FW restricted to a `window`-wide band around each pivot block.

    `dist` must already be permuted into the banded order and padded to a block
    multiple (diagonal 0, inf elsewhere). Returns the same frame; entries are
    exact for all pairs with true distance inside the certified radius and
    upper bounds everywhere else. ``symmetric`` (Pallas path, default)
    computes only each window's upper triangle and mirrors the lower —
    bit-identical for the symmetric matrices undirected graphs produce
    (apsp_pallas._relax_full_banded_sym: both pivot panels are the raw panel
    relaxed once against the bitwise-symmetric closed diagonal, so q == p.T
    exactly), ~1.9x less VPU min-plus work.
    """
    if use_pallas is None:
        use_pallas = _on_tpu()

    npad = dist.shape[0]
    nb = npad // block
    w = window
    half = (w - block) // 2
    # Corner tiles of the window with |i - j| beyond the band are never
    # consumed: an entry is only ever read back as part of a pivot row/column
    # panel, which bounds |i - j| <= half + 2*block; everything further out is
    # also beyond the radius in the final output (masked to inf). Skipping
    # them drops ~25% of the window relaxation work.
    band_tiles = half // block + 3

    if use_pallas:
        relax_rows = functools.partial(apsp_pallas._relax_rows, block=block)
        relax_cols = functools.partial(apsp_pallas._relax_cols, block=block)
        relax_full = functools.partial(
            apsp_pallas._relax_full_banded_sym if symmetric
            else apsp_pallas._relax_full_banded,
            block=block, band_tiles=band_tiles)
    else:
        relax_rows = lambda diag, panel: _relax_jnp(panel, diag, panel)
        relax_cols = lambda panel, diag: _relax_jnp(panel, panel, diag)

        def relax_full(q, p, d):
            # mirror the pallas tile-skip so CPU tests validate its semantics
            relaxed = _relax_jnp(d, q, p)
            nb_side = d.shape[0] // block
            tile_idx = jnp.arange(nb_side)
            keep = (jnp.abs(tile_idx[:, None] - tile_idx[None, :])
                    <= band_tiles)
            keep = jnp.repeat(jnp.repeat(keep, block, axis=0), block, axis=1)
            return jnp.where(keep, relaxed, d)

    def round_body(kb, d):
        start = kb * block
        lo = jnp.clip(start - half, 0, npad - w)

        p_win = jax.lax.dynamic_slice(d, (start, lo), (block, w))
        diag = jax.lax.dynamic_slice(d, (start, start), (block, block))
        diag = apsp_pallas._close_diag(diag, block)
        p_win = relax_rows(diag, p_win)

        q_win = jax.lax.dynamic_slice(d, (lo, start), (w, block))
        q_win = relax_cols(q_win, diag)

        win = jax.lax.dynamic_slice(d, (lo, lo), (w, w))
        win = relax_full(q_win, p_win, win)
        return jax.lax.dynamic_update_slice(d, win, (lo, lo))

    return jax.lax.fori_loop(0, nb, round_body, dist)


@functools.partial(jax.jit, static_argnames=("window", "block"))
def apsp_banded_unpermuted(d0_permuted, inv_rank, radius, *, window: int,
                           block: int = 128):
    """Banded FW -> original node frame -> radius mask, one jittable unit.

    ``d0_permuted`` is either the dense (N, N) initialization in banded order,
    or the tuple ``(u, v, w)`` of permuted edge arrays — the dense matrix is
    then materialized INSIDE the program, so no persistent N x N copy lives in
    HBM between runs (the edge arrays are O(E)) and the caller never pays the
    host-side build. Entries beyond `radius` are masked to inf: beyond the
    certified band they are upper bounds rather than exact distances, and the
    reference's Dijkstra cutoff never produces beyond-radius distances either
    (safepy/safe.py:406).
    """
    from safepy_tpu.ops.apsp import pad_distances as _pad

    if isinstance(d0_permuted, tuple):
        from safepy_tpu.ops.neighborhoods import _initial_distances_jit

        u, v, w = d0_permuted
        d0_permuted = _initial_distances_jit(u, v, w,
                                             num_nodes=inv_rank.shape[0])
    d = _pad(jnp.asarray(d0_permuted, jnp.float32), block)
    out = apsp_banded_fw(d, window=window, block=block)
    n = inv_rank.shape[0]
    out = out[:n, :n]
    # Un-permute with TWO row gathers around a transpose: a direct column
    # gather ([:, inv]) is a lane-axis gather — measured ~67 s on an (20k)^2
    # f32 on v5e, vs ~10 ms for row-gather+transpose (DMA-friendly).
    out = jnp.take(out, inv_rank, axis=0)
    out = jnp.take(out.T, inv_rank, axis=0).T
    return jnp.where(out <= jnp.asarray(radius, out.dtype), out, jnp.inf)
