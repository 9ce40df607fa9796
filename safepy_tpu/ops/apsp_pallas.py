"""Pallas TPU kernels for tropical (min-plus) matrix algebra.

Two kernels drive :func:`safepy_tpu.ops.apsp.apsp`:

  * :func:`min_plus_pallas` — a tiled min-plus matrix product with the standard
    (i, j, k) matmul grid; the out tile stays VMEM-resident across the k steps while
    Pallas double-buffers the a/b tile streams from HBM.
  * :func:`apsp_blocked_fw` — panel-based blocked Floyd-Warshall: per pivot round kb,
    (1) transitively close the (T, T) diagonal tile, (2) relax the pivot row panel
    P = D[kb] and column panel Q = D[:, kb] against the closed diagonal (one min-plus
    relaxation each — valid because the diagonal is closed), (3) relax the FULL
    matrix against Q (x) P. Relaxation is idempotent in the tropical semiring, so
    phase 3 revisits the pivot panels harmlessly — no tile ordering, no aliasing, no
    scalar prefetch; the pivot panels are materialized per round with dynamic slices
    (2*T*N floats — noise next to the O(N^2) phase-3 traffic).

    One O(N^3) VPU pass total, ~log2(N) times less work than repeated squaring.

The inner min-plus tile product is a statically-unrolled VPU loop:
``acc = min(acc, a[:, k:k+1] + b[k:k+1, :])`` — a lane broadcast plus a sublane
broadcast per step, with all slices static so Mosaic lowers them to fixed shuffles.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_INF = float("inf")


def _tile_minplus(acc, a, b, block: int):
    """acc = min(acc, a (x) b) for (block, block) f32 tiles, fully unrolled."""
    for k in range(block):
        acc = jnp.minimum(acc, a[:, k:k + 1] + b[k:k + 1, :])
    return acc


# ---------------------------------------------------------------------------
# Min-plus matrix product
# ---------------------------------------------------------------------------

def _minplus_kernel(a_ref, b_ref, o_ref, *, block: int):
    @pl.when(pl.program_id(2) == 0)
    def _():
        o_ref[:] = jnp.full((block, block), _INF, jnp.float32)

    o_ref[:] = _tile_minplus(o_ref[:], a_ref[:], b_ref[:], block)


def _pad_to(x, rows: int, cols: int):
    r, c = x.shape
    if r == rows and c == cols:
        return x
    return jnp.pad(x, ((0, rows - r), (0, cols - c)), constant_values=_INF)


@functools.partial(jax.jit, static_argnames=("block",))
def min_plus_pallas(a, b, *, block: int = 128):
    """(a (x) b)[i, j] = min_k a[i, k] + b[k, j] on the TPU VPU."""
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    m, kd = a.shape
    k2, n = b.shape
    assert kd == k2, (a.shape, b.shape)
    mp, kp, np_ = (-(-d // block) * block for d in (m, kd, n))
    ap = _pad_to(a, mp, kp)
    bp = _pad_to(b, kp, np_)

    out = pl.pallas_call(
        functools.partial(_minplus_kernel, block=block),
        grid=(mp // block, np_ // block, kp // block),
        in_specs=[
            pl.BlockSpec((block, block), lambda i, j, k: (i, k)),
            pl.BlockSpec((block, block), lambda i, j, k: (k, j)),
        ],
        out_specs=pl.BlockSpec((block, block), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((mp, np_), jnp.float32),
    )(ap, bp)
    return out[:m, :n]


# ---------------------------------------------------------------------------
# Blocked Floyd-Warshall
# ---------------------------------------------------------------------------

def _relax_kernel(a_ref, b_ref, c_ref, o_ref, *, block: int):
    """o = min(c, a (x) b) for one (block, block) tile."""
    o_ref[:] = _tile_minplus(c_ref[:], a_ref[:], b_ref[:], block)


def _relax_rows(diag, panel, *, block: int):
    """min(P, diag (x) P) for a (block, N) row panel."""
    nb = panel.shape[1] // block
    return pl.pallas_call(
        functools.partial(_relax_kernel, block=block),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((block, block), lambda j: (j * 0, j * 0)),
            pl.BlockSpec((block, block), lambda j: (j * 0, j)),
            pl.BlockSpec((block, block), lambda j: (j * 0, j)),
        ],
        out_specs=pl.BlockSpec((block, block), lambda j: (j * 0, j)),
        out_shape=jax.ShapeDtypeStruct(panel.shape, jnp.float32),
    )(diag, panel, panel)


def _relax_panel(q, p, c, *, block: int):
    """min(C, Q (x) P) for a (block, W) panel with independent C — the
    band-sharded row relax (q: (block, block), p/c: (block, W))."""
    nb = c.shape[1] // block
    return pl.pallas_call(
        functools.partial(_relax_kernel, block=block),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((block, block), lambda j: (j * 0, j * 0)),
            pl.BlockSpec((block, block), lambda j: (j * 0, j)),
            pl.BlockSpec((block, block), lambda j: (j * 0, j)),
        ],
        out_specs=pl.BlockSpec((block, block), lambda j: (j * 0, j)),
        out_shape=jax.ShapeDtypeStruct(c.shape, jnp.float32),
    )(q, p, c)


def _relax_cols(panel, diag, *, block: int):
    """min(Q, Q (x) diag) for an (N, block) column panel."""
    nb = panel.shape[0] // block
    return pl.pallas_call(
        functools.partial(_relax_kernel, block=block),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((block, block), lambda i: (i, i * 0)),
            pl.BlockSpec((block, block), lambda i: (i * 0, i * 0)),
            pl.BlockSpec((block, block), lambda i: (i, i * 0)),
        ],
        out_specs=pl.BlockSpec((block, block), lambda i: (i, i * 0)),
        out_shape=jax.ShapeDtypeStruct(panel.shape, jnp.float32),
    )(panel, diag, panel)


def _relax_full(q, p, d, *, block: int):
    """min(D, Q (x) P) over a (possibly rectangular) matrix."""
    nb_i = d.shape[0] // block
    nb_j = d.shape[1] // block
    return pl.pallas_call(
        functools.partial(_relax_kernel, block=block),
        grid=(nb_i, nb_j),
        in_specs=[
            pl.BlockSpec((block, block), lambda i, j: (i, j * 0)),
            pl.BlockSpec((block, block), lambda i, j: (i * 0, j)),
            pl.BlockSpec((block, block), lambda i, j: (i, j)),
        ],
        out_specs=pl.BlockSpec((block, block), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct(d.shape, jnp.float32),
    )(q, p, d)


def _relax_full_banded(q, p, d, *, block: int, band_tiles: int):
    """min(D, Q (x) P) restricted to tiles within `band_tiles` of the diagonal;
    tiles beyond pass through unchanged (the banded-FW window's corner tiles
    are never consumed — see ops/apsp_banded.py)."""
    def kernel(a_ref, b_ref, c_ref, o_ref):
        i = pl.program_id(0)
        j = pl.program_id(1)
        offset = i - j
        in_band = (offset <= band_tiles) & (offset >= -band_tiles)

        @pl.when(in_band)
        def _():
            o_ref[:] = _tile_minplus(c_ref[:], a_ref[:], b_ref[:], block)

        @pl.when(jnp.logical_not(in_band))
        def _():
            o_ref[:] = c_ref[:]

    nb_i = d.shape[0] // block
    nb_j = d.shape[1] // block
    return pl.pallas_call(
        kernel, grid=(nb_i, nb_j),
        in_specs=[
            pl.BlockSpec((block, block), lambda i, j: (i, j * 0)),
            pl.BlockSpec((block, block), lambda i, j: (i * 0, j)),
            pl.BlockSpec((block, block), lambda i, j: (i, j)),
        ],
        out_specs=pl.BlockSpec((block, block), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct(d.shape, jnp.float32),
    )(q, p, d)


def _relax_full_banded_sym(q, p, d, *, block: int, band_tiles: int):
    """Symmetric :func:`_relax_full_banded`: compute the upper triangle,
    mirror the lower.

    For the symmetric matrices undirected graphs produce, the pivot panels
    satisfy ``q == p.T`` bitwise (both are the raw panel relaxed once against
    the bitwise-symmetric closed diagonal), so the lower-tile update
    ``min(C[j,i], q[j] (x) p[i])`` is exactly the transpose of the upper
    update — same f32 sums, same min multiset. Pass A relaxes tiles j >= i
    (in-band) and passes the rest through (a tile copy costs ~6% of a
    min-plus tile); pass B overwrites in-band lower tiles with the transpose
    of their upper mirror. Bit-identical to :func:`_relax_full_banded`,
    ~1.9x less VPU work.
    """
    def kernel_a(a_ref, b_ref, c_ref, o_ref):
        i = pl.program_id(0)
        j = pl.program_id(1)
        compute = (j >= i) & (j - i <= band_tiles)

        @pl.when(compute)
        def _():
            o_ref[:] = _tile_minplus(c_ref[:], a_ref[:], b_ref[:], block)

        @pl.when(jnp.logical_not(compute))
        def _():
            o_ref[:] = c_ref[:]

    assert d.shape[0] == d.shape[1], "mirror needs a square window"
    nb_i = d.shape[0] // block
    nb_j = d.shape[1] // block
    upper = pl.pallas_call(
        kernel_a, grid=(nb_i, nb_j),
        in_specs=[
            pl.BlockSpec((block, block), lambda i, j: (i, j * 0)),
            pl.BlockSpec((block, block), lambda i, j: (i * 0, j)),
            pl.BlockSpec((block, block), lambda i, j: (i, j)),
        ],
        out_specs=pl.BlockSpec((block, block), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct(d.shape, jnp.float32),
    )(q, p, d)

    def kernel_b(u_mirror_ref, u_pass_ref, o_ref):
        i = pl.program_id(0)
        j = pl.program_id(1)
        mirror = (i > j) & (i - j <= band_tiles)

        @pl.when(mirror)
        def _():
            o_ref[:] = u_mirror_ref[:].T

        @pl.when(jnp.logical_not(mirror))
        def _():
            o_ref[:] = u_pass_ref[:]

    return pl.pallas_call(
        kernel_b, grid=(nb_i, nb_j),
        in_specs=[
            pl.BlockSpec((block, block), lambda i, j: (j, i)),
            pl.BlockSpec((block, block), lambda i, j: (i, j)),
        ],
        out_specs=pl.BlockSpec((block, block), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct(d.shape, jnp.float32),
    )(upper, upper)


def _close_diag(tile, block: int):
    """In-tile Floyd-Warshall closure of a (block, block) tile (pure jnp)."""

    def body(k, t):
        col = jax.lax.dynamic_slice(t, (0, k), (block, 1))
        row = jax.lax.dynamic_slice(t, (k, 0), (1, block))
        return jnp.minimum(t, col + row)

    return jax.lax.fori_loop(0, block, body, tile)


@functools.partial(jax.jit, static_argnames=("block", "symmetric"))
def apsp_blocked_fw(dist, *, block: int = 128, symmetric: bool = False):
    """All-pairs shortest paths via panel-blocked Floyd-Warshall on TPU.

    ``symmetric=True`` (callers must guarantee a symmetric ``dist`` —
    undirected graphs) computes only each round's upper triangle and mirrors
    the lower (:func:`_relax_full_banded_sym` with the band covering the
    whole matrix) — bit-identical to the classic kernel, ~2x less VPU work.
    """
    from safepy_tpu.ops.apsp import pad_distances

    dist = jnp.asarray(dist, jnp.float32)
    n = dist.shape[0]
    d = pad_distances(dist, block)
    npad = d.shape[0]
    nb = npad // block
    relax_full = (functools.partial(_relax_full_banded_sym, band_tiles=nb)
                  if symmetric else _relax_full)

    def round_body(kb, d):
        start = kb * block
        p = jax.lax.dynamic_slice(d, (start, 0), (block, npad))
        diag = jax.lax.dynamic_slice(p, (0, start), (block, block))
        diag = _close_diag(diag, block)
        p = _relax_rows(diag, p, block=block)
        q = jax.lax.dynamic_slice(d, (0, start), (npad, block))
        q = _relax_cols(q, diag, block=block)
        return relax_full(q, p, d, block=block)

    d = jax.lax.fori_loop(0, nb, round_body, d)
    return d[:n, :n]
