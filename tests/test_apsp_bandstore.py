"""Band-STORAGE FW (O(N*W) memory): exactness within the radius, banded ops."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from scipy.sparse import coo_matrix
from scipy.sparse.csgraph import shortest_path

from safepy_tpu.ops import apsp_banded as ab
from safepy_tpu.ops import apsp_bandstore as bs
from safepy_tpu.ops.neighborhoods import dense_initial_distances, inclusive_radius


def _geometric_graph(n, k, seed, long_edges=0):
    """k-NN geometric graph; optional random LONG edges (weight = Euclidean
    endpoint distance, the shortpath_weighted_layout contract) to exercise the
    out-of-band edge drop."""
    rng = np.random.default_rng(seed)
    coords = rng.uniform(-1, 1, (n, 2))
    from scipy.spatial import cKDTree
    _, nn = cKDTree(coords).query(coords, k=k)
    pairs = {(min(i, int(j)), max(i, int(j)))
             for i in range(n) for j in nn[i, 1:]}
    for _ in range(long_edges):
        a, b = rng.integers(0, n, 2)
        if a != b:
            pairs.add((min(a, b), max(a, b)))
    edges = np.array(sorted(pairs))
    w = np.hypot(coords[edges[:, 0], 0] - coords[edges[:, 1], 0],
                 coords[edges[:, 0], 1] - coords[edges[:, 1], 1])
    return coords, edges, w


def _oracle(n, edges, w):
    A = coo_matrix((w, tuple(edges.T)), shape=(n, n))
    return shortest_path(A.maximum(A.T), method="D", directed=False)


def _banded_setup(n, k, seed, block, long_edges=0):
    coords, edges, w = _geometric_graph(n, k, seed, long_edges)
    nr = 0.1 * (coords[:, 0].max() - coords[:, 0].min())
    order, band = ab.banded_order(coords, nr * (1 + 1e-5))
    rank = np.empty(n, dtype=np.int64)
    rank[order] = np.arange(n)
    return coords, edges, w, nr, rank, band


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    n, band, block = 150, 40, 64
    dense = rng.uniform(1, 9, (n, n)).astype(np.float32)
    s = bs.pack_band(dense, band, block)
    back = bs.unpack_band(s, n, band, block)
    bt, _, _ = bs.band_params(n, band, block)
    tile_sep = np.abs(np.arange(n)[:, None] // block
                      - np.arange(n)[None, :] // block)
    in_band = tile_sep <= bt
    np.testing.assert_array_equal(back[in_band], dense[in_band])
    assert np.isinf(back[~in_band]).all()


def test_band_init_matches_dense_init():
    n, block = 300, 64
    _, edges, w, nr, rank, band = _banded_setup(n, 6, 0, block)
    pe = rank[edges]
    s = bs.band_init_from_edges(jnp.asarray(pe[:, 0], jnp.int32),
                                jnp.asarray(pe[:, 1], jnp.int32),
                                jnp.asarray(w, jnp.float32),
                                n=n, band=band, block=block)
    dense = dense_initial_distances(n, pe, w, dtype=np.float32)
    expect = bs.pack_band(dense, band, block)
    np.testing.assert_array_equal(np.asarray(s), np.asarray(expect))


@pytest.mark.parametrize("seed,long_edges", [(0, 0), (3, 25)])
def test_bandstore_fw_matches_oracle_within_radius(seed, long_edges):
    n, block = 600, 64
    coords, edges, w, nr, rank, band = _banded_setup(n, 7, seed, block,
                                                     long_edges)
    assert band < n
    pe = rank[edges]
    s = bs.band_init_from_edges(jnp.asarray(pe[:, 0], jnp.int32),
                                jnp.asarray(pe[:, 1], jnp.int32),
                                jnp.asarray(w, jnp.float32),
                                n=n, band=band, block=block)
    bt, _, _ = bs.band_params(n, band, block)
    out = bs.apsp_band_fw(s, bt=bt, block=block, use_pallas=False)
    dense = bs.unpack_band(out, n, band, block)
    dist = dense[rank][:, rank]  # back to the original node frame

    ref = _oracle(n, edges, w)
    r = float(inclusive_radius(nr))

    got_ind = dist <= r
    np.testing.assert_array_equal(got_ind, ref <= r)
    inside = ref <= nr
    np.testing.assert_allclose(dist[inside], ref[inside], rtol=1e-5, atol=1e-6)
    # everywhere else: genuine-path upper bounds (or inf out of band)
    outside = ~inside & np.isfinite(ref) & np.isfinite(dist)
    assert (dist[outside] >= ref[outside] * (1 - 1e-5)).all()


def test_bandstore_fw_pallas_interpret():
    from jax.experimental.pallas import tpu as pltpu

    n, block = 384, 64
    _, edges, w, nr, rank, band = _banded_setup(n, 6, 1, block)
    pe = rank[edges]
    s = bs.band_init_from_edges(jnp.asarray(pe[:, 0], jnp.int32),
                                jnp.asarray(pe[:, 1], jnp.int32),
                                jnp.asarray(w, jnp.float32),
                                n=n, band=band, block=block)
    bt, _, _ = bs.band_params(n, band, block)
    want = np.asarray(bs.apsp_band_fw(s, bt=bt, block=block, use_pallas=False))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(bs.apsp_band_fw(s, bt=bt, block=block,
                                         use_pallas=True))
    np.testing.assert_array_equal(got, want)


def _thresholded_band(n, k, seed, block):
    coords, edges, w, nr, rank, band = _banded_setup(n, k, seed, block)
    pe = rank[edges]
    s = bs.band_init_from_edges(jnp.asarray(pe[:, 0], jnp.int32),
                                jnp.asarray(pe[:, 1], jnp.int32),
                                jnp.asarray(w, jnp.float32),
                                n=n, band=band, block=block)
    bt, _, _ = bs.band_params(n, band, block)
    out = bs.apsp_band_fw(s, bt=bt, block=block, use_pallas=False)
    r = inclusive_radius(nr)
    s_ind = bs.band_threshold(out, r)
    dense_ind = (bs.unpack_band(out, n, band, block) <= float(r))
    return s_ind, dense_ind, rank, band, bt


def test_band_threshold_and_row_stats():
    n, block = 500, 64
    s_ind, dense_ind, rank, band, bt = _thresholded_band(n, 6, 2, block)
    sizes, mean, std = bs.band_row_stats(s_ind, n=n, bt=bt, block=block)
    want = dense_ind.sum(axis=1)
    np.testing.assert_array_equal(np.asarray(sizes), want)
    assert np.isclose(float(mean), want.mean())
    assert np.isclose(float(std), want.std())


def test_band_matmul_matches_dense():
    n, block, a_dim = 500, 64, 3
    s_ind, dense_ind, rank, band, bt = _thresholded_band(n, 6, 4, block)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(n, a_dim)).astype(np.float32)
    npad = -(-n // block) * block
    xp = np.zeros((npad, a_dim), np.float32)
    xp[:n] = x
    got = np.asarray(bs.band_matmul(s_ind, jnp.asarray(xp), bt=bt,
                                    block=block))[:n]
    want = dense_ind.astype(np.float32) @ x
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_compact_band_and_batch_matmul():
    """Column compaction + batched slab contraction == dense valid-column GEMM."""
    n, block, a_dim, c_dim = 500, 64, 2, 3
    s_ind, dense_ind, rank, band, bt = _thresholded_band(n, 6, 5, block)
    rng = np.random.default_rng(1)
    valid = rng.random(n) < 0.7  # permuted-frame validity mask
    v = int(valid.sum())

    compact, starts, w_c = bs.compact_band_columns(s_ind, valid, bt=bt,
                                                   block=block)
    vals = rng.normal(size=(c_dim, v, a_dim)).astype(np.float32)
    v_pad = v + w_c  # slack so starts[i] + w_c never overruns
    x_batch = np.zeros((c_dim, v_pad, a_dim), np.float32)
    x_batch[:, :v] = vals
    got = np.asarray(bs.band_matmul_batch(compact, jnp.asarray(x_batch),
                                          starts, bt=bt, block=block))[:, :n]

    dense_valid = dense_ind[:, valid].astype(np.float32)  # (n, V)
    want = np.einsum("nv,cva->cna", dense_valid, vals)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-5)
