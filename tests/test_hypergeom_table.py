"""Class-table hypergeometric engine vs scipy and vs the f64 tail loop.

Reference semantics: hypergeom.sf(k-1, M, K, n) per cell (safepy/safe.py:596).
The table engine (ops/hypergeom_table.py) must stay within the 1e-6 absolute
p-value parity budget and make the identical significance decision as an
f64 evaluation.
"""

import numpy as np
import pandas as pd
import pytest
from scipy.special import gammaln
from scipy.stats import hypergeom as scipy_hypergeom

import jax.numpy as jnp

from safepy_tpu.ops import hypergeom_table as htab


def test_log_factorial_matches_gammaln():
    x = np.concatenate([np.arange(0, 40),
                        np.unique(np.geomspace(40, 1_000_000, 60).astype(int))])
    got = np.asarray(htab.log_factorial(jnp.asarray(x, jnp.float64)))
    want = gammaln(x.astype(np.float64) + 1.0)
    # absolute error budget: ~eps * |lgamma| at the top of the range
    assert np.max(np.abs(got - want)) <= 1e-8


def _table_values(K_dist, M, R, S_max, threshold=0.05):
    C = 1
    while C < len(K_dist):
        C *= 2
    kd = np.zeros(C)
    kd[:len(K_dist)] = K_dist
    table = np.asarray(htab.build_logsf_table(
        jnp.asarray(kd), M, float(np.log(threshold)), R=R, S_max=S_max, C=C))
    return table, C


@pytest.mark.parametrize("M", [97, 1000])
def test_table_matches_scipy_sf(M):
    rng = np.random.default_rng(0)
    K_dist = np.unique(rng.integers(0, min(M, 400), 12))
    n_max = min(M, 180)
    R, S_max = htab.table_geometry(K_dist, n_max, M)
    table, C = _table_values(K_dist, M, R, S_max)

    for ci, K in enumerate(K_dist):
        for n in rng.integers(0, n_max + 1, 8):
            lo = max(0, n + int(K) - M)
            hi = min(int(K), int(n))
            for k in range(0, hi + 1):
                stored = table[S_max - 1 - k, ci, n]
                want = scipy_hypergeom.sf(k - 1, M, int(K), int(n))
                got = np.exp(np.float64(stored))
                assert abs(got - want) <= 1e-6, (M, K, n, k)
                # significance bit must equal the f64 decision, and must be
                # recoverable from the stored f32 value alone
                sig64 = np.log(want) < np.log(0.05) if want > 0 else True
                sig32 = stored < np.float32(np.log(0.05))
                assert bool(sig32) == bool(sig64) or \
                    abs(want - 0.05) < 1e-12, (M, K, n, k)


def test_table_deep_tail_log_accuracy():
    """Deeply-enriched cells: the stored log-sf (not p, which underflows f32)
    must match scipy's logsf to f32 resolution."""
    M, K, n = 5000, 400, 300
    R, S_max = htab.table_geometry([K], n, M)
    table, C = _table_values([K], M, R, S_max)
    for k in (150, 200, 240):
        stored = float(table[S_max - 1 - k, 0, n])
        want = scipy_hypergeom.logsf(k - 1, M, K, n)
        assert abs(stored - want) <= max(1e-4, 2e-6 * abs(want)), (k, stored,
                                                                   want)


def test_table_overflow_renorm():
    """Extreme-overlap classes where 1/pmf(lo) overflows f64: the renormalized
    T carry must keep every in-support slot finite and ordered."""
    M, K, n = 4000, 2000, 2000
    R, S_max = htab.table_geometry([K], n, M)
    table, C = _table_values([K], M, R, S_max)
    col = table[::-1, 0, n]  # slot k
    lo, hi = max(0, n + K - M), min(K, n)
    vals = col[lo:hi + 1].astype(np.float64)
    assert np.all(np.isfinite(vals))
    assert np.all(np.diff(vals) <= 1e-9)  # sf decreasing in k
    want = scipy_hypergeom.logsf(np.arange(lo, hi + 1) - 1, M, K, n)
    ok = want > -1e30
    assert np.max(np.abs(vals[ok] - want[ok])
                  / np.maximum(1.0, np.abs(want[ok]))) <= 1e-5


def test_lookup_end_to_end_matches_scipy():
    rng = np.random.default_rng(3)
    N, A, M = 300, 17, 260
    nsize = rng.integers(0, 200, N).astype(np.float64)
    K = rng.integers(0, 120, A).astype(np.float64)
    counts = np.minimum(nsize[:, None], K[None, :])
    counts = np.floor(counts * rng.random((N, A))).astype(np.float64)

    plan = htab.plan(K, float(nsize.max()), M)
    assert plan is not None and len(plan["chunks"]) == 1
    ch = plan["chunks"][0]
    table = htab.build_logsf_table(
        jnp.asarray(ch["K_dist"]), M, float(np.log(0.05)),
        R=ch["R"], S_max=ch["S_max"], C=ch["C"])
    nes, logsf, nbin = htab.table_lookup(
        table, jnp.asarray(counts, jnp.float32),
        jnp.asarray(nsize, jnp.float32),
        jnp.asarray(ch["colc"], jnp.int32), np.float32(np.log(0.05)),
        S_max=ch["S_max"], R=ch["R"], C=ch["C"])
    p_got = np.exp(np.asarray(logsf, np.float64))
    nbin = np.asarray(nbin)

    p_want = scipy_hypergeom.sf(counts - 1, M, K[None, :], nsize[:, None])
    assert np.max(np.abs(p_got - p_want)) <= 1e-6
    np.testing.assert_array_equal(nbin, (p_want < 0.05).astype(np.int8))


@pytest.mark.slow
def test_slot_loop_engine_identical_to_gather(monkeypatch):
    """The slot-loop resolve (large-surface engine) must reproduce the
    per-cell gather engine BIT-exactly: both select the same stored f32
    table values, just via masked sweeps instead of serialized gathers."""
    rng = np.random.default_rng(7)
    N, A, M = 512, 33, 700
    nsize = rng.integers(0, 300, N).astype(np.float64)
    K = rng.integers(0, 250, A).astype(np.float64)
    counts = np.floor(np.minimum(nsize[:, None], K[None, :])
                      * rng.random((N, A))).astype(np.float64)

    plan = htab.plan(K, float(nsize.max()), M)
    ch = plan["chunks"][0]
    table = htab.build_logsf_table(
        jnp.asarray(ch["K_dist"]), M, float(np.log(0.05)),
        R=ch["R"], S_max=ch["S_max"], C=ch["C"])
    args = (table, jnp.asarray(counts, jnp.float32),
            jnp.asarray(nsize, jnp.float32),
            jnp.asarray(ch["colc"], jnp.int32), np.float32(np.log(0.05)))
    kw = dict(S_max=ch["S_max"], R=ch["R"], C=ch["C"])

    monkeypatch.setattr(htab, "LOOKUP_LOOP_MIN_CELLS", 10 ** 18)
    nes_g, logsf_g, nbin_g = (np.asarray(x)
                              for x in htab.table_lookup(*args, **kw))
    monkeypatch.setattr(htab, "LOOKUP_LOOP_MIN_CELLS", 1)
    nes_l, logsf_l, nbin_l = (np.asarray(x)
                              for x in htab.table_lookup(*args, **kw))

    np.testing.assert_array_equal(logsf_g, logsf_l)
    np.testing.assert_array_equal(nes_g, nes_l)
    np.testing.assert_array_equal(nbin_g, nbin_l)
    p_want = scipy_hypergeom.sf(counts - 1, M, K[None, :], nsize[:, None])
    assert np.max(np.abs(np.exp(logsf_l.astype(np.float64)) - p_want)) <= 1e-6


def test_lookup_group_bit_identical(monkeypatch):
    """The slot loop's unroll depth (``lookup_group`` — the census HBM
    planner's lever, hbm.census_select) must not change a single bit: each
    cell is selected by exactly one sweep regardless of grouping."""
    rng = np.random.default_rng(13)
    N, A, M = 256, 21, 500
    nsize = rng.integers(0, 260, N).astype(np.float64)
    K = rng.integers(0, 200, A).astype(np.float64)
    counts = np.floor(np.minimum(nsize[:, None], K[None, :])
                      * rng.random((N, A))).astype(np.float64)

    plan = htab.plan(K, float(nsize.max()), M)
    ch = plan["chunks"][0]
    table = htab.build_logsf_table(
        jnp.asarray(ch["K_dist"]), M, float(np.log(0.05)),
        R=ch["R"], S_max=ch["S_max"], C=ch["C"])
    args = (table, jnp.asarray(counts, jnp.float32),
            jnp.asarray(nsize, jnp.float32),
            jnp.asarray(ch["colc"], jnp.int32), np.float32(np.log(0.05)))
    kw = dict(S_max=ch["S_max"], R=ch["R"], C=ch["C"])

    monkeypatch.setattr(htab, "LOOKUP_LOOP_MIN_CELLS", 1)  # force slot loop
    ref = [np.asarray(x)
           for x in htab.table_lookup(*args, **kw, lookup_group=8)]
    for group in (4, 2, 1, 16):
        got = [np.asarray(x)
               for x in htab.table_lookup(*args, **kw, lookup_group=group)]
        for r, g in zip(ref, got):
            np.testing.assert_array_equal(r, g)


def _geom_net(tmp_path, n=400, k=6, seed=11):
    rng = np.random.default_rng(seed)
    coords = rng.uniform(-1, 1, (n, 2))
    from scipy.spatial import cKDTree
    _, nn = cKDTree(coords).query(coords, k=k)
    pairs = sorted({(min(i, int(j)), max(i, int(j)))
                    for i in range(n) for j in nn[i, 1:]})
    net = tmp_path / "net.txt"
    with open(net, "w") as f:
        for a, b in pairs:
            f.write(f"g{a}\tg{b}\t1.0\n")
    return str(net), n


def _binary_attrs(n, a=6, seed=4):
    rng = np.random.default_rng(seed)
    vals = (rng.random((n, a)) < 0.1).astype(float)
    vals[rng.random((n, a)) < 0.08] = np.nan
    return pd.DataFrame(vals, index=[f"g{i}" for i in range(n)],
                        columns=[f"go{j}" for j in range(a)])


def _run(net, attrs, *, engine, mode="auto", staged=False, **kwargs):
    from safepy_tpu import SAFE
    sf = SAFE(verbose=False)
    sf.apsp_mode = mode
    sf.hypergeom_engine = engine
    sf.random_seed = 5
    sf.load_network(network_file=net, node_key_attribute="key")
    sf.load_attributes(attribute_file=attrs)
    if staged:
        sf.define_neighborhoods()
        sf.compute_pvalues(**kwargs)
    else:
        sf.run_pipeline(**kwargs)
    return sf


@pytest.mark.slow
def test_facade_dense_table_vs_loop(tmp_path):
    net, n = _geom_net(tmp_path)
    attrs = _binary_attrs(n)
    t = _run(net, attrs, engine="table")
    l = _run(net, attrs, engine="loop")
    assert np.nanmax(np.abs(t.pvalues_pos - l.pvalues_pos)) <= 1e-6
    np.testing.assert_array_equal(t.nes_binary, l.nes_binary)
    np.testing.assert_array_equal(
        t.attributes["num_neighborhoods_enriched"].values,
        l.attributes["num_neighborhoods_enriched"].values)


@pytest.mark.slow
def test_facade_band_table_vs_loop(tmp_path):
    net, n = _geom_net(tmp_path, seed=12)
    attrs = _binary_attrs(n, seed=9)
    t = _run(net, attrs, engine="table", mode="band")
    l = _run(net, attrs, engine="loop", mode="band")
    assert np.nanmax(np.abs(t.pvalues_pos - l.pvalues_pos)) <= 1e-6
    np.testing.assert_array_equal(t.nes_binary, l.nes_binary)
    # staged band path must route through the same table driver bit-exactly
    s = _run(net, attrs, engine="table", mode="band", staged=True)
    np.testing.assert_array_equal(np.asarray(s.nes), np.asarray(t.nes))
    np.testing.assert_array_equal(s.nes_binary, t.nes_binary)


@pytest.mark.slow
def test_table_engine_rejects_non_binary(tmp_path):
    net, n = _geom_net(tmp_path, seed=13)
    rng = np.random.default_rng(0)
    vals = rng.normal(size=(n, 2))
    attrs = pd.DataFrame(vals, index=[f"g{i}" for i in range(n)],
                         columns=["a", "b"])
    sf = _run(net, attrs, engine="table", mode="band", staged=True,
              how="randomization", num_permutations=50)
    assert sf.nes is not None  # randomization path unaffected by the engine

    with pytest.raises(ValueError, match="binary"):
        _run(net, attrs, engine="table", mode="band", staged=True,
             how="hypergeometric")


def test_column_sums_chunked_bit_equal():
    """The column-chunked annotated-total reduction (the census's K
    fallback) is bit-equal to the full astype(f32) reduction it replaces —
    the full path materializes a 4 B/cell f32 copy of the int8 annotations
    (6.98 GB at 399,360 x 4,373) at the census's fullest moment."""
    from safepy_tpu.ops.enrich_band import _column_sums_chunked
    rng = np.random.default_rng(3)
    nan0 = (rng.random((301, 23)) < 0.2).astype(np.int8)
    want = np.asarray(jnp.sum(jnp.asarray(nan0).astype(jnp.float32), axis=0))
    for chunk in (4, 23, 64):
        np.testing.assert_array_equal(
            _column_sums_chunked(jnp.asarray(nan0), chunk_cols=chunk), want)


@pytest.mark.slow
def test_band_table_explicit_K_equals_fallback(tmp_path):
    """hypergeom_band_table with the facade's cached K (the production
    path: no (n, A) f32 transient) returns bit-identical results to the
    in-function fallback reduction."""
    from safepy_tpu.ops.enrich_band import hypergeom_band_table
    net, n = _geom_net(tmp_path, seed=14)
    attrs = _binary_attrs(n, a=9, seed=7)
    sf = _run(net, attrs, engine="table", mode="band")
    bm = sf._neighborhoods_dev
    order = np.argsort(bm.rank)
    nan0, nnn, K, ok, M = sf._band_hyper_operands_cached(order)
    assert ok
    kw = dict(bt=bm.bt, block=bm.block, rank_np=bm.rank,
              precision=sf.matmul_precision)
    with_k = hypergeom_band_table(bm.data, nan0, nnn, M, np.float64(0.05),
                                  K_np=np.asarray(K), **kw)
    fallback = hypergeom_band_table(bm.data, nan0, nnn, M, np.float64(0.05),
                                    **kw)
    assert with_k is not None and fallback is not None
    for got, want in zip(with_k, fallback):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_band_table_auto_select(tmp_path):
    """``logsf_out='auto'`` makes the AUTHORITATIVE (residency, group)
    selection inside hypergeom_band_table, where the true class-table bytes
    are known: a generous budget lands on device/group-8 with outputs
    bit-equal to the explicit device path; a pinched budget walks down a
    lever (recorded in select_out) without changing the exact results; an
    impossible budget refuses cleanly BEFORE any (n, A) allocation."""
    from safepy_tpu.ops.enrich_band import hypergeom_band_table
    net, n = _geom_net(tmp_path, seed=15)
    attrs = _binary_attrs(n, a=9, seed=8)
    sf = _run(net, attrs, engine="table", mode="band")
    bm = sf._neighborhoods_dev
    order = np.argsort(bm.rank)
    nan0, nnn, K, ok, M = sf._band_hyper_operands_cached(order)
    assert ok
    kw = dict(bt=bm.bt, block=bm.block, rank_np=bm.rank,
              precision=sf.matmul_precision, K_np=np.asarray(K))
    want = hypergeom_band_table(bm.data, nan0, nnn, M, np.float64(0.05),
                                logsf_out="device", **kw)

    sel = {}
    got = hypergeom_band_table(bm.data, nan0, nnn, M, np.float64(0.05),
                               logsf_out="auto", lookup_group="auto",
                               budget=16 * 10 ** 9, select_out=sel, **kw)
    assert sel["logsf_out"] == "device" and sel["lookup_group"] == 8
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))

    # pinch the budget just below the device/group-8 peak: a cheaper lever
    # is selected, the exact outputs (indicator + counts) are unchanged
    pinched = int((sel["census_peak"] - 1) / 0.94)
    sel2 = {}
    got2 = hypergeom_band_table(bm.data, nan0, nnn, M, np.float64(0.05),
                                logsf_out="auto", lookup_group="auto",
                                budget=pinched, select_out=sel2, **kw)
    assert ((sel2["logsf_out"], sel2["lookup_group"])
            != (sel["logsf_out"], sel["lookup_group"]))
    np.testing.assert_array_equal(np.asarray(got2[1]), np.asarray(want[1]))
    np.testing.assert_array_equal(got2[2], want[2])
    np.testing.assert_allclose(np.asarray(got2[0], np.float64),
                               np.asarray(want[0], np.float64),
                               rtol=1e-3, atol=1e-3)

    # nothing fits: clean refusal before the (n, A) outputs are allocated
    with pytest.raises(ValueError, match="census phase does not fit"):
        hypergeom_band_table(bm.data, nan0, nnn, M, np.float64(0.05),
                             logsf_out="auto", lookup_group="auto",
                             budget=10 ** 3, **kw)


def test_plan_ineligible_on_fractional_K():
    assert htab.plan(np.array([2.5, 3.0]), 50, 100) is None
    assert htab.plan(np.array([]), 50, 100) is None


def test_unified_multichunk_plan_matches_scipy():
    """Multi-chunk plans collapse to ONE (R, S_max, C, width) jit signature
    (remote compiles cost 1 s-10 min each): the tail chunk re-windows
    backwards to full width and recomputes `overlap` columns identically —
    driving the chunks exactly as ops/enrich_band.hypergeom_band_table does
    (overwrite placement + count trim) must still match scipy everywhere."""
    rng = np.random.default_rng(21)
    N, A, M = 200, 21, 180
    nsize = rng.integers(0, 150, N).astype(np.float64)
    K = rng.integers(0, 100, A).astype(np.float64)
    counts = np.floor(np.minimum(nsize[:, None], K[None, :])
                      * rng.random((N, A))).astype(np.float64)

    plan = htab.plan(K, float(nsize.max()), M, chunk_cols=8)
    assert len(plan["chunks"]) == 3
    sigs = {(c["R"], c["S_max"], c["C"], c["width"])
            for c in plan["chunks"]}
    assert len(sigs) == 1, sigs
    last = plan["chunks"][-1]
    assert last["start"] == A - 8 and last["overlap"] == 3
    assert sum(c["width"] - c["overlap"] for c in plan["chunks"]) == A

    logsf = np.full((N, A), np.nan, np.float32)
    col_counts = []
    for ch in plan["chunks"]:
        s, w = ch["start"], ch["width"]
        table = htab.build_logsf_table(
            jnp.asarray(ch["K_dist"]), M, float(np.log(0.05)),
            R=ch["R"], S_max=ch["S_max"], C=ch["C"])
        _, logsf_c, nbin_c = htab.table_lookup(
            table, jnp.asarray(counts[:, s:s + w], jnp.float32),
            jnp.asarray(nsize, jnp.float32),
            jnp.asarray(ch["colc"], jnp.int32), np.float32(np.log(0.05)),
            S_max=ch["S_max"], R=ch["R"], C=ch["C"])
        logsf[:, s:s + w] = np.asarray(logsf_c)  # overwrite placement
        col_counts.append(np.asarray(nbin_c).sum(0)[ch["overlap"]:])

    p_want = scipy_hypergeom.sf(counts - 1, M, K[None, :], nsize[:, None])
    assert np.max(np.abs(np.exp(logsf.astype(np.float64)) - p_want)) <= 1e-6
    col_counts = np.concatenate(col_counts)
    np.testing.assert_array_equal(col_counts, (p_want < 0.05).sum(0))


def test_table_engine_degenerate_columns():
    """K = 0 (empty attribute), K = M (full column), and a constant-n_max
    surface resolve exactly: sf(k-1; M, K, n) for k = 0 is 1 (log 0), a full
    column has every annotated neighborhood significant iff the f64 decision
    says so — compared against scipy on every cell."""
    M = 60
    K_dist = np.array([0.0, 1.0, 60.0])
    n_max = 20
    R, S_max = htab.table_geometry(K_dist, n_max, M)
    table, C = _table_values(K_dist, M, R, S_max)
    for ci, K in enumerate(K_dist):
        for n in range(0, n_max + 1):
            hi = min(int(K), n)
            for k in range(0, hi + 1):
                stored = np.float64(table[S_max - 1 - k, ci, n])
                want = scipy_hypergeom.sf(k - 1, M, int(K), n)
                assert abs(np.exp(stored) - want) <= 1e-6, (K, n, k)


def test_plan_rejects_non_integer_inputs():
    assert htab.plan(np.array([1.5, 2.0]), 10, 50) is None     # fractional K
    assert htab.plan(np.array([1.0, 2.0]), 10.7, 50) is None   # fractional n
    assert htab.plan(np.array([]), 10, 50) is None             # no columns


def test_plan_single_chunk_not_rewindowed():
    p = htab.plan(np.arange(1, 9, dtype=float), 16, 64, chunk_cols=512)
    assert p is not None and len(p["chunks"]) == 1
    assert p["chunks"][0]["overlap"] == 0
