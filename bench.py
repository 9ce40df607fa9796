"""Benchmark: Example_1-equivalent end-to-end SAFE on Costanzo scale.

Synthetic stand-in for the Costanzo-2016 run (the real safe-data bundle is not
vendored): 3,971 nodes / 28,202 edges with embedded layout coordinates, one
quantitative attribute, shortpath_weighted_layout neighborhoods (blocked
Floyd-Warshall APSP on TPU) and a 1,000-permutation empirical null — the exact
pipeline shape of the reference's default workflow (safepy/safe_default.ini +
tests/test_enrichments.py TestEnrichmentPermutations).

Prints ONE JSON line: steady-state wall-clock of the full pipeline
(define_neighborhoods + load_attributes + compute_pvalues), with
vs_baseline = 5.0 / value against BASELINE.json's <5 s north star.
"""

import json
import sys
import time

import networkx as nx
import numpy as np
import pandas as pd

N_NODES = 3971
N_EDGES = 28202
BASELINE_S = 5.0

# Regression gate (VERDICT r4 item 4): the headline drifted 0.127 s (r2) ->
# 0.183 s (r3) -> 0.175 s (r4) with no gate. Two same-code r4 measurements
# spread 0.158-0.175 s (tools/r4e2_results.log vs BENCH_r04.json), so most
# of the drift was shared-tunnel run-to-run variance; the headline is now
# the MIN of 3 steady repeats (variance-robust) and gated at +25% over the
# expected band below. bench.py exits 1 on a gated regression (the JSON
# line is printed first either way).
#
# Drift accounting (r5 measured, tools/r5_results.log 19:38): min-of-3 is
# 0.148 s — the 0.127 (r2) gap decomposes as ~4 ms of banded-window APSP
# bucketing tax (band_bt_bucket rounds the 3,971-node window up; isolated
# apsp_steady 0.0444 -> 0.0493) with the remainder the r3 engine switch to
# the class-table path, which trades ~15 ms at toy scale for the 0.08-0.13
# G/s gather economics that win >10x at GO scale (r3 logs).
HEADLINE_EXPECTED_S = 0.148  # min-of-3 steady, v5e via tunnel (r5 measured)
PHASE_EXPECTED_S = {"apsp_steady_s": 0.049, "null_steady_s": 0.045}
GATE_MAX_REGRESSION = 0.25


def load_reference_wall():
    """Measured wall-clock of the reference implementation on THIS network
    (tools/measure_reference.py runs /root/reference's safepy on the same graph
    and attribute table; result checked in at tools/reference_wall.json)."""
    import os
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "tools", "reference_wall.json")
    try:
        with open(path) as f:
            return json.load(f)
    except (OSError, ValueError):
        return None


def build_network(seed=0, n=N_NODES, k=16, edge_budget=N_EDGES, prefix="gene"):
    """Synthetic geometric benchmark network: k-nearest-neighbor edges over
    uniform coordinates, optionally capped at an edge budget, with the node
    attributes every loader in the framework expects. Shared by the headline
    benchmark, the custom scales, and the TPU validation battery."""
    rng = np.random.default_rng(seed)
    coords = rng.uniform(-1, 1, (n, 2))
    g = nx.Graph()
    g.add_nodes_from(range(n))
    from scipy.spatial import cKDTree
    tree = cKDTree(coords)
    _, nn = tree.query(coords, k=k)
    edges = set()
    for i in range(n):
        for j in nn[i, 1:]:
            edges.add((min(i, int(j)), max(i, int(j))))
            if edge_budget and len(edges) >= edge_budget:
                break
        if edge_budget and len(edges) >= edge_budget:
            break
    g.add_edges_from(edges)
    for i in range(n):
        g.nodes[i]["label"] = g.nodes[i]["key"] = f"{prefix}{i}"
        g.nodes[i]["x"] = float(coords[i, 0])
        g.nodes[i]["y"] = float(coords[i, 1])
    from safepy_tpu.io.layout import calculate_edge_lengths
    calculate_edge_lengths(g, verbose=False)
    return g, coords


def run_pipeline(sf, attr_df, num_permutations=1000):
    sf.load_attributes(attribute_file=attr_df)
    sf.run_pipeline(num_permutations=num_permutations)  # fused device program
    return sf.nes


def wait_for_backend(max_tries: int = 10, delay_s: float = 30.0):
    """The tunneled TPU is single-tenant: if another process held the grant
    recently, the PJRT plugin fails to register at interpreter startup and the
    process can never see the device. Recover by re-exec'ing this script after
    a cooldown (registration only happens at interpreter start)."""
    import os
    import jax
    try:
        jax.devices()
        return
    except RuntimeError as e:
        tries = int(os.environ.get("SAFEPY_BENCH_TRIES", "0"))
        if tries >= max_tries:
            raise
        print(f"# backend busy ({e}); re-exec {tries + 1}/{max_tries}",
              file=sys.stderr)
        time.sleep(delay_s)
        os.environ["SAFEPY_BENCH_TRIES"] = str(tries + 1)
        os.execv(sys.executable, [sys.executable] + sys.argv)


def main(argv=None):
    import argparse

    parser = argparse.ArgumentParser(description="safepy_tpu benchmarks")
    parser.add_argument("--nodes", type=int, default=N_NODES,
                        help="network size (default: Costanzo scale)")
    parser.add_argument("--attributes", type=int, default=1,
                        help="number of attributes (binary GO-style when > 1 "
                             "with --binary)")
    parser.add_argument("--binary", action="store_true",
                        help="binary annotations -> hypergeometric engine")
    parser.add_argument("--permutations", type=int, default=1000)
    parser.add_argument("--radius", type=float, default=None,
                        help="neighborhood radius override (fraction of the "
                             "x-extent); scale runs hold the mean neighborhood "
                             "size constant with radius ~ sqrt(125/(pi*N))")
    args = parser.parse_args(argv)

    import safepy_tpu
    from safepy_tpu import SAFE

    wait_for_backend()

    if (args.nodes != N_NODES or args.attributes != 1 or args.binary
            or args.radius is not None):
        return _custom_bench(args)

    g, coords = build_network()
    rng = np.random.default_rng(1)
    vals = rng.normal(size=(N_NODES, 1))
    vals[rng.random(N_NODES) < 0.33, 0] = np.nan
    attr_df = pd.DataFrame(vals, index=[f"gene{i}" for i in range(N_NODES)],
                           columns=["synthetic quantitative attribute"])

    sf = SAFE(verbose=False)
    sf.random_seed = 1885
    sf.load_network(network_file=g, node_key_attribute="key")

    # warm-up: compile every kernel at the benchmark shapes
    run_pipeline(sf, attr_df, args.permutations)

    # headline = MIN of 3 steady repeats: the tunneled chip's run-to-run
    # variance (measured 0.158-0.175 s on identical r4 code) would otherwise
    # dominate the regression gate
    walls = []
    for _ in range(3):
        t0 = time.time()
        nes = run_pipeline(sf, attr_df, args.permutations)
        walls.append(time.time() - t0)
    wall = min(walls)

    # isolated APSP steady-state, forced complete via a scalar readback:
    # the production path (radius-bounded banded FW when certified) AND the
    # exact full-matrix kernel
    import jax.numpy as jnp
    from safepy_tpu.io.graph_arrays import graph_to_arrays
    from safepy_tpu.ops.apsp import apsp
    from safepy_tpu.ops.neighborhoods import dense_initial_distances

    coords_arr, edges_arr, lengths_arr, _w = graph_to_arrays(sf.graph)
    d0 = jnp.asarray(dense_initial_distances(
        sf.graph.number_of_nodes(), edges_arr, lengths_arr, np.float32))
    dist = apsp(d0)
    _ = float(np.asarray(dist[0, 0]))
    t0 = time.time()
    dist = apsp(d0)
    _ = float(np.asarray(dist[0, 0]))
    apsp_full_s = time.time() - t0

    apsp_s = apsp_full_s
    plan = next((p for p in sf._banded_cache.values() if p is not None), None)
    if plan is not None:
        from safepy_tpu.ops.apsp_banded import apsp_banded_unpermuted
        from safepy_tpu.ops.neighborhoods import inclusive_radius
        init, rank_dev, window = plan
        nr = sf.neighborhood_radius * (coords_arr[:, 0].max()
                                       - coords_arr[:, 0].min())
        radius = inclusive_radius(nr)
        dist_b = apsp_banded_unpermuted(init, rank_dev, radius, window=window)
        _ = float(np.asarray(dist_b[0, 0]))
        t0 = time.time()
        dist_b = apsp_banded_unpermuted(init, rank_dev, radius, window=window)
        _ = float(np.asarray(dist_b[0, 0]))
        apsp_s = time.time() - t0

    # --- roofline: how close each engine runs to its hardware bound --------
    # min-plus op/s of the FW kernels (1 f32 add + 1 min per relaxation
    # lattice point), against the 0.96 T single-issue VPU bound measured in
    # round 1 — the full kernel relaxes npad^3 points, the banded kernel
    # ~nb * (window^2 * kept + 2 * window * block) (corner tiles skipped)
    block = 128
    npad = -(-N_NODES // block) * block
    roofline = {"vpu_minplus_bound_tops": 0.96}
    roofline["apsp_full_minplus_tops"] = round(
        2 * npad ** 3 / apsp_full_s / 1e12, 3)
    if plan is not None:
        w = plan[2]
        nt = w // block
        half = (w - block) // 2
        band_tiles = half // block + 3
        kept = min(nt, 2 * band_tiles + 1)
        # symmetric window kernel (default): only the upper in-band triangle
        # is relaxed (~(kept+1)/2 tiles per window row), the lower is a
        # mirror transpose — count the tiles actually computed
        kept_sym = (kept + 1) / 2
        tiles_per_round = 2 * nt + nt * kept_sym
        ops = (npad // block) * tiles_per_round * block ** 3 * 2
        roofline["apsp_banded_minplus_tops"] = round(ops / apsp_s / 1e12, 3)

    # the permutation-null GEMM stream: isolated steady timing of the count
    # scan, its achieved f32 Tflop/s, and utilization vs the v5e MXU peak
    # (197 Tflop/s bf16; precision='highest' runs 3-pass f32, so this MFU is
    # the honest conservative number)
    import jax
    from safepy_tpu.ops import permutation as perm_ops
    from safepy_tpu.ops.score import compute_neighborhood_score
    nbr_dev = sf._neighborhoods_device()
    n2a_dev = sf._node2attribute_device()
    n2a_np = np.asarray(sf.node2attribute)
    valid_rows = np.flatnonzero(np.sum(~np.isnan(n2a_np), axis=1))
    v_count = len(valid_rows)
    if v_count == n2a_np.shape[0]:
        valid_rows = None
    obs_dev = compute_neighborhood_score(nbr_dev, n2a_dev, "sum", "highest")
    key = jax.random.PRNGKey(0)

    def null_once():
        cn, cp = perm_ops.run_permutations(
            nbr_dev, n2a_dev, valid_rows, obs_dev, key, score_type="sum",
            num_permutations=args.permutations)
        return float(np.asarray(cn[0, 0]))

    null_once()
    t0 = time.time()
    null_once()
    null_s = time.time() - t0
    a_dim = n2a_np.shape[1]
    gemm_flops = 2.0 * N_NODES * v_count * a_dim * args.permutations
    roofline["null_steady_s"] = round(null_s, 4)
    roofline["null_gemm_tflops"] = round(gemm_flops / null_s / 1e12, 3)
    roofline["gemm_mfu_vs_bf16_peak"] = round(
        gemm_flops / null_s / 197e12, 4)
    # bytes over the tunneled relay per steady run (downloads dominate at
    # ~20-35 MB/s): two int32 count matrices + the f32 observed scores
    roofline["relay_bytes_per_run"] = int(N_NODES * a_dim * (4 + 4 + 4))

    band_scale = _band_scale_bench()

    enriched = int((sf.nes_binary > 0).sum())
    detail = {
        "nodes": N_NODES,
        "edges": g.number_of_edges(),
        "num_permutations": args.permutations,
        "apsp_steady_s": round(apsp_s, 4),
        "apsp_full_kernel_steady_s": round(apsp_full_s, 4),
        "roofline": roofline,
        # synthetic network — NOT comparable to the reference's real-data
        # 637+/-20 (tests/test_enrichments.py:100); compare against
        # reference_enriched_same_network below instead
        "enriched_neighborhoods_synthetic": enriched,
        "mean_neighborhood_size": float(sf.neighborhoods.sum(1).mean()),
    }
    if band_scale is not None:
        detail["band_scale"] = band_scale
    ref_wall = load_reference_wall()
    if ref_wall and ref_wall.get("num_permutations") == args.permutations:
        detail["reference_wall_s"] = ref_wall["reference_wall_s"]
        detail["speedup_vs_reference"] = round(ref_wall["reference_wall_s"] / wall, 1)
        detail["reference_enriched_same_network"] = ref_wall["enriched_neighborhoods"]

    # --- regression gate ---------------------------------------------------
    detail["headline_walls_s"] = [round(w, 4) for w in walls]
    gate = {"headline_expected_s": HEADLINE_EXPECTED_S,
            "max_regression": GATE_MAX_REGRESSION,
            "regressed": []}
    if wall > HEADLINE_EXPECTED_S * (1 + GATE_MAX_REGRESSION):
        gate["regressed"].append("example1_e2e_wall_s")
    phases = {"apsp_steady_s": apsp_s,
              "null_steady_s": roofline["null_steady_s"]}
    for name, measured in phases.items():
        if measured > PHASE_EXPECTED_S[name] * (1 + GATE_MAX_REGRESSION):
            gate["regressed"].append(name)
    detail["headline_gate"] = gate

    print(json.dumps({
        "metric": "example1_e2e_wall_s",
        "value": round(wall, 4),
        "unit": "s",
        "vs_baseline": round(BASELINE_S / wall, 3),
        "detail": detail,
    }))
    return 1 if gate["regressed"] else 0


def _band_scale_bench():
    """Regression-gate the BAND-STORAGE engine — the engine that is the
    actual product at scale — not just the latency-bound 3,971-node toy.

    Default ~50k nodes x 2k synthetic GO attributes (override with
    SAFEPY_BENCH_BAND_NODES / SAFEPY_BENCH_BAND_ATTRS; SAFEPY_BENCH_BAND=0
    skips). Emits the GO-binary phase split (band FW / census / table-lookup)
    with each phase's hardware roofline — min-plus Top/s against the 0.96 T
    single-issue VPU bound, census HBM GB/s, lookup G cells/s — plus the
    quantitative permutation-null steady time and its GEMM Tflop/s at the
    same scale. Never fails the headline metric: errors are reported inline.
    """
    import os
    if os.environ.get("SAFEPY_BENCH_BAND", "1") == "0":
        return None
    n = int(os.environ.get("SAFEPY_BENCH_BAND_NODES", 49920))
    a = int(os.environ.get("SAFEPY_BENCH_BAND_ATTRS", 2048))
    try:
        return _band_scale_bench_inner(n, a)
    except Exception as e:  # noqa: BLE001 — report, don't fail the headline
        return {"error": f"{type(e).__name__}: {e}", "nodes": n,
                "attributes": a}


def _band_scale_bench_inner(n, a, perms=1000):
    import jax
    import jax.numpy as jnp
    from safepy_tpu import SAFE
    from safepy_tpu.ops.apsp_bandstore import band_nbytes
    from safepy_tpu.ops.neighborhoods import inclusive_radius
    from safepy_tpu import pipeline as pipe

    rng = np.random.default_rng(2)
    g, coords = build_network(n=n, k=9, edge_budget=None, prefix="n")
    # heavy-tailed GO-like term sizes (most terms tiny), 5% NaN
    sizes = np.exp(rng.uniform(np.log(5), np.log(0.03 * n), a))
    vals = (rng.random((n, a)) < (sizes / n)[None, :]).astype(np.float32)
    vals[rng.random((n, a)) < 0.05] = np.nan
    attrs = pd.DataFrame(vals, index=[f"n{i}" for i in range(n)],
                         columns=[f"go{j}" for j in range(a)])
    radius = float(np.sqrt(125.0 / (np.pi * n)))

    sf = SAFE(verbose=False)
    sf.apsp_mode = "band"
    sf.band_storage_min_nodes = 10000
    sf.keep_node_distances = False
    sf.random_seed = 17
    sf.neighborhood_radius = radius
    sf.load_network(network_file=g, node_key_attribute="key")
    sf.load_attributes(attribute_file=attrs)
    t0 = time.time()
    sf.run_pipeline()
    first = time.time() - t0
    t0 = time.time()
    sf.run_pipeline()
    go_steady = time.time() - t0
    engine = sf._hypergeom_engine_used
    enriched_cols = int(
        (sf.attributes["num_neighborhoods_enriched"] > 10).sum())
    plan = next(v for v in sf._bandstore_cache.values() if v is not None)
    band = int(plan["band"])
    block = 128
    bt = band // block + 1
    ext = float(coords[:, 0].max() - coords[:, 0].min())
    rad = inclusive_radius(radius * ext)  # the facade's exact radius

    out = {"nodes": n, "attributes": a, "band": band,
           "go_first_s": round(first, 2), "go_steady_s": round(go_steady, 3),
           "engine": engine, "attrs_with_gt10_enriched": enriched_cols,
           "band_stored_gb": round(band_nbytes(
               n, band, itemsize=1)
               / (8e9 if sf._neighborhoods_dev.data.dtype == jnp.uint8
                  else 1e9), 3)}

    # --- phase 1: band FW front, isolated steady --------------------------
    pk = sf._band_bits_selected(n, band)
    def front():
        t0 = time.time()
        o = pipe.band_neighborhoods(plan["u"], plan["v"], plan["w"], rad,
                                    n=n, band=band, packed=pk)
        _ = float(np.asarray(o[2]))
        return o[1], time.time() - t0
    s_ind, _ = front()
    del s_ind
    s_ind, fw_s = front()
    # min-plus work: nb rounds, symmetric window = upper-wedge tiles +
    # mirror, plus the pivot-row relax — ops = 2 per lattice point
    nt = 2 * bt + 1
    nb = s_ind.shape[0] // block - 2 * bt
    fw_ops = nb * (nt * (nt + 1) / 2 + nt) * block ** 3 * 2
    out["fw_steady_s"] = round(fw_s, 3)
    out["fw_minplus_tops"] = round(fw_ops / fw_s / 1e12, 3)
    out["vpu_minplus_bound_tops"] = 0.96

    # --- phases 2-3: census GEMM + table lookup (the class-table engine) --
    from safepy_tpu.ops import hypergeom_table as htab
    from safepy_tpu.ops.enrich_band import (_pad_rows_to, band_matmul)
    import functools as _ft
    order = np.argsort(plan["rank"])
    nan0_perm, nnn_perm, K_np = SAFE._hypergeom_host_operands(vals, order)
    M = int(nnn_perm.sum())
    npad = s_ind.shape[0] - 2 * bt * block
    nan0_dev = jnp.asarray(nan0_perm.astype(np.int8))
    nsize = band_matmul(s_ind, _pad_rows_to(
        jnp.asarray(nnn_perm)[:, None], npad), bt=bt, block=block)[:, 0]
    tplan = htab.plan(K_np, float(jnp.max(nsize)), M)
    lookup_jit = _ft.partial(jax.jit,
                             static_argnames=("S_max", "R", "C"))(
        htab.table_lookup)
    census_s = lookup_s = 0.0
    cells = 0
    for rep in range(2):  # rep 0 compiles; rep 1 is the steady measurement
        census_s = lookup_s = 0.0
        cells = 0
        for ch in tplan["chunks"]:
            cols = jax.lax.dynamic_slice_in_dim(
                nan0_dev, ch["start"], ch["width"], 1)
            t0 = time.time()
            counts = band_matmul(s_ind, _pad_rows_to(
                cols.astype(jnp.float32), npad), bt=bt, block=block)
            _ = float(np.asarray(counts.ravel()[0]))
            census_s += time.time() - t0
            table = htab.build_logsf_table(
                jnp.asarray(ch["K_dist"]), M, float(np.log(0.05)),
                R=ch["R"], S_max=ch["S_max"], C=ch["C"])
            _ = float(np.asarray(table.ravel()[0]))
            t0 = time.time()
            _nes, logsf_c, _bin = lookup_jit(
                table, counts, nsize, jnp.asarray(ch["colc"], jnp.int32),
                np.float32(np.log(0.05)), S_max=ch["S_max"], R=ch["R"],
                C=ch["C"])
            _ = float(np.asarray(logsf_c.ravel()[0]))
            lookup_s += time.time() - t0
            cells += counts.shape[0] * counts.shape[1]
            del counts, logsf_c
    census_flops = 2.0 * npad * (nt * block) * a
    stored_bytes = band_nbytes(n, band, itemsize=1) // (8 if pk else 1)
    out["census_steady_s"] = round(census_s, 3)
    out["census_tflops"] = round(census_flops / census_s / 1e12, 3)
    out["census_hbm_gbps"] = round(
        len(tplan["chunks"]) * stored_bytes / census_s / 1e9, 1)
    out["lookup_steady_s"] = round(lookup_s, 3)
    out["lookup_gcells_s"] = round(cells / lookup_s / 1e9, 3)
    del nan0_dev, nsize, s_ind

    # --- phase 4: quantitative permutation null at the same scale ---------
    qvals = rng.normal(size=(n, 1))
    qvals[rng.random(n) < 0.3, 0] = np.nan
    qattrs = pd.DataFrame(qvals, index=[f"n{i}" for i in range(n)],
                          columns=["q"])
    sf.load_attributes(attribute_file=qattrs)
    sf.run_pipeline(num_permutations=perms)
    t0 = time.time()
    sf.run_pipeline(num_permutations=perms)
    null_s = time.time() - t0
    V = int(np.isfinite(qvals).sum())
    # the null's banded contraction: compacted band width x perms x nodes
    out["null_e2e_steady_s"] = round(null_s, 3)
    out["null_gemm_tflops"] = round(
        2.0 * npad * (nt * block) * perms / null_s / 1e12, 3)
    out["null_valid_rows"] = V
    return out


def _custom_bench(args):
    """Non-headline scales: --nodes/--attributes/--binary/--permutations."""
    from safepy_tpu import SAFE

    rng = np.random.default_rng(0)
    n = args.nodes
    g, _coords = build_network(n=n, k=9, edge_budget=None, prefix="n")

    if args.binary:
        vals = (rng.random((n, args.attributes)) < 0.05).astype(float)
    else:
        vals = rng.normal(size=(n, args.attributes))
    attr = pd.DataFrame(vals, index=[f"n{i}" for i in range(n)],
                        columns=[f"a{i}" for i in range(args.attributes)])

    sf = SAFE(verbose=False)
    sf.random_seed = 1885
    if args.radius is not None:
        sf.neighborhood_radius = args.radius
    sf.load_network(network_file=g, node_key_attribute="key")

    def run():
        sf.load_attributes(attribute_file=attr)
        sf.run_pipeline(num_permutations=args.permutations)

    run()  # warm-up/compile
    t0 = time.time()
    run()
    wall = time.time() - t0

    # isolated APSP steady for the production path (banded when certified), so
    # the FW-vs-null split of the e2e number is visible
    apsp_s = None
    plan = next((p for p in sf._banded_cache.values() if p is not None), None)
    if plan is not None:
        from safepy_tpu.io.graph_arrays import graph_to_arrays
        from safepy_tpu.ops.apsp_banded import apsp_banded_unpermuted
        from safepy_tpu.ops.neighborhoods import inclusive_radius
        coords_arr, _e, _l, _w = graph_to_arrays(sf.graph)
        radius = inclusive_radius(sf.neighborhood_radius
                                  * (coords_arr[:, 0].max()
                                     - coords_arr[:, 0].min()))
        init, rank_dev, window = plan
        dist_b = apsp_banded_unpermuted(init, rank_dev, radius, window=window)
        _ = float(np.asarray(dist_b[0, 0]))
        t0 = time.time()
        dist_b = apsp_banded_unpermuted(init, rank_dev, radius, window=window)
        _ = float(np.asarray(dist_b[0, 0]))
        apsp_s = round(time.time() - t0, 4)

    print(json.dumps({
        "metric": "custom_e2e_wall_s",
        "value": round(wall, 4),
        "unit": "s",
        "vs_baseline": round(BASELINE_S / wall, 3),
        "detail": {"nodes": n, "edges": g.number_of_edges(),
                   "attributes": args.attributes, "binary": args.binary,
                   "num_permutations": args.permutations,
                   "apsp_steady_s": apsp_s,
                   "engine": ("band_storage"
                              if any(v is not None
                                     for v in sf._bandstore_cache.values())
                              else ("banded_window"
                                    if any(v is not None
                                           for v in sf._banded_cache.values())
                                    else "dense")),
                   "enriched": int((sf.nes_binary > 0).sum())},
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
