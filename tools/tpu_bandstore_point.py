"""Run ONE band-storage scale point in its own process (a fatal TPU error is
sticky per process, so the battery drives this script once per point).

Usage: tpu_bandstore_point.py {canary | quant:<nodes> | go:<nodes>:<attrs>}
"""

import json
import sys
import time
import traceback

import numpy as np

sys.path.insert(0, "/root/repo")
from tpu_bandstore_scale import build_graph, run_safe, quant_attrs  # noqa: E402


def main():
    import jax
    import pandas as pd

    spec = sys.argv[1]
    print(f"# {spec} devices: {jax.devices()}", flush=True)

    if spec == "canary":
        from safepy_tpu.hbm import device_hbm_budget
        g = build_graph(800)
        sf, first, steady = run_safe(g, quant_attrs(800), "band", 0.1,
                                     perms=200, min_nodes=100)
        print(json.dumps({"check": "canary", "steady_s": round(steady, 3),
                          "enriched": int((sf.nes_binary > 0).sum()),
                          "hbm_bytes_limit": device_hbm_budget()}),
              flush=True)
        return

    kind, rest = spec.split(":", 1)
    if kind == "euclid":
        # scatter/UMAP-style euclidean neighborhoods at band-storage scale;
        # euclid:<n>[:<target>][:nodist][:bits|:nobits] — nodist rides the
        # int8-direct indicator band (euclidean_band_indicator; no f32 band
        # at all); bits/nobits force band_indicator_bits on/off (default
        # 'auto': BIT-packed above band_bits_min_bytes)
        parts = rest.split(":")
        n = int(parts[0])
        target = float(parts[1]) if len(parts) > 1 else 125.0
        nodist = "nodist" in parts[2:]
        bits = ("auto" if "bits" not in parts[2:] and "nobits" not in parts[2:]
                else "bits" in parts[2:])
        rng = np.random.default_rng(5)
        coords = rng.uniform(-1, 1, (n, 2))
        import networkx as nx
        from safepy_tpu import SAFE
        g = nx.Graph()
        g.add_nodes_from(range(n))
        for i in range(n):
            g.nodes[i]["label"] = g.nodes[i]["key"] = f"c{i}"
            g.nodes[i]["x"] = float(coords[i, 0])
            g.nodes[i]["y"] = float(coords[i, 1])
        vals = rng.normal(size=(n, 1))
        vals[rng.random(n) < 0.3, 0] = np.nan
        attrs = pd.DataFrame(vals, index=[f"c{i}" for i in range(n)],
                             columns=["q"])
        sf = SAFE(verbose=False)
        sf.random_seed = 17
        # auto-selected at real scale; FORCED below it so the CPU smoke still
        # exercises the band path even where it would not pay
        sf.apsp_mode = "auto" if n >= 32768 else "band"
        sf.keep_node_distances = not nodist
        sf.band_indicator_bits = bits
        sf.neighborhood_radius = float(np.sqrt(target / (np.pi * n)))
        sf.load_network(network_file=g, node_key_attribute="key")
        sf.load_attributes(attribute_file=attrs)
        t0 = time.time()
        sf.run_pipeline(node_distance_metric="euclidean",
                        num_permutations=1000)
        first = time.time() - t0
        t0 = time.time()
        sf.run_pipeline(node_distance_metric="euclidean",
                        num_permutations=1000)
        steady = time.time() - t0
        from safepy_tpu.ops.apsp_bandstore import BandedMatrix, band_nbytes
        assert isinstance(sf._neighborhoods_dev, BandedMatrix)
        band = int(sf._neighborhoods_dev.band)
        import jax.numpy as jnp
        packed = sf._neighborhoods_dev.data.dtype == jnp.uint8
        print(json.dumps({
            "check": "euclid_scale", "nodes": n,
            "target_neighbors": target, "keep_distances": not nodist,
            "packed_bits": bool(packed),
            "radius": sf.neighborhood_radius, "band": band,
            "band_i8_gb": round(band_nbytes(n, band) / 4e9, 2),
            "band_stored_gb": round(band_nbytes(
                n, band, itemsize=1) / (8e9 if packed else 1e9), 2),
            "dense_gb": round(4 * n * n / 1e9, 1),
            "first_s": round(first, 2), "steady_s": round(steady, 3),
            "enriched": int((sf.nes_binary > 0).sum())}), flush=True)
        return
    if kind == "hop":
        # non-geometric metric at band scale: hop-count ('shortpath')
        # neighborhoods served by the LANDMARK certificate
        # (ops/apsp_banded.graph_banded_order) — no Euclidean contract
        n = int(rest)
        t0 = time.time()
        g = build_graph(n)
        print(f"# graph built in {time.time() - t0:.1f} s", flush=True)
        attrs = quant_attrs(n)
        from safepy_tpu import SAFE
        sf = SAFE(verbose=False)
        sf.apsp_mode = "band"
        sf.random_seed = 17
        sf.load_network(network_file=g, node_key_attribute="key")
        sf.load_attributes(attribute_file=attrs)
        t0 = time.time()
        sf.run_pipeline(node_distance_metric="shortpath",
                        neighborhood_radius=2, num_permutations=1000)
        first = time.time() - t0
        t0 = time.time()
        sf.run_pipeline(node_distance_metric="shortpath",
                        neighborhood_radius=2, num_permutations=1000)
        steady = time.time() - t0
        from safepy_tpu.ops.apsp_bandstore import BandedMatrix, band_nbytes
        assert isinstance(sf._neighborhoods_dev, BandedMatrix)
        band = int(sf._neighborhoods_dev.band)
        print(json.dumps({
            "check": "hop_scale", "nodes": n, "band": band,
            "band_gb": round(band_nbytes(n, band) / 1e9, 2),
            "dense_gb": round(4 * n * n / 1e9, 1),
            "first_s": round(first, 2), "steady_s": round(steady, 3),
            "enriched": int((sf.nes_binary > 0).sum())}), flush=True)
        return
    if kind == "cross":
        # band/dense crossover probe (VERDICT r3 #7): the SAME graph +
        # quantitative null through (a) auto with the band gate closed —
        # the dense window-banded engine — and (b) the forced band-storage
        # engine; prints both steadies + observed-score agreement so the
        # auto threshold (SAFE.band_storage_min_nodes) is measured, not
        # hard-coded. cross:<nodes>[:<target>]
        parts = rest.split(":")
        n = int(parts[0])
        target = float(parts[1]) if len(parts) > 1 else 125.0
        t0 = time.time()
        g = build_graph(n)
        print(f"# graph built in {time.time() - t0:.1f} s", flush=True)
        attrs = quant_attrs(n)
        radius = float(np.sqrt(target / (np.pi * n)))
        sf_d, first_d, steady_d = run_safe(g, attrs, "auto", radius,
                                           min_nodes=10 ** 9)
        p_d = np.asarray(sf_d.pvalues_pos[:, 0])
        dense_engine = ("window-banded" if sf_d._banded_cache
                        and next(iter(sf_d._banded_cache.values()))
                        else "full")
        del sf_d
        sf_b, first_b, steady_b = run_safe(g, attrs, "band", radius,
                                           min_nodes=100)
        p_b = np.asarray(sf_b.pvalues_pos[:, 0])
        band = int(next(v for v in sf_b._bandstore_cache.values()
                        if v)["band"])
        print(json.dumps({
            "check": "crossover", "nodes": n, "target_neighbors": target,
            "band": band, "dense_engine": dense_engine,
            "dense_first_s": round(first_d, 2),
            "dense_steady_s": round(steady_d, 3),
            "band_first_s": round(first_b, 2),
            "band_steady_s": round(steady_b, 3),
            "band_speedup": round(steady_d / steady_b, 2),
            # f32-noise tie flips near count boundaries, in COUNT units
            "max_count_shift": int(round(1000 * float(
                np.nanmax(np.abs(p_b - p_d)))))}), flush=True)
        return
    if kind == "prec":
        # large-N null precision policy (VERDICT r3 #8): matmul_precision
        # 'highest' (f32, 6 bf16 passes) vs 'default' (1 bf16 pass) on the
        # SAME band-scale permutation null. Within a run the observed score
        # rides the identical GEMM as the permuted scores, so tie semantics
        # are internally consistent either way; this measures what the
        # cheaper pass buys and how far the p-values move. prec:<n>[:<tgt>]
        parts = rest.split(":")
        n = int(parts[0])
        target = float(parts[1]) if len(parts) > 1 else 125.0
        t0 = time.time()
        g = build_graph(n)
        print(f"# graph built in {time.time() - t0:.1f} s", flush=True)
        attrs = quant_attrs(n)
        radius = float(np.sqrt(target / (np.pi * n)))
        out = {"check": "precision", "nodes": n, "perms": 1000}
        res = {}
        for prec in ("highest", "default"):
            from safepy_tpu import SAFE
            sf = SAFE(verbose=False)
            sf.apsp_mode = "band"
            sf.band_storage_min_nodes = 100
            sf.matmul_precision = prec
            sf.random_seed = 17
            sf.neighborhood_radius = radius
            sf.load_network(network_file=g, node_key_attribute="key")
            sf.load_attributes(attribute_file=attrs)
            sf.run_pipeline(num_permutations=1000)
            t0 = time.time()
            sf.run_pipeline(num_permutations=1000)
            out[f"{prec}_steady_s"] = round(time.time() - t0, 3)
            res[prec] = (np.asarray(sf.pvalues_pos[:, 0]),
                         np.asarray(sf.pvalues_neg[:, 0]),
                         int((sf.nes_binary > 0).sum()))
            out[f"{prec}_enriched"] = res[prec][2]
            del sf
        # p-values are counts/P (NaN rows excluded): report the tie movement
        # in COUNT units — how many of the 1000 permutations flipped sides
        out["max_count_shift_pos"] = int(round(1000 * float(np.nanmax(np.abs(
            res["highest"][0] - res["default"][0])))))
        out["max_count_shift_neg"] = int(round(1000 * float(np.nanmax(np.abs(
            res["highest"][1] - res["default"][1])))))
        print(json.dumps(out), flush=True)
        return
    if kind == "sweepgo":
        # sweepgo:<nodes>:<attrs>:<t1>:<t2> — a RADIUS SWEEP in one process,
        # the primary use-case of band bt-bucketing (VERDICT r4 item 6):
        # both targets' certified bands land in one bt bucket, so the
        # second radius re-uses every compiled program in-process and its
        # first run costs ~ steady + the host banded-order rebuild.
        parts = rest.split(":")
        n, a = int(parts[0]), int(parts[1])
        t1, t2 = float(parts[2]), float(parts[3])
        t0 = time.time()
        g = build_graph(n)
        print(f"# graph built in {time.time() - t0:.1f} s", flush=True)
        rng = np.random.default_rng(2)
        sizes = np.exp(rng.uniform(np.log(5), np.log(0.03 * n), a))
        vals = (rng.random((n, a)) < (sizes / n)[None, :]).astype(np.float32)
        vals[rng.random((n, a)) < 0.05] = np.nan
        attrs = pd.DataFrame(vals, index=[f"n{i}" for i in range(n)],
                             columns=[f"go{j}" for j in range(a)])
        from safepy_tpu import SAFE
        sf = SAFE(verbose=False)
        sf.apsp_mode = "band"
        sf.band_storage_min_nodes = 10000
        sf.keep_node_distances = False
        sf.band_indicator_bits = True
        sf.random_seed = 17
        sf.neighborhood_radius = float(np.sqrt(t1 / (np.pi * n)))
        sf.load_network(network_file=g, node_key_attribute="key")
        sf.load_attributes(attribute_file=attrs)
        t0 = time.time()
        sf.run_pipeline()
        first1 = time.time() - t0
        t0 = time.time()
        sf.run_pipeline()
        steady1 = time.time() - t0
        band1 = int(sf._neighborhoods_dev.band)
        e1 = int((sf.attributes["num_neighborhoods_enriched"] > 10).sum())
        sf.neighborhood_radius = float(np.sqrt(t2 / (np.pi * n)))
        t0 = time.time()
        sf.run_pipeline()
        first2 = time.time() - t0
        band2 = int(sf._neighborhoods_dev.band)
        print(json.dumps({
            "check": "sweep_go", "nodes": n, "attributes": a,
            "targets": [t1, t2], "bands": [band1, band2],
            "engine": sf._hypergeom_engine_used,
            "first_s": round(first1, 2), "steady_s": round(steady1, 3),
            "fresh_radius_first_s": round(first2, 2),
            "attrs_gt10_t1": e1,
            "attrs_gt10_t2": int(
                (sf.attributes["num_neighborhoods_enriched"] > 10).sum())}),
            flush=True)
        return
    if kind == "sweepeuclid":
        # sweepeuclid:<n>:<t1>:<t2> — euclidean radius sweep in one process
        # (see sweepgo above).
        parts = rest.split(":")
        n = int(parts[0])
        t1, t2 = float(parts[1]), float(parts[2])
        rng = np.random.default_rng(5)
        coords = rng.uniform(-1, 1, (n, 2))
        import networkx as nx
        from safepy_tpu import SAFE
        g = nx.Graph()
        g.add_nodes_from(range(n))
        for i in range(n):
            g.nodes[i]["label"] = g.nodes[i]["key"] = f"c{i}"
            g.nodes[i]["x"] = float(coords[i, 0])
            g.nodes[i]["y"] = float(coords[i, 1])
        vals = rng.normal(size=(n, 1))
        vals[rng.random(n) < 0.3, 0] = np.nan
        attrs = pd.DataFrame(vals, index=[f"c{i}" for i in range(n)],
                             columns=["q"])
        sf = SAFE(verbose=False)
        sf.random_seed = 17
        sf.apsp_mode = "auto" if n >= 32768 else "band"
        sf.band_storage_min_nodes = min(32768, n)
        sf.keep_node_distances = False
        sf.band_indicator_bits = True
        sf.neighborhood_radius = float(np.sqrt(t1 / (np.pi * n)))
        sf.load_network(network_file=g, node_key_attribute="key")
        sf.load_attributes(attribute_file=attrs)
        t0 = time.time()
        sf.run_pipeline(node_distance_metric="euclidean",
                        num_permutations=1000)
        first1 = time.time() - t0
        t0 = time.time()
        sf.run_pipeline(node_distance_metric="euclidean",
                        num_permutations=1000)
        steady1 = time.time() - t0
        band1 = int(sf._neighborhoods_dev.band)
        sf.neighborhood_radius = float(np.sqrt(t2 / (np.pi * n)))
        t0 = time.time()
        sf.run_pipeline(node_distance_metric="euclidean",
                        num_permutations=1000)
        first2 = time.time() - t0
        print(json.dumps({
            "check": "sweep_euclid", "nodes": n, "targets": [t1, t2],
            "bands": [band1, int(sf._neighborhoods_dev.band)],
            "first_s": round(first1, 2), "steady_s": round(steady1, 3),
            "fresh_radius_first_s": round(first2, 2),
            "enriched_t2": int((sf.nes_binary > 0).sum())}), flush=True)
        return
    if kind == "guardfail":
        # guardfail:<nodes>:<attrs>[:<target>] — EXPECT the facade's
        # pre-dispatch HBM guard to refuse the band GO pipeline with a clean
        # ValueError (never handing XLA an allocation that wedges the
        # backend), then PROVE the process backend is still healthy by
        # running a small pipeline in the same process. The r4 behavior at
        # an over-budget point was a fatal OOM that poisoned every later op.
        parts = rest.split(":")
        n, a = int(parts[0]), int(parts[1])
        target = float(parts[2]) if len(parts) > 2 else 125.0
        budget = next((int(p.split("=", 1)[1]) for p in parts
                       if p.startswith("budget=")), None)
        t0 = time.time()
        g = build_graph(n)
        print(f"# graph built in {time.time() - t0:.1f} s", flush=True)
        rng = np.random.default_rng(2)
        sizes = np.exp(rng.uniform(np.log(5), np.log(0.03 * n), a))
        vals = (rng.random((n, a)) < (sizes / n)[None, :]).astype(np.float32)
        vals[rng.random((n, a)) < 0.05] = np.nan
        attrs = pd.DataFrame(vals, index=[f"n{i}" for i in range(n)],
                             columns=[f"go{j}" for j in range(a)])
        radius = float(np.sqrt(target / (np.pi * n)))
        err = None
        t0 = time.time()
        try:
            run_safe(g, attrs, "band", radius, min_nodes=10000,
                     keep_node_distances=False, band_indicator_bits=True,
                     hbm_budget_bytes=budget)
        except ValueError as e:
            err = str(e)
        guard_s = time.time() - t0
        assert err is not None, "expected the HBM guard to refuse this point"
        # backend must still be fully usable after the refusal
        g2 = build_graph(800)
        sf2, _, steady2 = run_safe(g2, quant_attrs(800), "band", 0.1,
                                   perms=200, min_nodes=100)
        print(json.dumps({
            "check": "guardfail", "nodes": n, "attributes": a,
            "target_neighbors": target, "refused_s": round(guard_s, 2),
            "error": err[:300],
            "backend_alive_steady_s": round(steady2, 3),
            "backend_alive_enriched": int((sf2.nes_binary > 0).sum())}),
            flush=True)
        return
    if kind == "quant":
        parts = rest.split(":")
        n = int(parts[0])
        # optional mean-neighborhood-size target (default 125, the battery
        # convention): the band grows ~linearly with the radius, and the FW
        # needs ~2x the band store in HBM — at 299,520 nodes the 125-target
        # band (9.27 GB) OOMs one 16 GB v5e while ~60 fits
        target = float(parts[1]) if len(parts) > 1 else 125.0
        nodist = "nodist" in parts[2:]
        bits = ("auto" if "bits" not in parts[2:] and "nobits" not in parts[2:]
                else "bits" in parts[2:])
        t0 = time.time()
        g = build_graph(n)
        print(f"# graph built in {time.time() - t0:.1f} s", flush=True)
        attrs = quant_attrs(n)
        radius = float(np.sqrt(target / (np.pi * n)))
        sf, first, steady = run_safe(g, attrs, "auto", radius,
                                     keep_node_distances=not nodist,
                                     band_indicator_bits=bits)
        plan = next(v for v in sf._bandstore_cache.values() if v)
        from safepy_tpu.ops.apsp_bandstore import band_nbytes
        import jax.numpy as jnp
        print(json.dumps({
            "check": "scale", "nodes": n, "radius": radius,
            "target_neighbors": target, "keep_distances": not nodist,
            "packed_bits": bool(sf._neighborhoods_dev.data.dtype
                                == jnp.uint8),
            "band": int(plan["band"]),
            "band_gb": round(band_nbytes(n, plan["band"]) / 1e9, 2),
            "dense_gb": round(4 * n * n / 1e9, 1),
            "first_s": round(first, 2), "steady_s": round(steady, 3),
            "enriched": int((sf.nes_binary > 0).sum())}), flush=True)
    else:
        # go:<nodes>:<attrs>[:<target>][:nodist][:bits|:nobits]
        parts = rest.split(":")
        n, a = int(parts[0]), int(parts[1])
        target = float(parts[2]) if len(parts) > 2 and parts[2].replace(
            ".", "", 1).isdigit() else 125.0
        extras = parts[2:]
        nodist = "nodist" in extras
        bits = ("auto" if "bits" not in extras and "nobits" not in extras
                else "bits" in extras)
        t0 = time.time()
        g = build_graph(n)
        print(f"# graph built in {time.time() - t0:.1f} s", flush=True)
        rng = np.random.default_rng(2)
        # realistic GO term-size distribution: heavy-tailed (most terms tiny)
        # — real GO-BP has median term size ~10 and a long tail; the K-sorted
        # chunk driver's iteration bounds depend on it
        sizes = np.exp(rng.uniform(np.log(5), np.log(0.03 * n), a))
        vals = (rng.random((n, a)) < (sizes / n)[None, :]).astype(np.float32)
        vals[rng.random((n, a)) < 0.05] = np.nan
        attrs = pd.DataFrame(vals, index=[f"n{i}" for i in range(n)],
                             columns=[f"go{j}" for j in range(a)])
        radius = float(np.sqrt(target / (np.pi * n)))
        sf, first, steady = run_safe(g, attrs, "band", radius,
                                     min_nodes=10000,
                                     keep_node_distances=not nodist,
                                     band_indicator_bits=bits)
        import jax.numpy as jnp
        from safepy_tpu.ops.apsp_bandstore import band_nbytes
        band = int(sf._neighborhoods_dev.band)
        print(json.dumps({
            "check": "go_scale", "nodes": n, "attributes": a,
            "radius": radius, "target_neighbors": target,
            "keep_distances": not nodist,
            "packed_bits": bool(sf._neighborhoods_dev.data.dtype
                                == jnp.uint8),
            # ALWAYS check the engine before trusting a number (CLAUDE.md):
            # the f64 loop fallback is ~20x the table engine at GO scale
            "engine": sf._hypergeom_engine_used,
            "band": band,
            "fw_f32_band_gb": round(band_nbytes(n, band) / 1e9, 2),
            # logsf residency the pre-dispatch HBM plan admitted (r5):
            # 'f16'/'host' mark points past the f32-resident census wall
            "logsf_out": (sf._hbm_plan_last or {}).get("logsf_out"),
            # slot-loop unroll the census planner chose (r5g: group*cell
            # gather outputs stay live per lookup step — the term that
            # OOM'd 399,360@80 under the old always-8 behavior)
            "lookup_group": (sf._hbm_plan_last or {}).get("lookup_group"),
            "census_peak_gb": round(
                ((sf._hbm_plan_last or {}).get("census_peak") or 0) / 1e9, 2),
            "first_s": round(first, 2),
            "steady_s": round(steady, 3),
            "attrs_with_gt10_enriched": int(
                (sf.attributes["num_neighborhoods_enriched"] > 10).sum()),
            "attr_chunk": sf._hypergeom_attr_chunk(n, a)}), flush=True)
        from safepy_tpu import hbm as _hbm
        if _hbm.trace_active() and _hbm.HBM_TRACE:
            # calibration payload: REAL allocator peaks per phase boundary
            # (peak_bytes_in_use is cumulative; the rise between samples
            # attributes it) vs the model's admitted plan
            gb = 1e9
            tr = _hbm.HBM_TRACE
            chunk_peaks = [t for t in tr if t["tag"].startswith("census:")]
            # peak_bytes_in_use is cumulative across the process: only the
            # FIRST run's samples attribute phases cleanly (later runs'
            # samples carry the historical max)
            phases = {}
            for t in tr:
                if (not t["tag"].startswith("census:chunk")
                        and t["tag"] not in phases):
                    phases[t["tag"]] = round(t["peak_bytes_in_use"] / gb, 3)
            plan = sf._hbm_plan_last or {}
            print(json.dumps({
                "check": "hbm_trace", "nodes": n, "attributes": a,
                "phase_peak_gb": phases,
                "census_chunk_peak_gb": round(max(
                    (t["peak_bytes_in_use"] for t in chunk_peaks),
                    default=0) / gb, 3),
                "census_chunk_inuse_max_gb": round(max(
                    (t["bytes_in_use"] for t in chunk_peaks),
                    default=0) / gb, 3),
                "modeled_gb": {k: round((plan.get(k) or 0) / gb, 3)
                               for k in ("prep_peak", "relax_peak",
                                         "census_peak")},
                "samples": len(tr)}), flush=True)


if __name__ == "__main__":
    try:
        main()
    except Exception:
        traceback.print_exc()
        sys.exit(1)
