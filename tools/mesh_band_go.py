"""GO-binary enrichment PAST one chip: the row-sharded class-table engine
(parallel/band_sharded.hypergeom_band_table_sharded) at a single-chip-
impossible (nodes, attributes) configuration, on the 8-device virtual mesh.

Companion to tools/mesh_band_scale.py (quantitative null). Two halves:

  1. ANALYTIC per-shard HBM at the TRUE target-125 configuration — the band
     certificate is computed for the real radius and the resident per-shard
     bytes (f32 FW slab + ghost rows, packed indicator, int8 annotations,
     two (n, A) outputs) are asserted under the 16 GB v5e budget, so the
     sharded engine demonstrably starts where one chip ends
     (tools/r4*_results.log records the single-chip wall);
  2. an EXECUTED pipeline at the same (nodes, attributes) with a reduced
     radius (the full-width FW is ~1e16 min-plus ops — days on this image's
     single CPU core; the bookkeeping, sharding specs, chunk streaming, and
     engine selection are radius-independent), verified against an exact
     per-node scipy hypergeometric oracle on sampled rows.

Usage:
  python tools/mesh_band_go.py [n] [a] [cpu_target]
"""

import json
import os
import sys
import time

# sitecustomize registers the axon TPU plugin AT INTERPRETER START whenever
# PALLAS_AXON_POOL_IPS is set — env tweaks here are too late and the run
# would contend for the single-tenant chip. Re-exec with a clean env.
if os.environ.get("PALLAS_AXON_POOL_IPS") or os.environ.get(
        "JAX_PLATFORMS", "").strip().lower() != "cpu":
    env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="")
    if "host_platform_device_count" not in env.get("XLA_FLAGS", ""):
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                            + " --xla_force_host_platform_device_count=8")
    os.execve(sys.executable, [sys.executable] + sys.argv, env)
if "host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

HBM_GB = 16.0


def analytic_shard_plan(coords, n, a, ndev, target=125.0):
    """Per-shard resident bytes at the TRUE target-neighbor radius."""
    from safepy_tpu.ops import apsp_banded as ab
    from safepy_tpu.ops.neighborhoods import inclusive_radius

    ext = float(coords[:, 0].max() - coords[:, 0].min())
    r = inclusive_radius(float(np.sqrt(target / (np.pi * n))) * ext)
    _, band = ab.banded_order(coords, r * (1 + 1e-5))
    bt = band // 128 + 1
    width = (2 * bt + 1) * 128
    rows_pad = -(-n // 128) * 128 + 2 * bt * 128
    local_rows = -(-rows_pad // (128 * ndev)) * 128  # row-sharded slab
    ghost = 2 * bt * 128                             # halo rows per shard
    per_shard = dict(
        fw_f32_slab_gb=(local_rows + ghost) * width * 4 / 1e9,
        packed_indicator_gb=(local_rows + ghost) * width / 8 / 1e9,
        int8_annotations_gb=rows_pad * a / ndev / 1e9,  # row-sharded operand
        logsf_f32_out_gb=n * a * 4 / ndev / 1e9,
        bin_int8_out_gb=n * a / ndev / 1e9,
    )
    per_shard["total_gb"] = sum(per_shard.values())
    return dict(band=int(band), width=int(width), radius=float(r),
                single_chip_fw_f32_gb=round(rows_pad * width * 4 / 1e9, 2),
                per_shard={k: round(float(v), 3)
                           for k, v in per_shard.items()})


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 249_600
    a = int(sys.argv[2]) if len(sys.argv) > 2 else 4373
    cpu_target = float(sys.argv[3]) if len(sys.argv) > 3 else 8.0

    import jax
    import pandas as pd
    from jax.sharding import Mesh

    from safepy_tpu import SAFE
    from tpu_bandstore_scale import build_graph

    devs = jax.devices()
    ndev = len(devs)
    print(f"# {ndev} devices: {devs[0].platform}", flush=True)

    t0 = time.time()
    g = build_graph(n)
    coords = np.array([[g.nodes[i]["x"], g.nodes[i]["y"]] for i in g])
    print(f"# graph built in {time.time() - t0:.1f} s", flush=True)

    # ---- half 1: the true-config per-shard HBM plan -----------------------
    shard_plan = analytic_shard_plan(coords, n, a, ndev)
    print(json.dumps({"check": "per_shard_hbm", "nodes": n, "attributes": a,
                      "devices": ndev, **shard_plan}), flush=True)
    assert shard_plan["per_shard"]["total_gb"] < HBM_GB, shard_plan

    # ---- half 2: executed sharded pipeline at (n, a), reduced radius ------
    rng = np.random.default_rng(2)
    sizes = np.exp(rng.uniform(np.log(5), np.log(0.03 * n), a))
    vals = (rng.random((n, a)) < (sizes / n)[None, :]).astype(np.float32)
    vals[rng.random((n, a)) < 0.05] = np.nan
    attrs = pd.DataFrame(vals, index=[f"n{i}" for i in range(n)],
                         columns=[f"go{j}" for j in range(a)])

    sf = SAFE(verbose=False)
    sf.apsp_mode = "band"
    sf.band_storage_min_nodes = 100
    sf.keep_node_distances = False
    sf.random_seed = 17
    sf.neighborhood_radius = float(np.sqrt(cpu_target / (np.pi * n)))
    sf.mesh = Mesh(np.array(devs), ("data",))
    sf.load_network(network_file=g, node_key_attribute="key")
    sf.load_attributes(attribute_file=attrs)

    t0 = time.time()
    sf.run_pipeline()
    wall = time.time() - t0
    engine = sf._hypergeom_engine_used
    print(json.dumps({
        "check": "mesh_band_go", "nodes": n, "attributes": a,
        "devices": ndev, "engine": engine,
        "band": int(sf._neighborhoods_dev.band),
        "wall_s": round(wall, 1),
        "attrs_with_gt10_enriched": int(
            (sf.attributes["num_neighborhoods_enriched"] > 10).sum())}),
        flush=True)
    assert engine == "table-band-sharded", engine

    # exact oracle on sampled rows: per-node scipy hypergeom over ALL attrs
    from scipy.sparse import coo_matrix
    from scipy.sparse.csgraph import dijkstra
    from scipy.stats import hypergeom
    from safepy_tpu.ops.neighborhoods import inclusive_radius

    edges = np.array(g.edges())
    w = np.hypot(coords[edges[:, 0], 0] - coords[edges[:, 1], 0],
                 coords[edges[:, 0], 1] - coords[edges[:, 1], 1])
    gsp = coo_matrix((np.concatenate([w, w]),
                      (np.concatenate([edges[:, 0], edges[:, 1]]),
                       np.concatenate([edges[:, 1], edges[:, 0]]))),
                     shape=(n, n)).tocsr()
    r = float(inclusive_radius(
        sf.neighborhood_radius
        * (coords[:, 0].max() - coords[:, 0].min())))
    sources = rng.choice(n, 8, replace=False)
    d_ref = dijkstra(gsp, indices=sources, limit=r * 1.001)

    nan0 = np.where(np.isnan(vals), 0.0, vals)
    K = nan0.sum(0)
    M = int((~np.isnan(vals)).any(1).sum())
    got_p = np.asarray(sf.pvalues_pos[sources])
    worst = 0.0
    for row, s in enumerate(sources):
        members = np.flatnonzero(d_ref[row] <= r)
        k = nan0[members].sum(0)
        want = hypergeom.sf(k - 1, M, K.astype(int), len(members))
        worst = max(worst, float(np.abs(got_p[row] - want).max()))
    print(json.dumps({"check": "hypergeom_oracle", "sources": len(sources),
                      "max_p_err": worst}), flush=True)
    assert worst < 1e-6, worst


if __name__ == "__main__":
    main()
