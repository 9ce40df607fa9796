"""Band engine past one chip: >=200k nodes through the row-sharded band
pipeline on the 8-device virtual CPU mesh.

The single-chip band engine tops out ~150-180k nodes on a 16 GB v5e (the band
plus pipeline working set); parallel/band_sharded.py row-shards the band so
HBM and compute scale with the mesh. No multi-chip TPU hardware is reachable
from this image, so this drives the FULL sharded path (host staging of the
O(E) init, sharded FW, compaction, null, un-permute) at a 219,648-node scale
on 8 virtual CPU devices and verifies neighborhoods against a sampled scipy
Dijkstra oracle.

Usage:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
      python tools/mesh_band_scale.py [n]
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


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 219_648
    import jax
    import networkx as nx
    import pandas as pd
    from jax.sharding import Mesh

    from safepy_tpu import SAFE
    from safepy_tpu.io.layout import calculate_edge_lengths
    from safepy_tpu.ops.apsp_bandstore import BandedMatrix, band_nbytes

    devs = jax.devices()
    print(f"# {len(devs)} devices: {devs[0].platform}", flush=True)

    rng = np.random.default_rng(0)
    coords = rng.uniform(-1, 1, (n, 2))
    from scipy.spatial import cKDTree
    _, nn = cKDTree(coords).query(coords, k=7)
    src = np.repeat(np.arange(n), 6)
    dst = nn[:, 1:].ravel()
    lo, hi = np.minimum(src, dst), np.maximum(src, dst)
    edges = np.unique(np.stack([lo, hi], 1), axis=0)

    g = nx.Graph()
    g.add_nodes_from(range(n))
    g.add_edges_from(edges)
    for i in range(n):
        g.nodes[i]["label"] = g.nodes[i]["key"] = f"n{i}"
        g.nodes[i]["x"] = float(coords[i, 0])
        g.nodes[i]["y"] = float(coords[i, 1])
    calculate_edge_lengths(g, verbose=False)

    vals = rng.normal(size=(n, 1))
    vals[rng.random(n) < 0.3, 0] = np.nan
    attrs = pd.DataFrame(vals, index=[f"n{i}" for i in range(n)],
                         columns=["q"])

    sf = SAFE(verbose=False)
    sf.random_seed = 17
    # tiny neighborhoods keep the CPU-mesh FW tractable; the bookkeeping
    # (ghost rows, shard origins, compaction staircase) is scale-exact
    sf.neighborhood_radius = float(np.sqrt(8.0 / (np.pi * n)))
    sf.mesh = Mesh(np.array(devs), ("data",))
    sf.load_network(network_file=g, node_key_attribute="key")
    sf.load_attributes(attribute_file=attrs)

    t0 = time.time()
    sf.run_pipeline(num_permutations=16)
    first = time.time() - t0
    t0 = time.time()
    sf.run_pipeline(num_permutations=16)
    wall = time.time() - t0

    bm = sf._neighborhoods_dev
    assert isinstance(bm, BandedMatrix), type(bm)
    total_gb = band_nbytes(n, bm.band) / 1e9
    print(json.dumps({
        "check": "mesh_band_scale", "nodes": n, "edges": len(edges),
        "devices": len(devs), "band": int(bm.band),
        "band_gb_total_f32_equiv": round(total_gb, 2),
        "band_gb_per_device": round(total_gb / len(devs), 3),
        "dense_gb": round(4.0 * n * n / 1e9, 1),
        "first_s": round(first, 1), "steady_s": round(wall, 2),
        "enriched": int((sf.nes_binary > 0).sum())}), flush=True)

    # sampled Dijkstra oracle: 40 random sources, exact within-radius sets
    from scipy.sparse import coo_matrix
    from scipy.sparse.csgraph import dijkstra
    from safepy_tpu.ops.neighborhoods import inclusive_radius

    w = np.hypot(coords[edges[:, 0], 0] - coords[edges[:, 1], 0],
                 coords[edges[:, 0], 1] - coords[edges[:, 1], 1])
    gsp = coo_matrix((np.concatenate([w, w]),
                      (np.concatenate([edges[:, 0], edges[:, 1]]),
                       np.concatenate([edges[:, 1], edges[:, 0]]))),
                     shape=(n, n)).tocsr()
    x = coords[:, 0]
    r = float(inclusive_radius(
        sf.neighborhood_radius * (x.max() - x.min())))
    sources = rng.choice(n, 40, replace=False)
    d_ref = dijkstra(gsp, indices=sources, limit=r * 1.001)

    nbr = sf.neighborhoods_sparse()
    mismatches = 0
    for row, s in enumerate(sources):
        want = set(np.flatnonzero(d_ref[row] <= r))
        got = set(nbr[s].indices) | {s}
        mismatches += len(want ^ got)
    print(json.dumps({"check": "sampled_dijkstra_oracle",
                      "sources": len(sources),
                      "mismatched_members": mismatches}), flush=True)
    assert mismatches == 0


if __name__ == "__main__":
    main()
