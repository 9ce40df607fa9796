"""Band-storage engine on hardware: correctness cross-check + scale points.

Run with tools/tpu_run.sh (single-tenant chip). Prints one JSON line per
measurement:

  1. small-n Pallas-vs-jnp band FW equality on device;
  2. 20k cross-check: band-storage pipeline vs the dense window-banded engine
     (identical observed scores / neighborhood stats);
  3. scale points 50k / 100k nodes — networks whose dense (N, N) matrices
     (10 / 40 GB) cannot exist on one chip — with the radius scaled to hold
     the mean neighborhood size roughly constant (the physically meaningful
     scaling: SAFE neighborhoods are local).
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def build_graph(n, k=9, seed=0):
    import networkx as nx
    from scipy.spatial import cKDTree
    from safepy_tpu.io.layout import calculate_edge_lengths

    rng = np.random.default_rng(seed)
    coords = rng.uniform(-1, 1, (n, 2))
    _, nn = cKDTree(coords).query(coords, k=k)
    src = np.repeat(np.arange(n), k - 1)
    dst = nn[:, 1:].ravel()
    lo = np.minimum(src, dst)
    hi = np.maximum(src, dst)
    edges = np.unique(np.stack([lo, hi], 1), axis=0)

    g = nx.Graph()
    g.add_nodes_from(range(n))
    g.add_edges_from(edges)
    for i in range(n):
        g.nodes[i]["label"] = g.nodes[i]["key"] = f"n{i}"
        g.nodes[i]["x"] = float(coords[i, 0])
        g.nodes[i]["y"] = float(coords[i, 1])
    calculate_edge_lengths(g, verbose=False)
    return g


def run_safe(g, attrs, mode, radius, perms=1000, min_nodes=32768,
             keep_node_distances=True, band_indicator_bits="auto",
             hbm_budget_bytes=None):
    from safepy_tpu import SAFE

    sf = SAFE(verbose=False)
    sf.apsp_mode = mode
    sf.band_storage_min_nodes = min_nodes
    sf.keep_node_distances = keep_node_distances
    sf.band_indicator_bits = band_indicator_bits
    if hbm_budget_bytes is not None:
        sf.hbm_budget_bytes = int(hbm_budget_bytes)
    sf.neighborhood_radius = radius
    sf.random_seed = 17
    sf.load_network(network_file=g, node_key_attribute="key")
    sf.load_attributes(attribute_file=attrs)
    t0 = time.time()
    sf.run_pipeline(num_permutations=perms)
    first = time.time() - t0
    t0 = time.time()
    sf.run_pipeline(num_permutations=perms)
    steady = time.time() - t0
    return sf, first, steady


def quant_attrs(n, seed=1):
    import pandas as pd
    rng = np.random.default_rng(seed)
    vals = rng.normal(size=(n, 1))
    vals[rng.random(n) < 0.3, 0] = np.nan
    return pd.DataFrame(vals, index=[f"n{i}" for i in range(n)],
                        columns=["q"])


def main():
    import jax
    print(f"# devices: {jax.devices()}", flush=True)

    # 1. device Pallas == jnp on the band FW (small, fast)
    import jax.numpy as jnp
    from safepy_tpu.ops import apsp_banded as ab
    from safepy_tpu.ops import apsp_bandstore as bs

    rng = np.random.default_rng(0)
    coords = rng.uniform(-1, 1, (640, 2))
    from scipy.spatial import cKDTree
    _, nn = cKDTree(coords).query(coords, k=7)
    pairs = sorted({(min(i, int(j)), max(i, int(j)))
                    for i in range(640) for j in nn[i, 1:]})
    e = np.array(pairs)
    w = np.hypot(coords[e[:, 0], 0] - coords[e[:, 1], 0],
                 coords[e[:, 0], 1] - coords[e[:, 1], 1])
    nr = 0.1 * (coords[:, 0].max() - coords[:, 0].min())
    order, band = ab.banded_order(coords, nr * (1 + 1e-5))
    rank = np.empty(640, np.int64)
    rank[order] = np.arange(640)
    pe = rank[e]
    s0 = bs.band_init_from_edges(jnp.asarray(pe[:, 0], jnp.int32),
                                 jnp.asarray(pe[:, 1], jnp.int32),
                                 jnp.asarray(w, jnp.float32),
                                 n=640, band=band, block=128)
    bt = band // 128 + 1
    got = np.asarray(bs.apsp_band_fw(s0, bt=bt, use_pallas=True))
    want = np.asarray(bs.apsp_band_fw(s0, bt=bt, use_pallas=False))
    finite = np.isfinite(want)
    err = float(np.abs(np.where(finite, got - want, 0)).max())
    assert (np.isfinite(got) == finite).all(), "inf pattern mismatch"
    print(json.dumps({"check": "pallas_vs_jnp_band_fw", "n": 640,
                      "max_err": err}), flush=True)
    assert err <= 1e-5

    # 2. 20k cross-check: band storage vs the dense window-banded engine
    n = 19968
    g = build_graph(n)
    attrs = quant_attrs(n)
    radius = float(np.sqrt(125.0 / (np.pi * n)))
    sf_dense, dfirst, dsteady = run_safe(g, attrs, "auto", radius)
    sf_band, bfirst, bsteady = run_safe(g, attrs, "band", radius)
    ns_err = float(np.nanmax(np.abs(sf_band.ns - sf_dense.ns)))
    stats = {
        "check": "band_vs_dense_20k",
        "nodes": n, "radius": radius,
        "ns_max_err": ns_err,
        "dense_first_s": round(dfirst, 2), "dense_steady_s": round(dsteady, 3),
        "band_first_s": round(bfirst, 2), "band_steady_s": round(bsteady, 3),
        "band": int(next(iter(sf_band._bandstore_cache.values()))["band"]),
    }
    print(json.dumps(stats), flush=True)
    assert ns_err <= 1e-4, ns_err
    del sf_dense, sf_band

    # 3. scale points: dense N^2 impossible on one chip
    for n in (49920, 99840):
        g = build_graph(n)
        attrs = quant_attrs(n)
        radius = float(np.sqrt(125.0 / (np.pi * n)))
        sf, first, steady = run_safe(g, attrs, "auto", radius)
        plan = next(iter(sf._bandstore_cache.values()))
        from safepy_tpu.ops.apsp_bandstore import band_nbytes
        print(json.dumps({
            "check": "scale", "nodes": n, "radius": radius,
            "band": int(plan["band"]),
            "band_gb": round(band_nbytes(n, plan["band"]) / 1e9, 2),
            "dense_gb": round(4 * n * n / 1e9, 1),
            "first_s": round(first, 2), "steady_s": round(steady, 3),
            "enriched": int((sf.nes_binary > 0).sum()),
        }), flush=True)
        del sf, g

    print("BANDSTORE SCALE OK", flush=True)


if __name__ == "__main__":
    main()
