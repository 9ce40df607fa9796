"""Band-storage engine, round 2 of scale points.

1. GO-scale hypergeometric at ~100k nodes: 4,373 binary attributes through
   the attr-chunked banded survival tail (the reference's flagship batch
   case at a scale its dense matrices cannot touch).
2. 150k-node quantitative pipeline (1,000-permutation null).
3. Opportunistic 200k-node attempt (HBM-marginal: ~3 band-sized arrays live).

Run via tools/tpu_run.sh; prints one JSON line per point.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from tpu_bandstore_scale import build_graph, run_safe  # noqa: E402


def main():
    import jax
    import pandas as pd
    print(f"# devices: {jax.devices()}", flush=True)

    # 1. GO-scale binary at ~100k nodes
    n = 99840
    g = build_graph(n)
    rng = np.random.default_rng(2)
    a = 4373
    vals = (rng.random((n, a)) < 0.02).astype(np.float32)
    vals[rng.random((n, a)) < 0.05] = np.nan
    attrs = pd.DataFrame(vals, index=[f"n{i}" for i in range(n)],
                         columns=[f"go{j}" for j in range(a)])
    radius = float(np.sqrt(125.0 / (np.pi * n)))
    sf, first, steady = run_safe(g, attrs, "auto", radius, perms=1000)
    enriched_attrs = int(
        (sf.attributes["num_neighborhoods_enriched"] > 10).sum())
    print(json.dumps({
        "check": "go_scale_100k", "nodes": n, "attributes": a,
        "radius": radius,
        "first_s": round(first, 2), "steady_s": round(steady, 3),
        "attrs_with_gt10_enriched": enriched_attrs,
        "attr_chunk": sf._hypergeom_attr_chunk(n, a),
    }), flush=True)
    del sf, g, vals, attrs

    # 2/3. larger quantitative scale points
    for n in (149760, 199680):
        try:
            g = build_graph(n)
            from tpu_bandstore_scale import quant_attrs
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
        except Exception as e:  # HBM-marginal points may OOM — report, go on
            print(json.dumps({"check": "scale", "nodes": n,
                              "failed": repr(e)[:300]}), flush=True)

    print("BANDSTORE SCALE2 DONE", flush=True)


if __name__ == "__main__":
    main()
