"""Band-storage scale battery, attempt 3 — reordered and probed.

1. 149,760- and 199,680-node quantitative pipelines (int8-compacted null).
2. GO-probe: 29,952 nodes x 2,048 binary attributes through the CHUNKED
   banded survival tail (isolates the chunked program from the 100k scale).
3. GO-scale 99,840 x 4,373 last (known worker-crash risk).
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from tpu_bandstore_scale import build_graph, run_safe, quant_attrs  # noqa: E402


def main():
    import jax
    import pandas as pd
    print(f"# devices: {jax.devices()}", flush=True)

    for n in (149760, 199680):
        try:
            g = build_graph(n)
            attrs = quant_attrs(n)
            radius = float(np.sqrt(125.0 / (np.pi * n)))
            sf, first, steady = run_safe(g, attrs, "auto", radius)
            plan = next(v for v in sf._bandstore_cache.values() if v)
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
        except Exception as e:
            print(json.dumps({"check": "scale", "nodes": n,
                              "failed": repr(e)[:300]}), flush=True)

    for n, a in ((29952, 2048), (99840, 4373)):
        try:
            g = build_graph(n)
            rng = np.random.default_rng(2)
            vals = (rng.random((n, a)) < 0.02).astype(np.float32)
            vals[rng.random((n, a)) < 0.05] = np.nan
            attrs = pd.DataFrame(vals, index=[f"n{i}" for i in range(n)],
                                 columns=[f"go{j}" for j in range(a)])
            radius = float(np.sqrt(125.0 / (np.pi * n)))
            sf, first, steady = run_safe(g, attrs, "band", radius,
                                         min_nodes=10000)
            print(json.dumps({
                "check": "go_scale", "nodes": n, "attributes": a,
                "radius": radius,
                "first_s": round(first, 2), "steady_s": round(steady, 3),
                "attrs_with_gt10_enriched": int(
                    (sf.attributes["num_neighborhoods_enriched"] > 10).sum()),
                "attr_chunk": sf._hypergeom_attr_chunk(n, a),
            }), flush=True)
            del sf, g, vals, attrs
        except Exception as e:
            print(json.dumps({"check": "go_scale", "nodes": n,
                              "failed": repr(e)[:300]}), flush=True)

    print("BANDSTORE SCALE3 DONE", flush=True)


if __name__ == "__main__":
    main()
