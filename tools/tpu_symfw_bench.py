"""Classic vs symmetric band FW on hardware.

Builds the standard benchmark geometric network, runs both window-relax
kernels (ops/apsp_bandstore._relax_skew_pallas vs _relax_skew_sym_pallas),
checks the thresholded indicators match, prints steady timings.

Usage: tools/tpu_run.sh tools/tpu_symfw_bench.py [n ...]
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from tpu_bandstore_scale import build_graph  # noqa: E402


def sync(x):
    return float(np.asarray(x.ravel()[0]))


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [29952, 99840]
    import jax
    import jax.numpy as jnp
    print(f"# devices: {jax.devices()}", flush=True)

    from safepy_tpu.ops import apsp_banded as banded
    from safepy_tpu.ops import apsp_bandstore as bst
    from safepy_tpu.ops.neighborhoods import inclusive_radius

    for n in sizes:
        g = build_graph(n)
        coords = np.array([[g.nodes[i]["x"], g.nodes[i]["y"]]
                           for i in range(n)], np.float64)
        edges = np.array(g.edges())
        w = np.hypot(*(coords[edges[:, 0]] - coords[edges[:, 1]]).T
                     ).astype(np.float32)
        nr = float(np.sqrt(125.0 / (np.pi * n))
                   * (coords[:, 0].max() - coords[:, 0].min()))
        order, band = banded.banded_order(coords, nr * (1 + 1e-5))
        rank = np.empty(n, np.int64)
        rank[order] = np.arange(n)
        pu, pv = rank[edges[:, 0]], rank[edges[:, 1]]
        bt, nb, width = bst.band_params(n, band)
        radius = inclusive_radius(nr)
        s0 = bst.band_init_from_edges(
            jnp.asarray(pu, jnp.int32), jnp.asarray(pv, jnp.int32),
            jnp.asarray(w), n=n, band=band)
        _ = sync(s0)
        print(json.dumps({"n": n, "band": int(band), "bt": bt,
                          "width": width}), flush=True)

        results = {}
        out = None
        for name, sym in (("classic", False), ("sym", True)):
            for rep in range(2):
                del out
                out = None
                t0 = time.time()
                out = bst.apsp_band_fw(s0, bt=bt, symmetric=sym)
                _ = sync(out)
                t = time.time() - t0
                print(json.dumps({"n": n, "kernel": name, "rep": rep,
                                  "s": round(t, 2)}), flush=True)
            ind = bst.band_threshold(out, radius)
            results[name] = ind
            del out
            out = None
        mism = int(np.asarray(jnp.sum(
            (results["classic"] != results["sym"]).astype(jnp.int32))))
        nnz = int(np.asarray(jnp.sum(results["classic"].astype(jnp.int32))))
        print(json.dumps({"n": n, "indicator_mismatches": mism,
                          "nnz": nnz}), flush=True)
        del results, s0


if __name__ == "__main__":
    main()
