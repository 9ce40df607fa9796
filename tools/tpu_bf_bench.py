"""Band APSP engines head-to-head on hardware: FW vs sparse Bellman-Ford.

Builds the standard benchmark geometric network at n nodes (and optionally a
hop-metric variant), runs both band relaxations, checks the thresholded
indicators are identical, and prints steady timings + iteration counts.

Usage: tools/tpu_run.sh tools/tpu_bf_bench.py [n] [metric]
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
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 99840
    metric = sys.argv[2] if len(sys.argv) > 2 else "euclid"
    import jax
    import jax.numpy as jnp
    print(f"# devices: {jax.devices()}", flush=True)

    from safepy_tpu.ops import apsp_banded as banded
    from safepy_tpu.ops import apsp_bandstore as bst
    from safepy_tpu.ops.neighborhoods import inclusive_radius

    t0 = time.time()
    g = build_graph(n)
    coords = np.array([[g.nodes[i]["x"], g.nodes[i]["y"]]
                       for i in range(n)], np.float64)
    edges = np.array(g.edges())
    if metric == "hop":
        w = np.ones(len(edges), np.float32)
        nr = 3.0
        order, band = banded.graph_banded_order(n, edges, w, nr * (1 + 1e-5))
    else:
        w = np.hypot(*(coords[edges[:, 0]] - coords[edges[:, 1]]).T
                     ).astype(np.float32)
        nr = float(np.sqrt(125.0 / (np.pi * n))
                   * (coords[:, 0].max() - coords[:, 0].min()))
        order, band = banded.banded_order(coords, nr * (1 + 1e-5))
    rank = np.empty(n, np.int64)
    rank[order] = np.arange(n)
    pu, pv = rank[edges[:, 0]], rank[edges[:, 1]]
    block = 128
    bt, nb, width = bst.band_params(n, band, block)
    slots = bst.band_bf_slots(pu, pv, w, n=n, band=band, block=block)
    nbr, dlt, wgt, S = slots
    print(json.dumps({"phase": "host", "s": round(time.time() - t0, 1),
                      "band": int(band), "bt": bt, "width": width, "S": S,
                      "max_iters": bst.bf_max_iters(n, band, S, block)}),
          flush=True)

    u_d = jnp.asarray(pu, jnp.int32)
    v_d = jnp.asarray(pv, jnp.int32)
    w_d = jnp.asarray(w)
    radius = inclusive_radius(nr)

    def init():
        return bst.band_init_from_edges(u_d, v_d, w_d, n=n, band=band,
                                        block=block)

    s0 = init()
    _ = sync(s0)

    # FW reference
    for rep in range(2):
        t0 = time.time()
        fw = bst.apsp_band_fw(s0, bt=bt, block=block)
        _ = sync(fw)
        fw_s = time.time() - t0
        print(json.dumps({"phase": f"fw_rep{rep}", "s": round(fw_s, 2)}),
              flush=True)
    ind_fw = bst.band_threshold(fw, radius)
    nnz_fw = int(np.asarray(jnp.sum(ind_fw.astype(jnp.int32))))
    del fw

    nbr_d = jnp.asarray(nbr)
    dlt_d = jnp.asarray(dlt)
    wgt_d = jnp.asarray(wgt)
    mi = bst.bf_max_iters(n, band, S, block)
    for group in (4, 8):
        bf = conv = iters = None
        for rep in range(2):
            del bf, conv, iters  # free the previous band before re-running
            bf = conv = iters = None
            t0 = time.time()
            bf, conv, iters = bst.apsp_band_bf(
                s0, nbr_d, dlt_d, wgt_d, np.float32(radius), bt=bt,
                block=block, max_iters=mi, group=group)
            it = int(iters)
            t = time.time() - t0
            print(json.dumps({"phase": f"bf_g{group}_rep{rep}",
                              "s": round(t, 2), "iters": it,
                              "converged": bool(conv)}), flush=True)
        ind_bf = bst.band_threshold(bf, radius)
        mism = int(np.asarray(jnp.sum(
            (ind_bf != ind_fw).astype(jnp.int32))))
        print(json.dumps({"phase": f"bf_g{group}_check", "mismatches": mism,
                          "nnz_fw": nnz_fw}), flush=True)
        del bf, ind_bf


if __name__ == "__main__":
    main()
