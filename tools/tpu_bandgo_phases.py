"""Phase-level decomposition of the band GO table driver at scale.

Every phase is forced complete with a scalar download, so remote-async
execution can't hide where the time goes.

Usage: tools/tpu_run.sh tools/tpu_bandgo_phases.py [n] [a]
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from tpu_bandstore_scale import build_graph  # noqa: E402
from tpu_table_profile import go_attrs  # noqa: E402


def sync(x):
    return float(np.asarray(x.ravel()[0]))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 99840
    a = int(sys.argv[2]) if len(sys.argv) > 2 else 4373
    import jax
    import jax.numpy as jnp
    print(f"# devices: {jax.devices()}", flush=True)

    from safepy_tpu import SAFE, pipeline as pipe
    from safepy_tpu.ops import hypergeom_table as htab
    from safepy_tpu.ops.apsp_bandstore import band_params
    from safepy_tpu.ops.enrich_band import (_pad_rows_to, _place_chunk,
                                            band_matmul)
    from safepy_tpu.ops.neighborhoods import inclusive_radius

    t0 = time.time()
    g = build_graph(n)
    attrs = go_attrs(n, a)
    print(json.dumps({"phase": "host_build", "s": round(time.time() - t0, 1)}),
          flush=True)

    sf = SAFE(verbose=False)
    sf.random_seed = 17
    sf.neighborhood_radius = float(np.sqrt(125.0 / (np.pi * n)))
    sf.load_network(network_file=g, node_key_attribute="key")
    sf.load_attributes(attribute_file=attrs)
    coords, edges, lengths, _w = sf._graph_to_arrays_cached()
    x = coords[:, 0]
    nr = sf.neighborhood_radius * (np.max(x) - np.min(x))
    t0 = time.time()
    plan_b = sf._band_storage_plan(coords, edges, lengths, n, nr)
    print(json.dumps({"phase": "band_plan", "s": round(time.time() - t0, 1),
                      "band": plan_b["band"]}), flush=True)
    radius = inclusive_radius(nr)

    def fw():
        t0 = time.time()
        out = pipe.band_neighborhoods(plan_b["u"], plan_b["v"], plan_b["w"],
                                      radius, n=n, band=plan_b["band"])
        _ = sync(out[1])
        return out[:4], time.time() - t0

    (dist_band, s_ind, mean, std), fw_first = fw()
    del dist_band
    (dist_band, s_ind2, mean, std), fw_steady = fw()
    del dist_band, s_ind2
    print(json.dumps({"phase": "band_fw", "first_s": round(fw_first, 1),
                      "steady_s": round(fw_steady, 2)}), flush=True)

    t0 = time.time()
    order = np.argsort(plan_b["rank"])
    nan0_perm, nnn_perm, K_np = SAFE._hypergeom_host_operands(
        np.asarray(sf.node2attribute), order)
    M = int(nnn_perm.sum())
    print(json.dumps({"phase": "host_operands",
                      "s": round(time.time() - t0, 1)}), flush=True)

    bt = plan_b["band"] // 128 + 1
    block = 128
    npad = s_ind.shape[0] - 2 * bt * block

    t0 = time.time()
    nan0_dev = jnp.asarray(nan0_perm)
    _ = sync(nan0_dev)
    print(json.dumps({"phase": "upload_1p75GB",
                      "s": round(time.time() - t0, 1)}), flush=True)

    t0 = time.time()
    nsize = band_matmul(s_ind, _pad_rows_to(
        jnp.asarray(nnn_perm)[:, None], npad), bt=bt, block=block)[:, 0]
    n_max = float(jnp.max(nsize))
    tplan = htab.plan(K_np, n_max, M)
    print(json.dumps({"phase": "nsize_plus_plan", "s": round(time.time() - t0, 1),
                      "chunks": len(tplan["chunks"]),
                      "total_cells": tplan["total_cells"],
                      "n_max": n_max}), flush=True)

    import functools
    lookup_jit = functools.partial(jax.jit, static_argnames=("S_max", "R", "C"))(
        htab.table_lookup)

    for rep in range(2):
        rank_dev = jnp.asarray(plan_b["rank"], jnp.int32)
        logsf = jnp.zeros((n, a), jnp.float32)
        nbin = jnp.zeros((n, a), jnp.int8)
        tt = dict(census=0.0, table=0.0, lookup=0.0, place=0.0, rank=0.0)
        log_thr = np.float64(np.log(0.05))
        for ch in tplan["chunks"]:
            s0, w = ch["start"], ch["width"]
            cols = jax.lax.dynamic_slice_in_dim(nan0_dev, s0, w, 1)
            t0 = time.time()
            counts = band_matmul(s_ind,
                                 _pad_rows_to(cols.astype(jnp.float32), npad),
                                 bt=bt, block=block)
            _ = sync(counts)
            tt["census"] += time.time() - t0
            t0 = time.time()
            table = htab.build_logsf_table(
                jnp.asarray(ch["K_dist"]), M, float(log_thr),
                R=ch["R"], S_max=ch["S_max"], C=ch["C"])
            _ = sync(table)
            tt["table"] += time.time() - t0
            t0 = time.time()
            _nes_c, logsf_c, bin_c = lookup_jit(
                table, counts, nsize, jnp.asarray(ch["colc"], jnp.int32),
                np.float32(log_thr), S_max=ch["S_max"], R=ch["R"], C=ch["C"])
            _ = sync(logsf_c)
            tt["lookup"] += time.time() - t0
            t0 = time.time()
            logsf_c = jnp.take(logsf_c, rank_dev, axis=0)
            bin_c = jnp.take(bin_c, rank_dev, axis=0)
            _ = sync(logsf_c)
            tt["rank"] += time.time() - t0
            t0 = time.time()
            logsf, nbin = _place_chunk(logsf, nbin, logsf_c, bin_c, s0)
            _ = sync(logsf)
            tt["place"] += time.time() - t0
        print(json.dumps({"phase": f"driver_rep{rep}",
                          **{k: round(v, 2) for k, v in tt.items()}}),
              flush=True)
        del logsf, nbin


if __name__ == "__main__":
    main()
