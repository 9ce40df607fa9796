"""Compile-only HBM accounting for the fused band pipeline at big shapes.

AOT-lowers fused_permutation_pipeline_band for several (band,
keep_distances) configs at n=299,520 and prints XLA's memory_analysis —
peak temp / argument / output bytes — WITHOUT executing (no OOM risk).
This is how the single-chip radius ceiling was diagnosed: if temp size
~ 2x the f32 band store, the FW while-loop carry is double-buffered and
the ceiling is structural, not a leak.

Run via tools/tpu_run.sh (compiles remotely; each config is one fresh
signature, ~1-2 min).
"""

import json
import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp

    from safepy_tpu import pipeline as pipe
    from safepy_tpu.ops import apsp_bandstore as bst

    n = 299520
    e = n * 8  # ~kNN(9) edge count
    sds = jax.ShapeDtypeStruct
    i32, f32 = jnp.int32, jnp.float32

    valid = np.ones(n, bool)  # shapes only; compaction plan is host-side
    for band, keep in ((2548, False), (2548, True),
                       (3621, False), (3621, True)):
        bt = band // 128 + 1
        starts, w_c = bst.compaction_plan(valid, n=n, bt=bt, block=128)
        args = (sds((e,), i32), sds((e,), i32), sds((e,), f32),  # u, v, w
                sds((n, 1), f32),                                # vals
                sds((n, 1), f32),                                # vals_valid
                sds((n,), jnp.bool_),                            # valid
                sds(np.asarray(starts).shape, i32),              # starts
                sds((n,), i32),                                  # rank
                sds((2,), jnp.uint32),                           # key
                sds((), f32))                                    # radius
        comp = pipe.fused_permutation_pipeline_band.lower(
            *args, n=n, band=band, score_type="sum",
            num_permutations=1000, batch_size=250, w_c=w_c,
            precision="highest", keep_distances=keep).compile()
        m = comp.memory_analysis()
        print(json.dumps({
            "band": band, "keep_distances": keep,
            "band_store_gb": round(bst.band_nbytes(n, band) / 1e9, 2),
            "temp_gb": round(m.temp_size_in_bytes / 1e9, 2),
            "output_gb": round(m.output_size_in_bytes / 1e9, 2),
            "argument_gb": round(m.argument_size_in_bytes / 1e9, 2)}),
            flush=True)


if __name__ == "__main__":
    main()
