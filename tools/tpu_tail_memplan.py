"""Compile-only HBM accounting for the SPLIT band front's tail dispatch.

AOT-lowers pipeline.band_perm_tail (and band_relax_threshold) at the
349,440-node / 125-neighborhood shape that OOM'd on the real chip
(16.10 G > 15.75 G; the stable compaction sort's s32 iota tiebreaker was
10.74 G of it) and prints XLA's memory_analysis per compaction
chunk_blocks setting — WITHOUT executing, so no OOM risk and no grant
wedge. Run via tools/tpu_run.sh.
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

    n = 349440  # multiple of 128; the measured 125-neighborhood OOM point
    band = 3900  # bt = 31 -> width 8064, the OOM dump's band geometry
    bt = band // 128 + 1
    width = (2 * bt + 1) * 128
    nb = n // 128
    rows = (nb + 2 * bt) * 128
    sds = jax.ShapeDtypeStruct
    i32, f32, i8 = jnp.int32, jnp.float32, jnp.int8

    rng = np.random.default_rng(0)
    valid = rng.random(n) < 0.717  # ~ the real run's 250,509 / 349,440
    starts, w_c = bst.compaction_plan(valid, n=n, bt=bt, block=128)
    v_pad = int(valid.sum()) + w_c

    import functools
    unpatched = bst.apply_compaction
    for chunk in (0, 256):
        # pipeline calls bst.apply_compaction without chunk_blocks (the
        # module default); pin it per lowering via the module attribute
        bst.apply_compaction = functools.partial(unpatched,
                                                 chunk_blocks=chunk)
        pipe.band_perm_tail.clear_cache()  # identical signature: force retrace
        try:
            args = (sds((rows, width), i8),                   # s_ind
                    sds((n, 1), f32),                          # vals
                    sds((v_pad, 1), f32),                      # vals_valid
                    sds((n,), jnp.bool_),                      # valid
                    sds(np.asarray(starts).shape, i32),        # starts
                    sds((n,), i32),                            # rank
                    sds((2,), jnp.uint32))                     # key
            try:
                comp = pipe.band_perm_tail.lower(
                    *args, bt=bt, score_type="sum", num_permutations=1000,
                    batch_size=250, w_c=w_c, precision="highest").compile()
            except Exception as exc:  # the unchunked config OOMs by design
                head = [ln for ln in str(exc).splitlines()
                        if "Ran out of memory" in ln]
                print(json.dumps({"prog": "band_perm_tail",
                                  "chunk_blocks": chunk,
                                  "compile_oom": head[:1] or str(exc)[:200]}),
                      flush=True)
                continue
            m = comp.memory_analysis()
            print(json.dumps({
                "prog": "band_perm_tail", "chunk_blocks": chunk,
                "band_i8_gb": round(rows * width / 1e9, 2),
                "temp_gb": round(m.temp_size_in_bytes / 1e9, 2),
                "output_gb": round(m.output_size_in_bytes / 1e9, 2),
                "argument_gb": round(m.argument_size_in_bytes / 1e9, 2)}),
                flush=True)
        finally:
            bst.apply_compaction = unpatched

    # the split relax at the same shape: donated f32 band aliases the output
    s = sds((rows, width), f32)
    comp = pipe.band_relax_threshold.lower(
        s, sds((), f32), n=n, bt=bt).compile()
    m = comp.memory_analysis()
    print(json.dumps({
        "prog": "band_relax_threshold",
        "band_f32_gb": round(rows * width * 4 / 1e9, 2),
        "temp_gb": round(m.temp_size_in_bytes / 1e9, 2),
        "output_gb": round(m.output_size_in_bytes / 1e9, 2),
        "argument_gb": round(m.argument_size_in_bytes / 1e9, 2),
        "alias_gb": round(getattr(m, "alias_size_in_bytes", 0) / 1e9, 2)}),
        flush=True)


if __name__ == "__main__":
    main()
