"""Compile-only HBM accounting for the euclidean band pipeline at giant N.

AOT-lowers fused_permutation_pipeline_band_euclid with
keep_distances=False (the int8-direct indicator path) at candidate
scatter/UMAP scale points and prints XLA's memory_analysis — no execution,
no OOM risk. Run via tools/tpu_run.sh.
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

    sds = jax.ShapeDtypeStruct
    i32, f32 = jnp.int32, jnp.float32
    rng = np.random.default_rng(0)

    # (n multiple of 128, ~target-neighbor band estimate sqrt(target n / pi));
    # override the sweep with n:target[:bits] args, e.g. 999936:40
    # 1999872:40:bits — 'bits' lowers the BIT-packed indicator variant
    points = [(499968, 125.0, False), (599936, 125.0, False),
              (749952, 125.0, False)]
    if len(sys.argv) > 1:
        points = []
        for spec in sys.argv[1:]:
            parts = spec.split(":")
            points.append((int(parts[0]), float(parts[1]),
                           "bits" in parts[2:]))
    for n, target, bits in points:
        band = int(np.sqrt(target * n / np.pi))
        bt = band // 128 + 1
        valid = rng.random(n) < 0.7  # the euclid tool's NaN fraction
        starts, w_c = bst.compaction_plan(valid, n=n, bt=bt, block=128)
        v_pad = int(valid.sum()) + w_c
        args = (sds((n, 2), f32),                         # coords_perm
                sds((n, 1), f32),                          # vals
                sds((v_pad, 1), f32),                      # vals_valid
                sds((n,), jnp.bool_),                      # valid
                sds(np.asarray(starts).shape, i32),        # starts
                sds((n,), i32),                            # rank
                sds((2,), jnp.uint32),                     # key
                sds((), f32))                              # radius
        try:
            from safepy_tpu.ops.permutation import default_batch_size
            batch = default_batch_size(int(valid.sum()), 1, 1000)
            comp = pipe.fused_permutation_pipeline_band_euclid.lower(
                *args, n=n, band=band, score_type="sum",
                num_permutations=1000, batch_size=batch, w_c=w_c,
                precision="highest", keep_distances=False,
                packed=bits).compile()
        except Exception as exc:
            head = [ln for ln in str(exc).splitlines()
                    if "Ran out of memory" in ln]
            print(json.dumps({"n": n, "target": target, "band": band,
                              "bits": bits, "compile_oom": head[:1] or str(exc)[:200]}),
                  flush=True)
            continue
        m = comp.memory_analysis()
        print(json.dumps({
            "n": n, "target": target, "band": band, "w_c": w_c,
            "bits": bits,
            "band_i8_gb": round(bst.band_nbytes(n, band, itemsize=1) / 1e9, 2),
            "temp_gb": round(m.temp_size_in_bytes / 1e9, 2),
            "output_gb": round(m.output_size_in_bytes / 1e9, 2),
            "argument_gb": round(m.argument_size_in_bytes / 1e9, 2)}),
            flush=True)


if __name__ == "__main__":
    main()
