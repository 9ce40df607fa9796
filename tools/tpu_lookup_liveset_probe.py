"""Measure the slot-loop lookup's LIVE HBM directly via ballast probing.

The axon TPU plugin reports no allocator counters (memory_stats() lacks
bytes_in_use/peak — measured r5f), so the census model's core term — the
slot-loop keeps ~``group`` (N, w) f32 gather outputs live per fori step
(safepy_tpu/hbm.census_select) — was calibrated from three RAN/OOM anchors,
not measured. This probe measures it: allocate ``ballast`` GB of device
zeros, then run ops/hypergeom_table._lookup_slot_loop at fixed GO-chunk
shapes with a chosen ``group``. The largest survivable ballast B(group)
satisfies  B + fixed_operands + live(group) ~= usable_HBM, so
B(g_small) - B(g_large) ~= (g_large - g_small) * N * w * 4  if the model
is right.

One probe per PROCESS (a fatal OOM poisons the backend; an OOM probe is an
EXPECTED outcome here — rc 0 = survived, rc 3 = OOM'd, the driver sleeps
out the worker wedge between probes). Usage:

    tools/tpu_run.sh tools/tpu_lookup_liveset_probe.py <ballast_gb> <group>
"""

import sys
import time

import numpy as np


def main():
    ballast_gb = float(sys.argv[1])
    group = int(sys.argv[2])
    n_rows = int(sys.argv[3]) if len(sys.argv) > 3 else 406_528
    w = int(sys.argv[4]) if len(sys.argv) > 4 else 512

    import jax
    import jax.numpy as jnp
    import safepy_tpu  # noqa: F401  (compile cache)
    from safepy_tpu.ops import hypergeom_table as htab

    dev = jax.devices()[0]
    print(f"# probe devices: {dev}", flush=True)
    R, S_max, C = 256, 256, 512

    rng = np.random.default_rng(0)
    k_np = rng.integers(0, 120, (n_rows, w)).astype(np.int32)
    try:
        ballast = jnp.zeros((int(ballast_gb * 1e9) // 4,), jnp.float32)
        ballast.block_until_ready()
        table = jnp.zeros((S_max, C, R), jnp.float32)
        k = jnp.asarray(k_np)
        n_i = jnp.asarray(rng.integers(0, R, n_rows), jnp.int32)
        colc = jnp.asarray(rng.integers(0, C, w), jnp.int32)

        f = jax.jit(lambda t, k, n, c: htab._lookup_slot_loop(
            t, k, n, c, S_max=S_max, group=group))
        t0 = time.time()
        out = f(table, k, n_i, colc)
        out.block_until_ready()
        first = time.time() - t0
        t0 = time.time()
        out2 = f(table, k, n_i, colc)
        out2.block_until_ready()
        steady = time.time() - t0
        cell_gb = n_rows * w * 4 / 1e9
        print({"check": "lookup_liveset", "ballast_gb": ballast_gb,
               "group": group, "rows": n_rows, "w": w,
               "cell_gb": round(cell_gb, 3), "first_s": round(first, 2),
               "steady_s": round(steady, 3), "survived": True}, flush=True)
        return 0
    except Exception as e:  # noqa: BLE001 — OOM is an expected outcome
        msg = str(e).splitlines()[0] if str(e) else type(e).__name__
        print({"check": "lookup_liveset", "ballast_gb": ballast_gb,
               "group": group, "rows": n_rows, "w": w,
               "survived": False, "error": msg[:200]}, flush=True)
        return 3


if __name__ == "__main__":
    sys.exit(main())
