"""Microbenchmark: 1D table gather throughput on the v5e + f64 op costs.

Decides the implementation of the hypergeometric class-table engine:
logsf[i,j] = TAB[idx[i,j]] needs ~4.4e8 table lookups at the 100k x 4,373
GO scale point. Run via tools/tpu_run.sh.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


def fetch(out):
    # block_until_ready is a no-op on the tunneled axon backend: force real
    # completion by downloading a scalar derived from the output
    if isinstance(out, tuple):
        return [float(np.asarray(o.ravel()[0])) for o in out]
    return float(np.asarray(out.ravel()[0]))


def timeit(fn, *args, reps=3):
    fetch(fn(*args))
    t0 = time.time()
    for _ in range(reps):
        fetch(fn(*args))
    return (time.time() - t0) / reps


def main():
    print(f"# devices: {jax.devices()}", flush=True)
    jax.config.update("jax_enable_x64", True)
    rng = np.random.default_rng(0)

    # --- gather: (N, A) indices into a table of T entries -------------------
    for n, a, t in ((99840, 512, 1 << 22), (99840, 4373, 1 << 22),
                    (99840, 4373, 1 << 25)):
        tab = jnp.asarray(rng.normal(size=t).astype(np.float32))
        tab8 = jnp.asarray(rng.integers(0, 2, t, dtype=np.int8))
        idx = jnp.asarray(rng.integers(0, t, (n, a), dtype=np.int32))

        @jax.jit
        def take_f32(tab, idx):
            return jnp.take(tab, idx, mode="clip")

        @jax.jit
        def take_both(tab, tab8, idx):
            return jnp.take(tab, idx, mode="clip"), \
                jnp.take(tab8, idx, mode="clip")

        s_f32 = timeit(take_f32, tab, idx)
        s_both = timeit(take_both, tab, tab8, idx)
        print(json.dumps({
            "bench": "gather", "n": n, "a": a, "table": t,
            "f32_s": round(s_f32, 4), "f32_both_s": round(s_both, 4),
            "gelems_per_s": round(n * a / s_f32 / 1e9, 3)}), flush=True)

    # --- f64 scalar op costs at table-build scale ---------------------------
    p, s = 1 << 20, 256  # 1M class lanes x 256 scan steps
    x = jnp.asarray(rng.uniform(1.0, 2.0, p))
    y = jnp.asarray(rng.uniform(1.0, 2.0, p))
    lgt = jnp.asarray(np.log1p(np.arange(1 << 17, dtype=np.float64)))
    ki = jnp.asarray(rng.integers(0, 1 << 17, p, dtype=np.int32))

    def scan_of(body):
        @jax.jit
        def run(x, y):
            def f(c, _):
                return body(c, y), None
            out, _ = jax.lax.scan(f, x, None, length=s)
            return out
        return run

    div = scan_of(lambda c, y: c / (y + c * 1e-18))
    mul = scan_of(lambda c, y: c * y - c * 0.5)
    log = scan_of(lambda c, y: jnp.log(c) + c)

    @jax.jit
    def gath(x, ki):
        def f(c, _):
            return c + jnp.take(lgt, ki + (c[0] * 0).astype(jnp.int32),
                                mode="clip"), None
        out, _ = jax.lax.scan(f, x, None, length=s)
        return out

    for name, fn, args in (("f64_div", div, (x, y)), ("f64_mul", mul, (x, y)),
                           ("f64_log", log, (x, y)), ("f64_lgt_gather", gath,
                                                      (x, ki))):
        sec = timeit(fn, *args)
        print(json.dumps({"bench": name, "lanes": p, "steps": s,
                          "s": round(sec, 4),
                          "gops_per_s": round(p * s / sec / 1e9, 3)}),
              flush=True)


if __name__ == "__main__":
    main()
