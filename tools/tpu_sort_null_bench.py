"""Sort-path vs gather-path permutation null at many attributes.

The broadcast-key single-sort formulation
(ops/permutation.permuted_operands_sorted) serves any attribute width with an
XLA program size flat in A; the row-gather engine amortizes one (C, V) index
set over all columns. This measures both engines on a 20k-node quantitative
null at the requested width — the sweep behind the SORT_PATH_MAX_ATTRIBUTES
crossover (sort wins only at A=1 on v5e).

Usage: tools/tpu_run.sh tools/tpu_sort_null_bench.py [nodes] [attrs] [perms]
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 19968
    a = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    perms = int(sys.argv[3]) if len(sys.argv) > 3 else 1000

    import jax
    import jax.numpy as jnp
    print(f"# devices: {jax.devices()}", flush=True)

    from safepy_tpu.ops import permutation as perm_mod
    from safepy_tpu.ops.score import compute_neighborhood_score

    rng = np.random.default_rng(0)
    # random indicator at the flagship density (~125-node neighborhoods),
    # generated ON DEVICE — this sandbox's host RNG/memory path runs ~2M
    # values/s, so an (N, N) host draw alone would take minutes
    density = 125.0 / n
    kd = jax.random.PRNGKey(0)
    nbr = jax.random.bernoulli(kd, density, (n, n)).astype(jnp.float32)
    vals_dev = jax.random.normal(jax.random.PRNGKey(2), (n, a), jnp.float32)
    nanmask = jax.random.bernoulli(jax.random.PRNGKey(3), 0.2, (n, a))
    vals_dev = jnp.where(nanmask, jnp.nan, vals_dev)
    obs = compute_neighborhood_score(nbr, vals_dev, "sum", "highest")
    key = jax.random.PRNGKey(1)

    def run():
        cn, cp = perm_mod.run_permutations(
            nbr, vals_dev, None, obs, key, score_type="sum",
            num_permutations=perms)
        return float(np.asarray(cn[0, 0]))

    results = {}
    for name, cap in (("gather", 0), ("sort_bcast", 256)):
        # the engine choice is a trace-time Python branch on the module
        # global — clear the jit cache so the cap change recompiles
        perm_mod.SORT_PATH_MAX_ATTRIBUTES = cap
        perm_mod.run_permutations.clear_cache()
        t0 = time.time()
        run()
        print(json.dumps({"engine": name,
                          "first_s": round(time.time() - t0, 3)}), flush=True)
        t0 = time.time()
        run()
        results[name] = round(time.time() - t0, 3)
        print(json.dumps({"check": "null_engine", "engine": name,
                          "nodes": n, "attributes": a, "perms": perms,
                          "steady_s": results[name]}), flush=True)
    print(json.dumps({"check": "sort_vs_gather", "nodes": n, "attributes": a,
                      "speedup": round(results["gather"]
                                       / results["sort_bcast"], 2)}),
          flush=True)


if __name__ == "__main__":
    main()
