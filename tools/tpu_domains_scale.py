"""Measure the device-accelerated domain stage at band-GO scale on the TPU.

Synthesizes a 99,840 x 4,373 clustered binary indicator (the shape of the
band engine's GO output), then times the real functions:

  * ops/domains_device.enrichment_intersections — one MXU GEMM + the (A, A)
    int32 download;
  * jaccard_condensed_from_counts + scipy linkage + fcluster (host);
  * ops/domains_device.domain_aggregates — counts GEMM + NES segment-max;
  * the host comparison point: scipy pdist measured 136 s for 384 rows at
    this N (tools/domain_scale_profile.py) -> ~4.9 h extrapolated for the
    full linkage input the scipy engine would build.

Run via tools/tpu_run.sh (single-tenant chip).
"""

import time

import numpy as np


def main():
    import jax

    print("devices:", jax.devices())
    n, a = 99840, 4373
    rng = np.random.default_rng(0)
    sizes = np.maximum(12, rng.lognormal(np.log(250), 0.8, size=a)).astype(int)
    sizes = np.minimum(sizes, n // 4)
    starts = rng.integers(0, n, size=a)
    b = np.zeros((n, a), dtype=np.int8)
    for j in range(a):
        span = np.arange(starts[j], starts[j] + sizes[j]) % n
        b[span, j] = 1
    nes = rng.normal(2.0, 1.0, size=(n, a)).astype(np.float32)
    nes[rng.random((n, a)) < 0.2] = np.nan
    print(f"indicator: {n} x {a}, density {b.mean():.4f}")

    import jax.numpy as jnp

    from safepy_tpu.ops import domains_device as dd

    t0 = time.perf_counter()
    b_dev = jnp.asarray(b)
    b_dev.block_until_ready()
    t_up = time.perf_counter() - t0
    print(f"upload int8 indicator: {t_up:.2f}s ({b.nbytes / 1e6:.0f} MB)")

    # warm the jit, then measure steady
    inter = dd.enrichment_intersections(b_dev)
    t0 = time.perf_counter()
    inter = dd.enrichment_intersections(b_dev)
    t_inter = time.perf_counter() - t0
    print(f"intersections GEMM + int32 download: {t_inter:.2f}s "
          f"({inter.nbytes / 1e6:.0f} MB)")

    t0 = time.perf_counter()
    condensed = dd.jaccard_condensed_from_counts(inter)
    t_cond = time.perf_counter() - t0
    print(f"condensed jaccard (host f64): {t_cond:.2f}s "
          f"({condensed.size} pairs)")

    from scipy.cluster.hierarchy import fcluster, linkage
    t0 = time.perf_counter()
    Z = linkage(condensed, method="average")
    t_link = time.perf_counter() - t0
    domains = fcluster(Z, np.max(Z[:, 2] * 0.75), criterion="distance")
    print(f"linkage(average): {t_link:.2f}s -> {len(np.unique(domains))} "
          f"domains")

    nes_dev = jnp.asarray(nes)
    nes_dev.block_until_ready()

    def agg_phases(dom_pos, nd, tag):
        dom = jnp.asarray(dom_pos.astype(np.int32))
        c_dev = dd._domain_counts_device(b_dev, dom, nd)   # warm
        m_dev = dd._domain_max_nes_device(nes_dev, dom, nd)
        jax.block_until_ready((c_dev, m_dev))
        t0 = time.perf_counter()
        c_dev = dd._domain_counts_device(b_dev, dom, nd)
        c_dev.block_until_ready()
        t_c = time.perf_counter() - t0
        t0 = time.perf_counter()
        m_dev = dd._domain_max_nes_device(nes_dev, dom, nd)
        m_dev.block_until_ready()
        t_m = time.perf_counter() - t0
        t0 = time.perf_counter()
        np.asarray(c_dev), np.asarray(m_dev)
        t_dl = time.perf_counter() - t0
        print(f"aggregates[{tag}] D={nd}: counts GEMM {t_c:.2f}s, "
              f"segment-max {t_m:.2f}s, downloads {t_dl:.2f}s "
              f"({(c_dev.nbytes + m_dev.nbytes) / 1e6:.0f} MB)")
        return t_c + t_m + t_dl

    unique = np.sort(np.unique(domains))
    dom_pos = np.searchsorted(unique, domains)
    t_agg = agg_phases(dom_pos, len(unique), "fcluster")
    # realistic GO domain count (Costanzo-scale runs land at tens of domains)
    rng2 = np.random.default_rng(3)
    t_agg40 = agg_phases(rng2.integers(0, 40, size=a), 40, "realistic")

    total = t_inter + t_cond + t_link + t_agg
    print(f"TOTAL device-path domain stage: {total:.2f}s "
          f"(scipy pdist alone extrapolates to ~4.9 h at this scale)")
    # sample-verify the GEMM counts against a direct host dot on a slice
    sl = np.arange(0, a, 97)
    ref = b[:, sl].astype(np.int64).T @ b[:, sl].astype(np.int64)
    np.testing.assert_array_equal(inter[np.ix_(sl, sl)], ref)
    print("sample parity OK")


if __name__ == "__main__":
    main()
