"""FULL SAFE workflow at band-storage scale on one v5e — every stage.

The scale rows in PARITY.md measure stages in isolation; this driver runs the
complete user workflow the reference offers (reference Example usage,
safe.py:1380-1425) at 99,840 nodes x 4,373 GO-scale binary attributes in ONE
process: load -> neighborhoods (band FW) -> hypergeometric enrichment
(class-table engine) -> top attributes -> domain clustering (MXU jaccard) ->
trim -> composite plot -> TSV reports, with per-stage wall times.

Run via tools/tpu_run.sh (single-tenant chip).
"""

import time

import numpy as np


class T:
    def __init__(self):
        self.t0 = time.perf_counter()
        self.rows = []

    def lap(self, label):
        t = time.perf_counter()
        self.rows.append((label, t - self.t0))
        print(f"  {label}: {t - self.t0:.2f}s", flush=True)
        self.t0 = t


def main():
    import matplotlib
    matplotlib.use("Agg")
    import jax
    import networkx as nx
    import pandas as pd
    from scipy.spatial import cKDTree

    import safepy_tpu

    print("devices:", jax.devices(), flush=True)
    n, a = 99840, 4373
    rng = np.random.default_rng(0)
    t = T()

    coords = rng.uniform(-10, 10, (n, 2)).astype(np.float64)
    # node ids ordered by x so index-contiguous annotation spans are also
    # spatially clustered (vectorized synthesis below)
    coords = coords[np.argsort(coords[:, 0] + 1e-7 * coords[:, 1])]
    _, nn = cKDTree(coords).query(coords, k=4)
    u = np.repeat(np.arange(n), 3)
    v = nn[:, 1:].ravel()
    keep = u < v
    edges = np.stack([u[keep], v[keep]], 1)
    # A raw kNN graph on uniform points is globally DISCONNECTED (thousands
    # of islands at 100k), which shreds every enriched region into many
    # components and fails the reference's connectivity unimodality filter
    # (reference safe.py:666-682). Real biological nets are connected; add a
    # backbone path in x-sorted order so index-contiguous annotation spans
    # are connected subgraphs.
    chain = np.stack([np.arange(n - 1), np.arange(1, n)], 1)
    edges = np.concatenate([edges, chain], 0)
    g = nx.Graph()
    g.add_nodes_from(
        (i, {"key": f"g{i}", "label": f"g{i}",
             "x": float(coords[i, 0]), "y": float(coords[i, 1])})
        for i in range(n))
    g.add_edges_from(map(tuple, edges))
    from safepy_tpu.io.layout import calculate_edge_lengths
    calculate_edge_lengths(g, verbose=False)
    t.lap("synthesize geometric network (host)")

    # clustered GO-ish annotations: term j marks the circular index range
    # [start, start+size). This host's memory path is degraded (see PARITY
    # "Cold-start host tier"): an int8 cumsum + astype(float32) + DataFrame
    # copy measured 32 + 171 + 253 s at this shape. Instead fill ONE
    # F-ordered float32 array column-chunked (contiguous writes) and wrap it
    # copy-free — pandas keeps an F-contiguous 2-D block without copying.
    sizes = np.maximum(12, rng.lognormal(np.log(180), 0.9, size=a)).astype(
        np.int32)
    sizes = np.minimum(sizes, 4000)
    # non-wrapping spans: each term is ONE x-strip (unimodal by construction)
    starts = (rng.random(a) * (n - sizes)).astype(np.int32)
    out = np.empty((n, a), dtype=np.float32, order="F")
    idx = np.arange(n, dtype=np.int32)[:, None]
    for lo in range(0, a, 256):
        hi = min(a, lo + 256)
        s = starts[None, lo:hi]
        out[:, lo:hi] = (idx >= s) & (idx < s + sizes[None, lo:hi])
    attrs = pd.DataFrame(out, index=[f"g{i}" for i in range(n)],
                         columns=[f"GO:{j:07d}" for j in range(a)],
                         copy=False)
    t.lap("synthesize GO-scale annotations (host)")

    sf = safepy_tpu.SAFE(verbose=False)
    # ~125-node neighborhoods (yeast-like density, the regime every PARITY
    # scale row uses): expected neighbors = n*pi*f^2 for a radius fraction f
    # of the x-range on a uniform square. The reference default f=0.15 would
    # mean ~7,000-node neighborhoods at this n — no real map is run there,
    # and the band (which scales with the radius) would not fit one chip.
    sf.neighborhood_radius = float(np.sqrt(125.0 / (np.pi * n)))
    sf.load_network(network_file=g, node_key_attribute="key")
    t.lap("load_network")
    sf.load_attributes(attribute_file=attrs)
    t.lap("load_attributes")

    sf.run_pipeline()
    t.lap("run_pipeline (band FW + class-table hypergeometric)")
    print(f"    engine: {getattr(sf, '_hypergeom_engine_used', '?')}, "
          f"enriched attrs: "
          f"{int((sf.attributes['num_neighborhoods_enriched'] >= 10).sum())}",
          flush=True)

    ind = sf._nes_binary_for_top()  # cached; define_top_attributes reuses it
    t.lap("indicator CSC (device nonzero + index download)")
    import scipy.sparse as sp
    if sp.issparse(ind):
        print(f"    nnz: {ind.nnz} (mean enriched/attr: {ind.nnz / a:.0f})",
              flush=True)
    sf.define_top_attributes()
    t.lap("define_top_attributes (csgraph component loop)")
    ntop = int(sf.attributes["top"].sum())
    print(f"    top attributes: {ntop}", flush=True)

    sf.define_domains()
    t.lap("define_domains (MXU jaccard + device aggregates)")
    print(f"    domains: {sf.attributes['domain'].max()}", flush=True)

    sf.trim_domains()
    t.lap("trim_domains")

    import tempfile
    outdir = tempfile.mkdtemp()
    fig, axes = sf.plot_composite_network(color_seed=0,
                                          save_fig=outdir + "/composite.png")
    t.lap("plot_composite_network (saved png)")

    sf.print_output_files(output_dir=outdir + "/")
    t.lap("print_output_files (3 TSV reports)")

    # one attribute landscape panel: NES + significance marks ride the
    # device COLUMN slices (safe._nes_column) — never the (N, A) downloads
    sf.plot_sample_attributes(attributes=1, show_significant_nodes=True,
                              save_fig=outdir + "/attr.png", seed=0)
    t.lap("plot_sample_attributes (device column slices)")

    total = sum(s for _, s in t.rows)
    compute = sum(s for lbl, s in t.rows if "synthesize" not in lbl)
    print(f"TOTAL {total:.1f}s; full SAFE workflow (excl. synthesis) "
          f"{compute:.1f}s at {n} nodes x {a} attributes", flush=True)


if __name__ == "__main__":
    main()
