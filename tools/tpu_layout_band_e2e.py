"""Raw edge list -> on-device layout -> band-storage pipeline, end to end.

The scale story previously had a host-side hole at step one: a raw 100k-node
edge list would hit nx.spring_layout (the energy minimizer, minutes-to-hours
on host) or the dense O(N^2) FR (40 GB at 100k). The energy-method layout
engine (safepy_tpu/io/layout.spring_layout_energy_tpu: exact edge attraction,
sampled repulsion, Adam) closes it on device.

Usage: tools/tpu_run.sh tools/tpu_layout_band_e2e.py [n]
Prints one JSON line per stage.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 99840
    import jax
    print(f"# devices: {jax.devices()}", flush=True)

    import networkx as nx
    import pandas as pd
    from safepy_tpu import SAFE
    from safepy_tpu.io.layout import (calculate_edge_lengths,
                                      spring_layout_energy_tpu)

    # raw edge list only — NO coordinates (a txt-loader-shaped input);
    # built from a hidden geometric ground truth so neighborhood locality is
    # verifiable
    rng = np.random.default_rng(7)
    truth = rng.uniform(-1, 1, (n, 2))
    from scipy.spatial import cKDTree
    _, nn = cKDTree(truth).query(truth, k=7)
    src = np.repeat(np.arange(n), 6)
    dst = nn[:, 1:].ravel()
    lo, hi = np.minimum(src, dst), np.maximum(src, dst)
    edges = np.unique(np.stack([lo, hi], 1), axis=0)

    t0 = time.time()
    coords = spring_layout_energy_tpu(n, edges, iterations=1000, seed=3)
    layout_s = time.time() - t0
    t0 = time.time()
    coords = spring_layout_energy_tpu(n, edges, iterations=1000, seed=3)
    layout_steady_s = time.time() - t0
    print(json.dumps({"stage": "layout", "nodes": n, "edges": len(edges),
                      "first_s": round(layout_s, 2),
                      "steady_s": round(layout_steady_s, 2)}), flush=True)

    g = nx.Graph()
    g.add_nodes_from(range(n))
    g.add_edges_from(edges)
    for i in range(n):
        g.nodes[i]["label"] = g.nodes[i]["key"] = f"n{i}"
        g.nodes[i]["x"] = float(coords[i, 0])
        g.nodes[i]["y"] = float(coords[i, 1])
    t0 = time.time()
    calculate_edge_lengths(g, verbose=False)
    print(json.dumps({"stage": "edge_lengths",
                      "wall_s": round(time.time() - t0, 2)}), flush=True)

    vals = rng.normal(size=(n, 1))
    vals[rng.random(n) < 0.3, 0] = np.nan
    attrs = pd.DataFrame(vals, index=[f"n{i}" for i in range(n)],
                         columns=["q"])

    sf = SAFE(verbose=False)
    sf.random_seed = 17
    # radius holding the mean neighborhood size ~125 in the LAYOUT frame:
    # the energy layout lands in ~a unit square (area ~1), and
    # neighborhood_radius is a fraction of the x-extent (~1), so the
    # fraction IS the absolute radius sqrt(125 * area / (pi * n))
    sf.neighborhood_radius = float(np.sqrt(125.0 / (np.pi * n)))
    sf.load_network(network_file=g, node_key_attribute="key")
    sf.load_attributes(attribute_file=attrs)
    t0 = time.time()
    sf.run_pipeline(num_permutations=1000)
    first = time.time() - t0
    t0 = time.time()
    sf.run_pipeline(num_permutations=1000)
    steady = time.time() - t0

    from safepy_tpu.ops.apsp_bandstore import BandedMatrix
    band_engine = isinstance(sf._neighborhoods_dev, BandedMatrix)
    print(json.dumps({
        "stage": "pipeline", "nodes": n, "band_engine": band_engine,
        "band": int(sf._neighborhoods_dev.band) if band_engine else None,
        "first_s": round(first, 2), "steady_s": round(steady, 3),
        "total_e2e_s": round(layout_s + steady, 2),
        "enriched": int((sf.nes_binary > 0).sum())}), flush=True)


if __name__ == "__main__":
    main()
