"""Example 1 — quantitative attribute enrichment (the reference's default workflow).

Reference analog: examples in baryshnikova-lab/safepy run the Costanzo-2016 yeast
genetic-interaction similarity network with doxorubicin sensitivity scores. The
safe-data bundle is not vendored here, so this script synthesizes a network of the
same scale; swap `build_synthetic_network()` for
`sf.load_network(network_file="networks/Costanzo_Science_2016.gpickle")` plus a
`path_to_safe_data` if you have the data checkout.

Run: PYTHONPATH=. python examples/example_1_quantitative.py
"""

import numpy as np
import pandas as pd

from safepy_tpu import SAFE
from safepy_tpu.profiling import StageTimer


def build_synthetic_network(n=1000, seed=0):
    import networkx as nx
    from safepy_tpu.io.layout import calculate_edge_lengths
    rng = np.random.default_rng(seed)
    coords = rng.uniform(-1, 1, (n, 2))
    g = nx.random_geometric_graph(n, 0.12, seed=seed, pos={i: tuple(coords[i]) for i in range(n)})
    for i in range(n):
        g.nodes[i]["label"] = g.nodes[i]["key"] = f"gene{i}"
        g.nodes[i]["x"], g.nodes[i]["y"] = coords[i]
        del g.nodes[i]["pos"]
    return calculate_edge_lengths(g, verbose=False)


def main():
    timer = StageTimer()
    g = build_synthetic_network()
    rng = np.random.default_rng(1)

    # a quantitative attribute with spatial structure: a "sensitive" region
    coords = np.array([[g.nodes[i]["x"], g.nodes[i]["y"]] for i in g])
    signal = np.exp(-(np.linalg.norm(coords - [0.5, 0.5], axis=1) ** 2) / 0.05)
    values = signal + 0.3 * rng.normal(size=len(g))
    attr = pd.DataFrame({"synthetic sensitivity": values},
                        index=[f"gene{i}" for i in range(len(g))])

    sf = SAFE(verbose=False)
    sf.random_seed = 42

    with timer.stage("load_network"):
        sf.load_network(network_file=g, node_key_attribute="key")
    with timer.stage("define_neighborhoods"):
        sf.define_neighborhoods()
    with timer.stage("load_attributes"):
        sf.load_attributes(attribute_file=attr)
    with timer.stage("compute_pvalues (1000 permutations)"):
        sf.compute_pvalues(num_permutations=1000)

    timer.report()
    enriched = int((sf.nes_binary > 0).sum())
    print(f"enriched neighborhoods: {enriched} / {len(g)}")
    print(f"max NES: {np.nanmax(sf.nes):.2f}")

    sf.plot_sample_attributes(attributes=["synthetic sensitivity"],
                              save_fig="example_1_landscape.png")
    print("wrote example_1_landscape.png")


if __name__ == "__main__":
    main()
