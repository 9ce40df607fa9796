"""Example 2 — binary GO-style annotation matrix with hypergeometric enrichment
and domain assembly (the reference's Example_2 workflow at Costanzo scale uses
4,373 GO biological-process terms)."""

import numpy as np
import pandas as pd

from safepy_tpu import SAFE
from examples.example_1_quantitative import build_synthetic_network


def main():
    g = build_synthetic_network(n=800, seed=3)
    rng = np.random.default_rng(2)
    n = len(g)

    # binary annotations concentrated in 5 spatial clusters -> domains
    coords = np.array([[g.nodes[i]["x"], g.nodes[i]["y"]] for i in g])
    centers = rng.uniform(-0.8, 0.8, (5, 2))
    cols = {}
    for c in range(5):
        near = np.linalg.norm(coords - centers[c], axis=1) < 0.35
        for t in range(8):  # 8 correlated terms per cluster
            cols[f"cluster{c} term{t}"] = (near & (rng.random(n) < 0.7)).astype(float)
    attr = pd.DataFrame(cols, index=[f"gene{i}" for i in range(n)])

    sf = SAFE(verbose=False)
    sf.random_seed = 7
    sf.load_network(network_file=g, node_key_attribute="key")
    sf.define_neighborhoods()
    sf.load_attributes(attribute_file=attr)
    sf.compute_pvalues()              # auto -> hypergeometric (binary input)
    sf.define_top_attributes()
    sf.define_domains()
    sf.trim_domains()

    print(sf.domains[["id", "label"]])
    sf.plot_composite_network(save_fig="example_2_composite.png", color_seed=0)
    sf.print_output_files(output_dir=".")
    print("wrote example_2_composite.png + TSV reports")


if __name__ == "__main__":
    main()
