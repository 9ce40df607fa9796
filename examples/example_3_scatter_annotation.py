"""Example 3 — annotating a scatter embedding (UMAP/t-SNE style).

Reference analog: Example_3_Scatterplot_annotation.ipynb — a `.scatter` file of
node coordinates with no edges; neighborhoods are euclidean balls, and the
unimodality check runs on the euclidean pseudo-network the loader builds
(safe.py:302-309 in the reference).
"""

import os
import tempfile

import numpy as np
import pandas as pd

from safepy_tpu import SAFE


def main():
    rng = np.random.default_rng(0)
    n = 600
    # three gaussian blobs, like a 2-D embedding of cell types
    centers = np.array([[0, 0], [4, 1], [2, 4]])
    assign = rng.integers(0, 3, n)
    coords = centers[assign] + rng.normal(scale=0.7, size=(n, 2))

    scatter_path = os.path.join(tempfile.mkdtemp(), "embedding.scatter")
    with open(scatter_path, "w") as f:
        f.write("key\tx\ty\tlabel\n")
        for i in range(n):
            f.write(f"cell{i}\t{coords[i,0]:.4f}\t{coords[i,1]:.4f}\tcell{i}\n")

    # per-cluster marker "genes" with noise
    attr = pd.DataFrame(
        {f"marker of blob {c}": ((assign == c) & (rng.random(n) < 0.8)).astype(float)
         for c in range(3)},
        index=[f"cell{i}" for i in range(n)])

    sf = SAFE(verbose=False)
    sf.load_network(network_file=scatter_path, node_key_attribute="key")
    sf.define_neighborhoods(node_distance_metric="euclidean",
                            neighborhood_radius=0.15)
    sf.load_attributes(attribute_file=attr)
    sf.compute_pvalues()
    sf.define_top_attributes(attribute_enrichment_min_size=5)

    print(sf.attributes[["name", "num_neighborhoods_enriched", "top"]])
    sf.plot_sample_attributes(attributes=["marker of blob 0"],
                              show_network=False, show_network_contour=False,
                              save_fig="example_3_scatter.png")
    print("wrote example_3_scatter.png")


if __name__ == "__main__":
    main()
