"""Matmul precision knob: 'default' (fast bf16 MXU path) agrees statistically
with 'highest' (exact f32) on the permutation null."""

import networkx as nx
import numpy as np
import pandas as pd
import pytest

from safepy_tpu import SAFE


def test_precision_modes_agree(tmp_path, rng):
    n = 80
    g = nx.connected_watts_strogatz_graph(n, 6, 0.3, seed=12)
    path = tmp_path / "net.txt"
    with open(path, "w") as f:
        for u, v in g.edges():
            f.write(f"g{u}\tg{v}\t1.0\n")

    vals = rng.normal(size=(n, 1))
    results = {}
    for precision in ("highest", "default"):
        sf = SAFE(verbose=False)
        sf.random_seed = 9
        sf.matmul_precision = precision
        sf.load_network(network_file=str(path), node_key_attribute="key")
        sf.load_attributes(attribute_file=pd.DataFrame(
            vals, index=[f"g{i}" for i in range(n)], columns=["q"]))
        sf.run_pipeline(num_permutations=200)
        results[precision] = sf.pvalues_pos.copy()

    # same seed, same permutations; only matmul rounding differs -> p-values
    # shift by at most a few counts at exact ties
    diff = np.abs(results["highest"] - results["default"])
    assert np.nanmax(diff) <= 5 / 200.0
    # and the bulk is identical
    assert np.mean(diff == 0) > 0.9
