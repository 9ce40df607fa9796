"""API edge cases: forced engines, fill values, no-domain reports."""

import os

import networkx as nx
import numpy as np
import pandas as pd
import pytest

from safepy_tpu import SAFE


@pytest.fixture(scope="module")
def sf(tmp_path_factory):
    g = nx.connected_watts_strogatz_graph(50, 4, 0.2, seed=6)
    path = tmp_path_factory.mktemp("edges") / "net.txt"
    with open(path, "w") as f:
        for u, v in g.edges():
            f.write(f"g{u}\tg{v}\t1.0\n")
    sf = SAFE(verbose=False)
    sf.random_seed = 13
    sf.load_network(network_file=str(path), node_key_attribute="key")
    sf.define_neighborhoods()
    return sf


def test_forced_randomization_on_binary(sf, rng):
    """enrichment_type='randomization' overrides the auto binary dispatch
    (reference: safe.py:463-466)."""
    n = sf.graph.number_of_nodes()
    df = pd.DataFrame((rng.random((n, 2)) < 0.3).astype(float),
                      index=[f"g{i}" for i in range(n)], columns=["a", "b"])
    sf.load_attributes(attribute_file=df)
    sf.compute_pvalues(how="randomization", num_permutations=50)
    assert sf.pvalues_neg is not None  # randomization engine ran (two-sided)


def test_forced_hypergeom_on_binary(sf, rng):
    n = sf.graph.number_of_nodes()
    df = pd.DataFrame((rng.random((n, 2)) < 0.3).astype(float),
                      index=[f"g{i}" for i in range(n)], columns=["a", "b"])
    sf.load_attributes(attribute_file=df)
    sf.pvalues_neg = None
    sf.compute_pvalues(how="hypergeometric")
    assert sf.pvalues_neg is None  # one-sided engine
    assert sf.pvalues_pos is not None


def test_fill_value_kwarg(sf):
    """load_attributes forwards read_attributes kwargs (fill_value for
    unmatched nodes, reference safe_io.py:336)."""
    df = pd.DataFrame({"a": [1.0]}, index=["g0"])
    sf.load_attributes(attribute_file=df, fill_value=0.0)
    assert sf.node2attribute[1, 0] == 0.0  # unmatched node filled with 0
    sf.load_attributes(attribute_file=df)
    assert np.isnan(sf.node2attribute[1, 0])  # default NaN fill


def test_output_files_without_domains(sf, rng, tmp_path):
    """print_output_files emits the full NES table when no domains were
    computed (reference: safe.py:1298-1304)."""
    n = sf.graph.number_of_nodes()
    df = pd.DataFrame(rng.normal(size=(n, 2)),
                      index=[f"g{i}" for i in range(n)], columns=["u", "v"])
    sf.load_attributes(attribute_file=df)
    sf.compute_pvalues(num_permutations=50)
    sf.node2domain = None
    sf.domains = None
    sf.print_output_files(output_dir=str(tmp_path))
    nodes = pd.read_csv(tmp_path / "node_properties_annotation.txt", sep="\t",
                        index_col=0)
    assert "u" in nodes.columns and "v" in nodes.columns
    assert nodes.shape[0] == n
    assert not os.path.exists(tmp_path / "domain_properties_annotation.txt")


def test_neighborhood_radius_kwarg_roundtrip(sf):
    sf.define_neighborhoods(neighborhood_radius=0.25)
    assert sf.neighborhood_radius == 0.25
    sf.define_neighborhoods(neighborhood_radius=0.1)
    assert sf.neighborhood_radius == 0.1


def test_run_permutations_reference_signature():
    """safe.run_permutations mirrors the reference's star-imported pool worker
    (safe_extras.py:36-70): arg tuple in, two count stacks out."""
    import numpy as np

    from safepy_tpu import safe as safe_mod

    rng = np.random.default_rng(0)
    n = 40
    nbr = (rng.random((n, n)) < 0.2).astype(float)
    np.fill_diagonal(nbr, 1.0)
    n2a = rng.normal(size=(n, 2))
    counts_neg, counts_pos = safe_mod.run_permutations(
        (nbr, n2a, "sum", 20, 7))
    assert counts_neg.shape == (n, 2)
    assert ((counts_neg + counts_pos) >= 20).all()  # ties on both sides


def test_num_other_census_cached_and_invalidated():
    """The device-side binary-detection census must invalidate when the
    annotation matrix changes (load_attributes / background='network')."""
    import networkx as nx
    import numpy as np
    import pandas as pd
    from safepy_tpu import SAFE

    n = 40
    rng = np.random.default_rng(0)
    g = nx.Graph()
    g.add_nodes_from(range(n))
    for i in range(n - 1):
        g.add_edge(i, i + 1)
    for i in range(n):
        g.nodes[i]["label"] = g.nodes[i]["key"] = f"g{i}"
        g.nodes[i]["x"] = float(i)
        g.nodes[i]["y"] = 0.0
    from safepy_tpu.io.layout import calculate_edge_lengths
    calculate_edge_lengths(g, verbose=False)

    sf = SAFE(verbose=False)
    sf.load_network(network_file=g, node_key_attribute="key")

    quant = pd.DataFrame(rng.normal(size=(n, 2)),
                         index=[f"g{i}" for i in range(n)],
                         columns=["a", "b"])
    sf.load_attributes(attribute_file=quant)
    assert sf._num_other_values() > 0
    assert sf._num_other_cache is not None  # cached

    binary = pd.DataFrame((rng.random((n, 2)) < 0.3).astype(float),
                          index=[f"g{i}" for i in range(n)],
                          columns=["a", "b"])
    sf.load_attributes(attribute_file=binary)
    assert sf._num_other_cache is None  # invalidated by the reload
    assert sf._num_other_values() == 0
