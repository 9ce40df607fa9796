"""Differential parity against the ACTUAL reference implementation.

Every other test pins kernels against independent oracles (scipy / networkx); this
module runs the reference framework itself (/root/reference, imported via
tests/reference_compat.py) and ours on the same input files with the same seed and
asserts the BASELINE.json metric directly:

  * loader + layout chain bit-identical (same node order, same spring coordinates,
    edge lengths <= 1e-12 — reference safe_io.py:30-121, 288-333),
  * neighborhoods binary-identical (reference safe.py:369-430),
  * hypergeometric p-values and NES within 1e-6 absolute (reference safe.py:556-608;
    measured ~2e-12 on the planted network),
  * permutation-null p-values within a per-cell binomial tolerance — the RNG streams
    are deliberately different (keyed JAX permutations vs NumPy in-place shuffles,
    reference safe_extras.py:36-70), so parity is distributional, like the
    reference's own 637+/-20 assertion (reference tests/test_enrichments.py:98-101),
  * identical top attributes, domains, and node-to-domain assignment on a fixed
    seed (reference safe.py:610-745).

The planted network (4 communities, one binary attribute per community) guarantees
top attributes and multiple domains exist, which the vendored mini network is too
sparse for.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import networkx as nx

import reference_compat

ref = reference_compat.load_reference()

pytestmark = pytest.mark.skipif(ref is None, reason="/root/reference not available")

SEED = 2024
N_PERM = 500


def _planted_network(rng, n=240, communities=4):
    comm = np.repeat(np.arange(communities), n // communities)
    edges = []
    for i in range(n):
        for j in range(i + 1, n):
            p = 0.12 if comm[i] == comm[j] else 0.004
            if rng.random() < p:
                edges.append((f"g{i}", f"g{j}"))
    return comm, edges


@pytest.fixture(scope="module")
def planted_files(tmp_path_factory):
    """Planted-community network + binary and quantitative attribute files."""
    tmp = tmp_path_factory.mktemp("refparity")
    rng = np.random.default_rng(7)
    n, communities = 240, 4
    comm, edges = _planted_network(rng, n, communities)

    net_file = tmp / "net.txt"
    net_file.write_text("".join(f"{a}\t{b}\t1.0\n" for a, b in edges))

    binary = np.zeros((n, 5))
    for c in range(communities):
        binary[:, c] = ((comm == c) & (rng.random(n) < 0.8)).astype(float)
    binary[:, 4] = (rng.random(n) < 0.3).astype(float)
    bin_df = pd.DataFrame(binary, columns=[f"attr{k}" for k in range(5)])
    bin_df.insert(0, "gene", [f"g{i}" for i in range(n)])
    bin_file = tmp / "attr_binary.txt"
    bin_df.to_csv(bin_file, sep="\t", index=False)

    quant = rng.normal(size=(n, 2))
    quant[rng.random(n) < 0.3, 0] = np.nan
    quant_df = pd.DataFrame(quant, columns=["q0", "q1"])
    quant_df.insert(0, "gene", [f"g{i}" for i in range(n)])
    quant_file = tmp / "attr_quant.txt"
    quant_df.to_csv(quant_file, sep="\t", index=False)

    return {"net": str(net_file), "binary": str(bin_file), "quant": str(quant_file)}


def _run_reference(net_file, attr_file, **pv_kwargs):
    sf = ref.SAFE()
    sf.random_seed = SEED
    sf.load_network(network_file=net_file)
    sf.load_attributes(attribute_file=attr_file)
    sf.define_neighborhoods()
    sf.compute_pvalues(**pv_kwargs)
    return sf


def _run_ours(net_file, attr_file, **pv_kwargs):
    from safepy_tpu import SAFE

    sf = SAFE(verbose=False)
    sf.random_seed = SEED
    sf.load_network(network_file=net_file, node_key_attribute="key")
    sf.load_attributes(attribute_file=attr_file)
    sf.define_neighborhoods()
    sf.compute_pvalues(**pv_kwargs)
    return sf


@pytest.fixture(scope="module")
def binary_runs(planted_files):
    rsf = _run_reference(planted_files["net"], planted_files["binary"])
    osf = _run_ours(planted_files["net"], planted_files["binary"])
    for sf in (rsf, osf):
        sf.define_top_attributes()
        sf.define_domains()
        sf.trim_domains()
    return rsf, osf


@pytest.fixture(scope="module")
def quant_runs(planted_files):
    rsf = _run_reference(planted_files["net"], planted_files["quant"],
                         num_permutations=N_PERM)
    osf = _run_ours(planted_files["net"], planted_files["quant"],
                    num_permutations=N_PERM)
    return rsf, osf


def test_loader_and_layout_parity(binary_runs):
    rsf, osf = binary_runs
    assert list(rsf.nodes["key"]) == list(osf.nodes["key"])
    ref_coords = np.array([[rsf.graph.nodes[i]["x"], rsf.graph.nodes[i]["y"]]
                           for i in rsf.graph])
    our_coords = np.array([[osf.graph.nodes[i]["x"], osf.graph.nodes[i]["y"]]
                           for i in osf.graph])
    # same networkx spring_layout call, same seed -> bit-identical coordinates
    np.testing.assert_array_equal(ref_coords, our_coords)
    ref_len = nx.get_edge_attributes(rsf.graph, "length")
    our_len = nx.get_edge_attributes(osf.graph, "length")
    assert set(map(frozenset, ref_len)) == set(map(frozenset, our_len))
    for edge, length in ref_len.items():
        ours = our_len.get(edge, our_len.get((edge[1], edge[0])))
        # O(E) endpoint math vs the reference's dense pdist (safe_io.py:318-331)
        assert abs(length - ours) <= 1e-12


def test_neighborhoods_binary_identical(binary_runs):
    rsf, osf = binary_runs
    ref_nbr = np.asarray(rsf.neighborhoods)
    our_nbr = np.asarray(osf.neighborhoods)
    mismatches = int(np.sum(ref_nbr != our_nbr))
    assert mismatches == 0, f"{mismatches} neighborhood cells differ"


def test_hypergeom_pvalue_parity(binary_runs):
    rsf, osf = binary_runs
    assert np.nanmax(np.abs(rsf.pvalues_pos - osf.pvalues_pos)) <= 1e-6
    assert np.nanmax(np.abs(rsf.nes - osf.nes)) <= 1e-6
    np.testing.assert_array_equal(rsf.nes_binary, osf.nes_binary)
    np.testing.assert_array_equal(
        rsf.attributes["num_neighborhoods_enriched"].to_numpy(),
        osf.attributes["num_neighborhoods_enriched"].to_numpy())


def test_hypergeom_fdr_parity(planted_files):
    rsf = _run_reference(planted_files["net"], planted_files["binary"],
                         multiple_testing=True)
    osf = _run_ours(planted_files["net"], planted_files["binary"],
                    multiple_testing=True)
    assert np.nanmax(np.abs(rsf.pvalues_pos - osf.pvalues_pos)) <= 1e-6
    np.testing.assert_array_equal(rsf.nes_binary, osf.nes_binary)


def test_domains_identical(binary_runs):
    rsf, osf = binary_runs
    np.testing.assert_array_equal(rsf.attributes["top"].to_numpy(),
                                  osf.attributes["top"].to_numpy())
    assert len(rsf.domains) == len(osf.domains)
    np.testing.assert_array_equal(
        np.asarray(rsf.node2domain["primary_domain"]),
        np.asarray(osf.node2domain["primary_domain"]))
    assert list(rsf.domains["label"]) == list(osf.domains["label"])


def test_permutation_null_within_binomial_tolerance(quant_runs):
    rsf, osf = quant_runs
    # observed scores: deterministic, f32 GEMM vs f64 BLAS
    assert np.nanmax(np.abs(rsf.ns - osf.ns)) <= 1e-5
    np.testing.assert_array_equal(np.isnan(rsf.pvalues_pos),
                                  np.isnan(osf.pvalues_pos))
    for ref_p, our_p in ((rsf.pvalues_pos, osf.pvalues_pos),
                         (rsf.pvalues_neg, osf.pvalues_neg)):
        pooled = (np.nan_to_num(ref_p) + np.nan_to_num(our_p)) / 2
        # both estimates are Binomial(P, p)/P draws from independent streams:
        # 6 sigma of the difference + discretization slack
        tol = 6 * np.sqrt(pooled * (1 - pooled) * 2 / N_PERM) + 3 / N_PERM
        diff = np.abs(np.nan_to_num(ref_p) - np.nan_to_num(our_p))
        assert np.all(diff <= tol), \
            f"max excess {np.max(diff - tol)} at p~{pooled[diff - tol > 0]}"
    ref_enriched = int(rsf.nes_binary.sum())
    our_enriched = int(osf.nes_binary.sum())
    assert abs(ref_enriched - our_enriched) <= max(10, 0.3 * ref_enriched), \
        (ref_enriched, our_enriched)


def test_mini_network_parity():
    """The vendored mini dataset through both frameworks (hypergeometric)."""
    import os

    data = os.path.join(os.path.dirname(__file__), "data")
    net = os.path.join(data, "mini_network.txt")
    attrs = os.path.join(data, "mini_attributes.txt")
    rsf = _run_reference(net, attrs)
    osf = _run_ours(net, attrs)
    np.testing.assert_array_equal(np.asarray(rsf.neighborhoods),
                                  np.asarray(osf.neighborhoods))
    assert np.nanmax(np.abs(rsf.pvalues_pos - osf.pvalues_pos)) <= 1e-6
    np.testing.assert_array_equal(rsf.nes_binary, osf.nes_binary)


def test_zscore_engine_parity(planted_files):
    """z-score observed scores match the reference (safe_extras.py:19-31) and
    the null behaves identically on the NaN mask."""
    rsf = _run_reference(planted_files["net"], planted_files["quant"],
                         neighborhood_score_type="z-score",
                         num_permutations=150)
    osf = _run_ours(planted_files["net"], planted_files["quant"],
                    neighborhood_score_type="z-score",
                    num_permutations=150)
    np.testing.assert_array_equal(np.isnan(rsf.ns), np.isnan(osf.ns))
    finite = ~np.isnan(rsf.ns)
    # centered contractions (ops.score.zscore_shift) remove the f32
    # E[X^2]-E[X]^2 cancellation; the residual is the plain f32 GEMM
    # accumulation floor (~sqrt(|nbhd|) ulps ~ 1.5e-6 max here) vs the f64
    # host path — 500x tighter than the pre-shift rtol=1e-3
    np.testing.assert_allclose(rsf.ns[finite], osf.ns[finite],
                               rtol=2e-6, atol=2e-6)
    np.testing.assert_array_equal(np.isnan(rsf.pvalues_pos),
                                  np.isnan(osf.pvalues_pos))


@pytest.mark.parametrize("metric_kwargs", [
    {"node_distance_metric": "euclidean"},
    {"node_distance_metric": "shortpath", "neighborhood_radius": 2},
])
def test_other_metrics_neighborhoods_identical(planted_files, metric_kwargs):
    """euclidean and hop-count metrics match the reference binary-exactly
    (reference safe.py:389-410; mirrors its tests/test_neighborhoods.py trio)."""
    from safepy_tpu import SAFE

    rsf = ref.SAFE()
    rsf.random_seed = SEED
    rsf.load_network(network_file=planted_files["net"])
    rsf.define_neighborhoods(**metric_kwargs)

    osf = SAFE(verbose=False)
    osf.random_seed = SEED
    osf.load_network(network_file=planted_files["net"], node_key_attribute="key")
    osf.define_neighborhoods(**metric_kwargs)

    np.testing.assert_array_equal(np.asarray(rsf.neighborhoods),
                                  np.asarray(osf.neighborhoods))


@pytest.mark.parametrize("metric_kwargs", [
    {"node_distance_metric": "shortpath", "neighborhood_radius": 2},
    {"node_distance_metric": "shortpath_weighted_layout"},
])
def test_band_engine_neighborhoods_match_reference(planted_files,
                                                   metric_kwargs):
    """The band-STORAGE engine — including the landmark (graph-derived)
    certificate for the hop metric, which has no Euclidean contract — must
    reproduce the reference's Dijkstra-cutoff neighborhoods binary-exactly
    (reference safe.py:403-415)."""
    from safepy_tpu import SAFE

    rsf = ref.SAFE()
    rsf.random_seed = SEED
    rsf.load_network(network_file=planted_files["net"])
    rsf.define_neighborhoods(**metric_kwargs)

    osf = SAFE(verbose=False)
    osf.random_seed = SEED
    osf.apsp_mode = "band"
    osf.load_network(network_file=planted_files["net"],
                     node_key_attribute="key")
    osf.define_neighborhoods(**metric_kwargs)

    from safepy_tpu.ops.apsp_bandstore import BandedMatrix
    assert isinstance(osf._neighborhoods_dev, BandedMatrix)
    np.testing.assert_array_equal(np.asarray(rsf.neighborhoods),
                                  np.asarray(osf.neighborhoods))


def test_cys_loader_parity(tmp_path, monkeypatch):
    """The stream-from-zip CYS loader produces the same graph as the
    reference's extract-to-cwd loader (safe_io.py:154-268)."""
    import zipfile

    from safepy_tpu.io.network import load_network_from_cys

    view = """<?xml version="1.0"?>
<graph xmlns:cy="http://www.cytoscape.org">
  <node label="geneA" cy:nodeId="101"><graphics x="0.0" y="0.0"/></node>
  <node label="geneB" cy:nodeId="102"><graphics x="1.0" y="0.5"/></node>
  <node label="geneC" cy:nodeId="103"><graphics x="0.2" y="1.0"/></node>
  <node label="geneD" cy:nodeId="104"><graphics x="0.8" y="0.1"/></node>
</graph>"""
    net = """<?xml version="1.0"?>
<graph>
  <edge source="101" target="102"/>
  <edge source="102" target="103"/>
  <edge source="103" target="104"/>
</graph>"""
    cytable = ("SUID,shared name,label_orf\n"
               "SUID,shared name,label_orf\n"
               "101,geneA,ORFA\n102,geneB,ORFB\n103,geneC,ORFC\n104,geneD,ORFD\n")
    bundle = tmp_path / "session.cys"
    with zipfile.ZipFile(bundle, "w") as zf:
        zf.writestr("session/views/view1.xgmml", view)
        zf.writestr("session/networks/net1.xgmml", net)
        zf.writestr("session/tables/net1/SHARED_ATTRSdef node.cytable", cytable)

    # the reference extracts into (and deletes from) the CURRENT directory
    monkeypatch.chdir(tmp_path)
    ref_graph = ref.load_network_from_cys(str(bundle), verbose=False)
    our_graph = load_network_from_cys(str(bundle), verbose=False)

    assert list(ref_graph.nodes) == list(our_graph.nodes)
    assert set(ref_graph.edges) == set(our_graph.edges)
    for node in ref_graph.nodes:
        for attr in ("label", "x", "y", "label_orf"):
            assert ref_graph.nodes[node][attr] == our_graph.nodes[node][attr], \
                (node, attr)
    ref_len = nx.get_edge_attributes(ref_graph, "length")
    our_len = nx.get_edge_attributes(our_graph, "length")
    for edge, length in ref_len.items():
        assert abs(length - our_len.get(
            edge, our_len.get((edge[1], edge[0])))) <= 1e-12


def test_scatter_workflow_parity(tmp_path):
    """Scatter input (positioned, edgeless): euclidean neighborhoods,
    hypergeometric enrichment, and the graph_euclidean pseudo-network match the
    reference (safe_io.py:271-285, safe.py:296-309)."""
    from safepy_tpu import SAFE

    rng = np.random.default_rng(11)
    n = 150
    coords = rng.uniform(0, 1, (n, 2))
    scatter = tmp_path / "embedding.scatter"
    with open(scatter, "w") as f:
        f.write("key\tx\ty\tlabel\n")
        for i in range(n):
            f.write(f"g{i}\t{coords[i, 0]:.6f}\t{coords[i, 1]:.6f}\tg{i}\n")
    binary = (coords[:, 0] < 0.4).astype(float)[:, None] * \
        (rng.random((n, 3)) < 0.8)
    attrs = pd.DataFrame(binary, columns=["a0", "a1", "a2"])
    attrs.insert(0, "gene", [f"g{i}" for i in range(n)])
    attr_file = tmp_path / "scatter_attrs.txt"
    attrs.to_csv(attr_file, sep="\t", index=False)

    rsf = ref.SAFE()
    rsf.load_network(network_file=str(scatter), node_key_attribute="key")
    rsf.load_attributes(attribute_file=str(attr_file))
    rsf.define_neighborhoods(node_distance_metric="euclidean")
    rsf.compute_pvalues()
    rsf.define_top_attributes(attribute_enrichment_min_size=3)

    osf = SAFE(verbose=False)
    osf.load_network(network_file=str(scatter), node_key_attribute="key")
    osf.load_attributes(attribute_file=str(attr_file))
    osf.define_neighborhoods(node_distance_metric="euclidean")
    osf.compute_pvalues()
    osf.define_top_attributes(attribute_enrichment_min_size=3)

    np.testing.assert_array_equal(np.asarray(rsf.neighborhoods),
                                  np.asarray(osf.neighborhoods))
    assert np.nanmax(np.abs(rsf.pvalues_pos - osf.pvalues_pos)) <= 1e-6
    assert set(rsf.graph_euclidean.edges) == set(osf.graph_euclidean.edges)
    np.testing.assert_array_equal(rsf.attributes["top"].to_numpy(),
                                  osf.attributes["top"].to_numpy())


def test_read_attributes_parity(tmp_path):
    """Attribute alignment matches the reference exactly: numeric coercion,
    duplicate-label averaging, node-order reindex with NaN fill
    (safe_io.py:336-430)."""
    from safepy_tpu.io.attributes import read_attributes

    attr_file = tmp_path / "attrs.txt"
    attr_file.write_text(
        "gene\tq0\tq1\n"
        "g2\t1.5\t0\n"
        "g0\t2.0\tbogus\n"     # non-numeric -> NaN
        "g2\t0.5\t4\n"         # duplicate label -> averaged with the first g2
        "gX\t9.0\t9\n"         # not in the network -> dropped by the reindex
    )
    order = ["g0", "g1", "g2", "g3"]

    ref_attrs, _, ref_values = ref.read_attributes(
        attribute_file=str(attr_file), node_label_order=order, verbose=False)
    our_attrs, _, our_values = read_attributes(
        attribute_file=str(attr_file), node_label_order=order, verbose=False)

    assert list(ref_attrs["name"]) == list(our_attrs["name"])
    np.testing.assert_array_equal(np.isnan(ref_values), np.isnan(our_values))
    finite = ~np.isnan(ref_values)
    np.testing.assert_allclose(ref_values[finite], our_values[finite],
                               rtol=1e-12)


def test_output_files_parity(binary_runs, tmp_path):
    """print_output_files writes the same three TSV reports as the reference
    (safe.py:1267-1306) — same columns, same values — on a run where no domain
    is trimmed (the reference's num_domains column is broken after a middle
    trim; see PARITY.md)."""
    rsf, osf = binary_runs
    ref_dir = tmp_path / "ref"
    our_dir = tmp_path / "ours"
    ref_dir.mkdir()
    our_dir.mkdir()
    rsf.output_dir = str(ref_dir)
    rsf.print_output_files()
    osf.print_output_files(output_dir=str(our_dir))

    for name in ("domain_properties_annotation.txt",
                 "attribute_properties_annotation.txt",
                 "node_properties_annotation.txt"):
        ref_table = pd.read_csv(ref_dir / name, sep="\t", index_col=0)
        our_table = pd.read_csv(our_dir / name, sep="\t", index_col=0)
        assert list(ref_table.columns) == list(our_table.columns), name
        assert len(ref_table) == len(our_table), name
        for col in ref_table.columns:
            ref_col = ref_table[col]
            if ref_col.dtype.kind in "fc":
                np.testing.assert_allclose(ref_col.to_numpy(),
                                           our_table[col].to_numpy(),
                                           rtol=1e-6, atol=1e-9,
                                           err_msg=f"{name}:{col}")
            else:
                assert list(ref_col.astype(str)) == \
                    list(our_table[col].astype(str)), f"{name}:{col}"


@pytest.mark.parametrize("seed,radius", [(21, 0.08), (22, 0.15), (23, 0.25)])
def test_randomized_differential_fuzz(tmp_path, seed, radius):
    """Randomized instances (geometry, density, radius) through both
    frameworks: neighborhoods binary-identical, hypergeometric p <= 1e-6."""
    from safepy_tpu import SAFE

    rng = np.random.default_rng(seed)
    n = 150
    coords = rng.uniform(0, 1, (n, 2))
    edges = []
    for i in range(n):
        for j in range(i + 1, n):
            if np.hypot(*(coords[i] - coords[j])) < rng.uniform(0.1, 0.2):
                edges.append((i, j))
    net = tmp_path / f"net{seed}.txt"
    net.write_text("".join(f"a{u}\ta{v}\t1.0\n" for u, v in edges))
    binary = (rng.random((n, 4)) < rng.uniform(0.1, 0.5, size=4)).astype(float)
    frame = pd.DataFrame(binary, columns=[f"b{k}" for k in range(4)])
    frame.insert(0, "gene", [f"a{i}" for i in range(n)])
    attr = tmp_path / f"attr{seed}.txt"
    frame.to_csv(attr, sep="\t", index=False)

    rsf = ref.SAFE()
    rsf.random_seed = seed
    rsf.load_network(network_file=str(net))
    rsf.load_attributes(attribute_file=str(attr))
    rsf.define_neighborhoods(neighborhood_radius=radius)
    rsf.compute_pvalues()

    osf = SAFE(verbose=False)
    osf.random_seed = seed
    osf.load_network(network_file=str(net), node_key_attribute="key")
    osf.load_attributes(attribute_file=str(attr))
    osf.define_neighborhoods(neighborhood_radius=radius)
    osf.compute_pvalues()

    np.testing.assert_array_equal(np.asarray(rsf.neighborhoods),
                                  np.asarray(osf.neighborhoods))
    assert np.nanmax(np.abs(rsf.pvalues_pos - osf.pvalues_pos)) <= 1e-6
    np.testing.assert_array_equal(rsf.nes_binary, osf.nes_binary)
