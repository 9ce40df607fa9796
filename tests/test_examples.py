"""The shipped examples must actually run.

The reference ships a notebook (Example_3_Scatterplot_annotation.ipynb) whose
cells read the external safe-data checkout; the repo's notebook is
self-contained, so we can execute its code cells end-to-end here. Marked slow
(full pipeline + plots, ~1 min on the CPU mesh).
"""

import json
import os

import matplotlib
import pytest

matplotlib.use("Agg")

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_notebook(name):
    path = os.path.join(ROOT, "examples", name)
    nb = json.load(open(path))
    src = "\n".join(
        "".join(c["source"]).replace("%matplotlib inline", "")
        for c in nb["cells"] if c["cell_type"] == "code")
    ns = {}
    exec(compile(src, path, "exec"), ns)  # noqa: S102 - our own notebook
    return ns


@pytest.mark.slow
def test_example1_notebook_executes():
    """Example_1 (reference analog: Example_1_GI_network_doxorubicin.ipynb,
    README.md:27-35 'hello world') — quantitative permutation workflow."""
    ns = _run_notebook("Example_1_GI_network_quantitative.ipynb")
    sf = ns["sf"]
    assert int((sf.nes_binary > 0).sum()) > 100  # the planted region enriches
    assert sorted(os.listdir(ns["outdir"])) == [
        "attribute_properties_annotation.txt",
        "node_properties_annotation.txt"]


@pytest.mark.slow
def test_example2_notebook_executes():
    """Example_2 (reference analog: the GO-annotation notebook) — binary
    hypergeometric workflow through domains + composite plot."""
    ns = _run_notebook("Example_2_GO_annotations.ipynb")
    sf = ns["sf"]
    assert sf._hypergeom_engine_used == "loop-dense-staged"
    # the 20 planted modules must dominate the top attributes and cluster
    assert int(sf.attributes["top"].sum()) >= 10
    assert len(sf.domains) >= 3  # incl. the id-0 pseudo-domain


@pytest.mark.slow
def test_example3_notebook_executes():
    path = os.path.join(ROOT, "examples",
                        "Example_3_Scatterplot_annotation.ipynb")
    nb = json.load(open(path))
    src = "\n".join(
        "".join(c["source"]).replace("%matplotlib inline", "")
        for c in nb["cells"] if c["cell_type"] == "code")
    ns = {}
    exec(compile(src, path, "exec"), ns)  # noqa: S102 - our own notebook
    sf = ns["sf"]
    # all three blob markers enrich strongly; blob 2's enriched region is
    # multimodal on the euclidean pseudo-network at this radius, so the
    # reference's unimodality gate (safe.py:640-652) keeps 2 of 3 as top
    assert (sf.attributes["num_neighborhoods_enriched"] > 100).all()
    assert int(sf.attributes["top"].sum()) == 2
