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
