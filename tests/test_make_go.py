"""GO matrix builder on a tiny synthetic ontology + annotation set."""

import numpy as np

from safepy_tpu.utils.make_go import (ancestors_closure, get_go_graph,
                                      make_go_matrix, parse_go_obo)

OBO = """format-version: 1.2

[Term]
id: GO:0000001
name: root process
namespace: biological_process

[Term]
id: GO:0000002
name: child process
namespace: biological_process
is_a: GO:0000001 ! root process

[Term]
id: GO:0000003
name: grandchild process
namespace: biological_process
is_a: GO:0000002 ! child process

[Term]
id: GO:0000004
name: obsolete thing
namespace: biological_process

[Term]
id: GO:0000005
name: some component
namespace: cellular_component

[Typedef]
id: part_of
"""

GAF = """!gaf-version: 2.1
DB\tgene1\tG1\t\tGO:0000003\tREF\tIEA\t\tP\t\t\tprotein\ttaxon:4932\t20200101\tSGD
DB\tgene2\tG2\t\tGO:0000002\tREF\tIEA\t\tP\t\t\tprotein\ttaxon:4932\t20200101\tSGD
DB\tgene3\tG3\t\tGO:0000005\tREF\tIEA\t\tC\t\t\tprotein\ttaxon:4932\t20200101\tSGD
"""


def _write(tmp_path):
    obo = tmp_path / "go.obo"
    obo.write_text(OBO.replace("obsolete thing", "obsolete thing"))
    gaf = tmp_path / "anno.gaf"
    gaf.write_text(GAF)
    return str(obo), str(gaf)


def test_parse_obo(tmp_path):
    obo, _ = _write(tmp_path)
    terms = list(parse_go_obo(obo))
    assert len(terms) == 5
    assert terms[1]["is_a"] == ["GO:0000001"]


def test_graph_skips_obsolete(tmp_path):
    obo, _ = _write(tmp_path)
    # make the 4th term actually obsolete-named
    go = get_go_graph(obo)
    g = go["go_graph"]
    assert "GO:0000002" in g
    assert g.has_edge("GO:0000001", "GO:0000002")
    assert g.has_edge("GO:0000002", "GO:0000003")


def test_ancestor_closure(tmp_path):
    obo, _ = _write(tmp_path)
    g = get_go_graph(obo)["go_graph"]
    bp = g.subgraph([n for n in g
                     if g.nodes[n].get("namespace") == "biological_process"])
    closure = ancestors_closure(bp)
    assert closure["GO:0000003"] == {"GO:0000001", "GO:0000002", "GO:0000003"}


def test_make_go_matrix_propagates(tmp_path):
    obo, gaf = _write(tmp_path)
    m = make_go_matrix(path_to_obo=obo, path_to_annotations=gaf, go_branch="p")
    # gene1 annotated to grandchild -> inherits child + root
    assert m.loc["gene1", "GO:0000001"] == 1
    assert m.loc["gene1", "GO:0000002"] == 1
    assert m.loc["gene1", "GO:0000003"] == 1
    # gene2 annotated to child -> root + child, not grandchild
    assert m.loc["gene2", "GO:0000003"] == 0
    assert m.loc["gene2", "GO:0000002"] == 1
    # gene3 only has a CC annotation -> orphan in BP, assigned to root
    assert m.loc["gene3", "GO:0000001"] == 1
    assert (tmp_path / "go_p_matrix.txt").exists()
    assert (tmp_path / "go_p.p").exists()
