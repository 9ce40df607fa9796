"""Batch CLI: one-pass pipeline over a whole attribute file."""

import pickle

import networkx as nx
import numpy as np
import pytest

from safepy_tpu import cli


@pytest.fixture
def workspace(tmp_path, rng):
    n = 50
    g = nx.connected_watts_strogatz_graph(n, 4, 0.2, seed=2)
    net = tmp_path / "net.txt"
    with open(net, "w") as f:
        for u, v in g.edges():
            f.write(f"g{u}\tg{v}\t1.0\n")

    attrs = tmp_path / "attrs.txt"
    with open(attrs, "w") as f:
        f.write("gene\tq1\tq2\n")
        for i in range(n):
            f.write(f"g{i}\t{rng.normal():.4f}\t{rng.normal():.4f}\n")

    ini = tmp_path / "run.ini"
    ini.write_text(f"""[Input files]
networkfile = {net}
annotationfile = {attrs}
[Analysis parameters]
randomSeed = 9
""")
    return str(ini), str(attrs), tmp_path


def test_cli_main(workspace):
    ini, attrs, tmp = workspace
    out = tmp / "nes.p"
    rc = cli.main([attrs, "--ini", ini, "--num-permutations", "50",
                   "--output", str(out)])
    assert rc == 0
    with open(out, "rb") as f:
        nes = pickle.load(f)
    assert nes.shape == (50, 2)
    assert np.isfinite(nes).any()


def test_cli_mesh(workspace):
    """--mesh reaches the sharded engines through the same one-pass batch."""
    ini, attrs, tmp = workspace
    out = tmp / "nes_mesh.p"
    rc = cli.main([attrs, "--ini", ini, "--num-permutations", "50",
                   "--mesh", "perm=8", "--output", str(out)])
    assert rc == 0
    with open(out, "rb") as f:
        nes = pickle.load(f)
    assert nes.shape == (50, 2)


def test_parse_mesh_axes():
    mesh = cli.parse_mesh("data=2,perm=4")
    assert mesh.shape == {"data": 2, "perm": 4}
    assert cli.parse_mesh("auto").shape == {"attr": 8}
