"""Config system: layered INI parsing, path resolution, validation restore-and-raise."""

import os

import pytest

from safepy_tpu import SAFE
from safepy_tpu.config import read_config


def test_defaults():
    cfg, defaults = read_config()
    assert cfg.node_distance_metric == "shortpath_weighted_layout"
    assert cfg.neighborhood_radius == 0.1
    assert cfg.neighborhood_radius_type == "diameter"
    assert cfg.attribute_distance_metric == "jaccard"
    assert cfg.attribute_distance_threshold == 0.75
    assert cfg.attribute_sign == "both"
    assert cfg.background == "attribute_file"
    assert cfg.random_seed is None
    assert cfg.path_to_network_file == "networks/Costanzo_Science_2016.gpickle"


def test_user_ini_overlay(tmp_path):
    ini = tmp_path / "custom.ini"
    ini.write_text("""[Input files]
safe_data = /data/safe/
networkfile = networks/my_net.txt
annotationfile = attributes/my_attrs.txt
[Analysis parameters]
nodeDistanceType = euclidean
neighborhoodRadius = 0.25
randomSeed = 123
""")
    cfg, _ = read_config(str(ini))
    assert cfg.path_to_network_file == "/data/safe/networks/my_net.txt"
    assert cfg.path_to_attribute_file == "/data/safe/attributes/my_attrs.txt"
    assert cfg.node_distance_metric == "euclidean"
    assert cfg.neighborhood_radius == 0.25
    assert cfg.random_seed == 123
    assert cfg.output_dir == str(tmp_path)


def test_safe_data_requires_trailing_slash(tmp_path):
    ini = tmp_path / "bad.ini"
    ini.write_text("[Input files]\nsafe_data = /data/safe\n")
    with pytest.raises(AssertionError):
        read_config(str(ini))


def test_explicit_safe_data_argument():
    cfg, _ = read_config("", path_to_safe_data="/custom/root/")
    assert cfg.path_to_network_file.startswith("/custom/root/")


def test_inline_comments_stripped():
    cfg, _ = read_config()
    # annotationsign has an inline '# OPTIONS:' comment in the INI
    assert cfg.attribute_sign == "both"


@pytest.mark.parametrize("attr,bad,default", [
    ("background", "nope", "attribute_file"),
    ("node_distance_metric", "nope", "shortpath_weighted_layout"),
    ("attribute_sign", "nope", "both"),
    ("num_permutations", 3, 1000),
    ("enrichment_threshold", 1.5, 0.05),
    ("enrichment_max_log10", "x", 16),
    ("attribute_enrichment_min_size", 1, 10),
    ("attribute_distance_threshold", 2.0, 0.75),
])
def test_validation_restores_default(attr, bad, default):
    sf = SAFE(verbose=False)
    setattr(sf, attr, bad)
    with pytest.raises(ValueError):
        sf.validate_config()
    assert getattr(sf, attr) == default
