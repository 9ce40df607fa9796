"""Golden-value regression tests on the vendored miniature dataset.

The reference pins golden statistics on the (non-vendored) Costanzo-2016 data
(tests/test_neighborhoods.py, tests/test_enrichments.py in the reference); these
pin the same observables on a checked-in 200-node network so environment drift
(networkx layout changes, jax numerics) is caught even where the oracle tests
would drift along. Values frozen 2026-08-16 with networkx 3.6.1 / jax 0.9.
"""

import numpy as np
import pytest

from safepy_tpu import SAFE

NETWORK = "tests/data/mini_network.txt"
ATTRIBUTES = "tests/data/mini_attributes.txt"


@pytest.fixture(scope="module")
def sf():
    sf = SAFE(verbose=False)
    sf.random_seed = 77
    sf.load_network(network_file=NETWORK, node_key_attribute="key")
    return sf


def test_default_neighborhood_stats(sf):
    sf.define_neighborhoods()
    ns = sf.neighborhoods.sum(1)
    assert ns.mean() == pytest.approx(2.83, abs=0.01)
    assert ns.std() == pytest.approx(1.1752, abs=0.01)


def test_hypergeom_enrichment_counts(sf):
    sf.define_neighborhoods()
    sf.load_attributes(attribute_file=ATTRIBUTES)
    sf.compute_pvalues()
    assert int((sf.nes_binary > 0).sum()) == 39
    assert sf.attributes["num_neighborhoods_enriched"].tolist() == \
        [11.0, 10.0, 8.0, 6.0, 4.0]


def test_shortpath_neighborhood_stats(sf):
    sf.define_neighborhoods(node_distance_metric="shortpath",
                            neighborhood_radius=2)
    ns = sf.neighborhoods.sum(1)
    assert ns.mean() == pytest.approx(25.4, abs=0.01)
    assert ns.std() == pytest.approx(6.049, abs=0.01)
