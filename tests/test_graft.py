"""Driver entry points: single-chip compile + multi-chip dry run."""

import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, "/root/repo")

import __graft_entry__ as ge


def test_entry_compiles_and_runs():
    fn, args = ge.entry()
    compiled = jax.jit(fn).lower(*args).compile()
    cn, cp, obs = compiled(*args)
    cn = np.asarray(cn)
    assert cn.shape == np.asarray(obs).shape
    assert cn.max() <= 32


@pytest.mark.slow
def test_dryrun_multichip_8():
    ge.dryrun_multichip(8)


@pytest.mark.slow
def test_dryrun_multichip_2():
    ge.dryrun_multichip(2)
