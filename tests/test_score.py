"""Neighborhood score parity with a NumPy reimplementation of the reference
semantics (safepy/safe_extras.py:6-33)."""

import numpy as np

from safepy_tpu.ops.score import compute_neighborhood_score


def _numpy_oracle(nbr, n2a, score_type):
    with np.errstate(invalid="ignore", divide="ignore"):
        A = nbr
        B = np.where(~np.isnan(n2a), n2a, 0)
        AB = A @ B
        if score_type == "sum":
            return AB
        NB = np.where(~np.isnan(n2a), 1, 0)
        N = A @ NB
        M = AB / N
        EXX = (A @ (B ** 2)) / N
        std = np.sqrt(EXX - M ** 2)
        out = M / std
        out[std == 0] = np.nan
        out[N < 3] = np.nan
        return out


def _random_inputs(rng, n=64, a=7, nan_frac=0.3):
    nbr = (rng.random((n, n)) < 0.2).astype(float)
    np.fill_diagonal(nbr, 1.0)
    n2a = rng.normal(size=(n, a))
    n2a[rng.random((n, a)) < nan_frac] = np.nan
    return nbr, n2a


def test_sum_score(rng):
    nbr, n2a = _random_inputs(rng)
    got = np.asarray(compute_neighborhood_score(nbr, n2a, "sum"))
    want = _numpy_oracle(nbr, n2a, "sum")
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_zscore(rng):
    nbr, n2a = _random_inputs(rng)
    got = np.asarray(compute_neighborhood_score(nbr, n2a, "z-score"))
    want = _numpy_oracle(nbr, n2a, "z-score")
    np.testing.assert_array_equal(np.isnan(got), np.isnan(want))
    ok = ~np.isnan(want)
    np.testing.assert_allclose(got[ok], want[ok], rtol=1e-3, atol=1e-4)


def test_all_nan_column(rng):
    nbr, n2a = _random_inputs(rng)
    n2a[:, 2] = np.nan
    got = np.asarray(compute_neighborhood_score(nbr, n2a, "sum"))
    np.testing.assert_array_equal(got[:, 2], 0.0)
    gotz = np.asarray(compute_neighborhood_score(nbr, n2a, "z-score"))
    assert np.isnan(gotz[:, 2]).all()
