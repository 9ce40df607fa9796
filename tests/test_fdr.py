"""BH correction parity with the textbook Benjamini-Hochberg step-up procedure
(the reference uses statsmodels fdrcorrection, safepy/safe.py:538-542; statsmodels
is not in this image, so the oracle is the standard formula implemented directly)."""

import numpy as np

from safepy_tpu.ops.fdr import fdr_bh


def _bh_oracle(p):
    """statsmodels.stats.multitest.fdrcorrection(p)[1] semantics for a 1-D array."""
    p = np.asarray(p, float)
    m = len(p)
    order = np.argsort(p)
    ranked = p[order] * m / np.arange(1, m + 1)
    adjusted = np.minimum.accumulate(ranked[::-1])[::-1]
    adjusted = np.clip(adjusted, None, 1.0)
    out = np.empty_like(adjusted)
    out[order] = adjusted
    return out


def test_matches_bh(rng):
    p = rng.random((20, 57))
    got = np.asarray(fdr_bh(p))
    want = np.apply_along_axis(_bh_oracle, 1, p)
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_with_ties_and_extremes(rng):
    p = np.concatenate([np.zeros(3), np.ones(4), np.full(3, 0.5),
                        rng.random(10)])[None, :]
    got = np.asarray(fdr_bh(p))
    want = _bh_oracle(p[0])[None, :]
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_nan_rows_sane(rng):
    p = rng.random((4, 11))
    p[1, 3] = np.nan
    got = np.asarray(fdr_bh(p))
    assert np.isnan(got[1, 3])
    # finite entries of the NaN row match BH on the NaN-free subset
    finite = ~np.isnan(p[1])
    want = _bh_oracle(p[1][finite])
    np.testing.assert_allclose(got[1][finite], want, rtol=1e-12)
    # other rows unaffected
    np.testing.assert_allclose(got[0], _bh_oracle(p[0]), rtol=1e-12)
