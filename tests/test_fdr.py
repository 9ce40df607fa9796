"""BH correction parity with the textbook Benjamini-Hochberg step-up procedure
(the reference uses statsmodels fdrcorrection, safepy/safe.py:538-542; statsmodels
is not in this image, so the oracle is the standard formula implemented directly)."""

import numpy as np

from safepy_tpu.ops.fdr import fdr_bh, fdr_bh_logsf


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


def test_logsf_matches_linear_bh(rng):
    """The exp-free log-space BH (the band engines' device FDR) matches the
    statsmodels-semantics oracle applied to exp(logsf), including tiny
    p-values far below anything the linear-space path could upload exactly."""
    logp = np.log(rng.random((8, 61))).astype(np.float32)
    logp[0, :5] = np.float32([-500.0, -80.0, -37.0, -1e-8, 0.0])
    adj, nbin, counts = fdr_bh_logsf(logp, np.log(0.05))
    want = np.apply_along_axis(
        _bh_oracle, 1, np.exp(logp.astype(np.float64)))
    got_p = np.exp(np.asarray(adj, np.float64))
    # f32 storage rounding of the adjusted log-p dominates the tolerance
    np.testing.assert_allclose(got_p, want, rtol=1e-5)
    # the indicator is decided in f64 BEFORE the f32 rounding
    np.testing.assert_array_equal(np.asarray(nbin), want < 0.05)
    np.testing.assert_array_equal(np.asarray(counts),
                                  (want < 0.05).sum(axis=0))


def test_logsf_neg_inf_and_nan(rng):
    """-inf log-p (exact p=0, the survival finalization's 'above' branch)
    stays -inf through adjustment; NaNs pass through and are excluded."""
    logp = np.log(rng.random((3, 9))).astype(np.float32)
    logp[0, 2] = -np.inf
    logp[1, 4] = np.nan
    adj, nbin, _counts = fdr_bh_logsf(logp, np.log(0.05))
    adj = np.asarray(adj)
    assert adj[0, 2] == -np.inf and np.asarray(nbin)[0, 2] == 1
    assert np.isnan(adj[1, 4]) and np.asarray(nbin)[1, 4] == 0
    finite = np.isfinite(logp[1])
    want = _bh_oracle(np.exp(logp[1][finite].astype(np.float64)))
    np.testing.assert_allclose(np.exp(adj[1][finite].astype(np.float64)),
                               want, rtol=1e-5)


def test_logsf_row_chunked_bit_equal(rng):
    """The row-chunked dispatch stream (band-scale HBM lever) is bit-equal
    to the unchunked path, including the clamped-overlap last chunk."""
    logp = np.log(rng.random((13, 17))).astype(np.float32)
    a1, b1, c1 = fdr_bh_logsf(logp, np.log(0.05))
    a2, b2, c2 = fdr_bh_logsf(logp, np.log(0.05), row_chunk=4)
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    np.testing.assert_array_equal(np.asarray(b1), np.asarray(b2))
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))


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
