"""Vectorized Benjamini-Hochberg FDR correction.

Reference semantics: statsmodels ``fdrcorrection`` applied row-by-row via
``np.apply_along_axis`` (safepy/safe.py:538-542, 599-605) — each neighborhood's
p-values are corrected across attributes. Here the whole (N, A) matrix is corrected
in one sorted scan along the last axis on device.

NaN policy: the reference feeds NaN-bearing rows straight into statsmodels, where a
NaN poisons the reversed cumulative minimum for the entire row. We instead exclude
NaNs from the test count and the scan, and return NaN at NaN positions — the behavior
statsmodels produces on NaN-free input, extended sanely. (The reference's own
multiple-testing path is NaN-free in its tested configurations: the hypergeometric
test never emits NaN p-values.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def fdr_bh(pvalues):
    """Benjamini-Hochberg adjusted p-values along the last axis.

    Matches ``statsmodels.stats.multitest.fdrcorrection(p)[1]`` on finite input.
    """
    p = jnp.asarray(pvalues, jnp.float64)
    nan_mask = ~jnp.isfinite(p)
    big = jnp.where(nan_mask, jnp.inf, p)  # NaNs sort to the end, excluded from m

    order = jnp.argsort(big, axis=-1)
    p_sorted = jnp.take_along_axis(big, order, axis=-1)

    m = jnp.sum(~nan_mask, axis=-1, keepdims=True).astype(p.dtype)
    rank = jnp.arange(1, p.shape[-1] + 1, dtype=p.dtype)
    raw = p_sorted * m / rank

    # Reversed cumulative minimum; inf (ex-NaN) tail never lowers the minimum.
    last = raw.ndim - 1
    rev_cummin = jnp.flip(jax.lax.cummin(jnp.flip(raw, axis=last), axis=last), axis=last)
    corrected_sorted = jnp.minimum(rev_cummin, 1.0)

    inv = jnp.argsort(order, axis=-1)
    corrected = jnp.take_along_axis(corrected_sorted, inv, axis=-1)
    return jnp.where(nan_mask, jnp.nan, corrected)
