"""Permutation null: exactness against a NumPy oracle fed identical permutations,
plus statistical behavior of the keyed stream (reference: safepy/safe_extras.py:36-70)."""

import jax
import jax.numpy as jnp
import numpy as np

from safepy_tpu.ops.permutation import permutation_scores, run_permutations
from safepy_tpu.ops.score import compute_neighborhood_score


def _random_inputs(rng, n=60, a=3, nan_frac=0.25):
    nbr = (rng.random((n, n)) < 0.15).astype(float)
    np.fill_diagonal(nbr, 1.0)
    n2a = rng.normal(size=(n, a))
    n2a[rng.random((n, a)) < nan_frac] = np.nan
    return nbr, n2a


def _numpy_counts(nbr, n2a, perms, score_type="sum"):
    """Oracle: reference counting semantics applied to explicit permutations."""

    def score(mat):
        with np.errstate(invalid="ignore", divide="ignore"):
            B = np.where(~np.isnan(mat), mat, 0)
            AB = nbr @ B
            if score_type == "sum":
                return AB
            NB = np.where(~np.isnan(mat), 1, 0)
            N = nbr @ NB
            M = AB / N
            EXX = (nbr @ (B ** 2)) / N
            std = np.sqrt(EXX - M ** 2)
            out = M / std
            out[std == 0] = np.nan
            out[N < 3] = np.nan
            return out

    obs = score(n2a)
    valid = np.flatnonzero(np.sum(~np.isnan(n2a), axis=1))
    neg = np.zeros_like(obs)
    pos = np.zeros_like(obs)
    for p in perms:
        mat = n2a.copy()
        mat[valid, :] = n2a[valid[p], :]
        s = score(mat)
        with np.errstate(invalid="ignore"):
            neg += (s <= obs)
            pos += (s >= obs)
    return neg, pos


def _replay_sort_perms(key, num_chunks, batch, V):
    """The sort path's permutations: stable argsort of the per-chunk uint32
    keys (sort_key_val(bits, x)[i] == x[argsort(bits, stable)[i]])."""
    chunk_keys = jax.random.split(key, num_chunks)
    perms = []
    for c in range(num_chunks):
        bits = np.asarray(jax.random.bits(chunk_keys[c], (batch, V),
                                          dtype=jnp.uint32))
        perms.append(np.argsort(bits, axis=-1, kind="stable"))
    return np.concatenate(perms)


def _replay_gather_perms(key, num_chunks, batch, V):
    """The gather path's permutations (explicit keyed index draws)."""
    chunk_keys = jax.random.split(key, num_chunks)
    perms = []
    for c in range(num_chunks):
        perm_keys = jax.random.split(chunk_keys[c], batch)
        perms.append(np.asarray(
            jax.vmap(lambda k: jax.random.permutation(k, V))(perm_keys)))
    return np.concatenate(perms)


def test_counts_match_oracle_given_same_perms(rng, monkeypatch):
    from safepy_tpu.ops import permutation as perm_mod

    monkeypatch.setattr(perm_mod, "SORT_PATH_MAX_ATTRIBUTES", 16)
    nbr, n2a = _random_inputs(rng)  # a=3, forced onto the sort path
    valid = np.flatnonzero(np.sum(~np.isnan(n2a), axis=1))
    V = len(valid)
    key = jax.random.PRNGKey(7)
    P = 16

    # reproduce the exact permutations run_permutations will draw
    batch = 8
    perms = _replay_sort_perms(key, P // batch, batch, V)

    obs = compute_neighborhood_score(nbr, n2a, "sum")
    got_neg, got_pos = run_permutations(
        nbr, n2a, valid, obs, key, score_type="sum",
        num_permutations=P, batch_size=batch)
    want_neg, want_pos = _numpy_counts(nbr, n2a, perms, "sum")
    np.testing.assert_array_equal(np.asarray(got_neg), want_neg)
    np.testing.assert_array_equal(np.asarray(got_pos), want_pos)


def test_zscore_counts_match_oracle(rng, monkeypatch):
    from safepy_tpu.ops import permutation as perm_mod

    monkeypatch.setattr(perm_mod, "SORT_PATH_MAX_ATTRIBUTES", 16)
    nbr, n2a = _random_inputs(rng, n=40, a=2)
    valid = np.flatnonzero(np.sum(~np.isnan(n2a), axis=1))
    V = len(valid)
    key = jax.random.PRNGKey(3)
    P = 8
    perms = _replay_sort_perms(key, 1, P, V)

    obs = compute_neighborhood_score(nbr, n2a, "z-score")
    got_neg, got_pos = run_permutations(
        nbr, n2a, valid, obs, key, score_type="z-score",
        num_permutations=P, batch_size=P)
    want_neg, want_pos = _numpy_counts(nbr, n2a, perms, "z-score")
    # NaN obs positions: device counts 0, oracle produces NaN-propagated counts.
    ok = ~np.isnan(np.asarray(obs))
    np.testing.assert_allclose(np.asarray(got_neg)[ok], want_neg[ok], atol=1.0)
    np.testing.assert_allclose(np.asarray(got_pos)[ok], want_pos[ok], atol=1.0)


def test_identity_bounds(rng):
    """Every count lies in [0, P] and NaN-obs rows count zero."""
    nbr, n2a = _random_inputs(rng)
    valid = np.flatnonzero(np.sum(~np.isnan(n2a), axis=1))
    obs = compute_neighborhood_score(nbr, n2a, "sum")
    P = 50
    neg, pos = run_permutations(nbr, n2a, valid, obs, jax.random.PRNGKey(0),
                                score_type="sum", num_permutations=P)
    neg, pos = np.asarray(neg), np.asarray(pos)
    assert neg.min() >= 0 and neg.max() <= P
    assert pos.min() >= 0 and pos.max() <= P
    # two-sided counting with ties: neg + pos >= P wherever obs is finite
    assert (neg + pos >= P).all()


def test_batch_partial_chunk(rng):
    """num_permutations not divisible by batch_size: extras masked out."""
    nbr, n2a = _random_inputs(rng, n=30, a=1)
    valid = np.flatnonzero(np.sum(~np.isnan(n2a), axis=1))
    obs = compute_neighborhood_score(nbr, n2a, "sum")
    neg, pos = run_permutations(nbr, n2a, valid, obs, jax.random.PRNGKey(1),
                                score_type="sum", num_permutations=25, batch_size=8)
    assert (np.asarray(neg) + np.asarray(pos) >= 25).all()
    assert np.asarray(neg).max() <= 25


def test_counts_match_oracle_gather_path(rng, monkeypatch):
    """Very many attributes force the index+gather engine; same oracle
    contract (the cap is monkeypatched down so the test stays small)."""
    from safepy_tpu.ops import permutation as perm_mod

    monkeypatch.setattr(perm_mod, "SORT_PATH_MAX_ATTRIBUTES", 4)
    nbr, n2a = _random_inputs(rng, n=40, a=6)
    assert not perm_mod.uses_sort_path(n2a.shape[1])
    valid = np.flatnonzero(np.sum(~np.isnan(n2a), axis=1))
    V = len(valid)
    key = jax.random.PRNGKey(5)
    P, batch = 12, 6
    perms = _replay_gather_perms(key, P // batch, batch, V)

    obs = compute_neighborhood_score(nbr, n2a, "sum")
    got_neg, got_pos = run_permutations(
        nbr, n2a, valid, obs, key, score_type="sum",
        num_permutations=P, batch_size=batch)
    want_neg, want_pos = _numpy_counts(nbr, n2a, perms, "sum")
    np.testing.assert_array_equal(np.asarray(got_neg), want_neg)
    np.testing.assert_array_equal(np.asarray(got_pos), want_pos)


def test_counts_match_oracle_sort_path_many_columns(rng, monkeypatch):
    """Many columns exercise the broadcast-key sort (forced — auto-selection
    prefers the row gather for A >= 2): the key row broadcast across the
    column axis must yield the identical permutation for EVERY column, so
    the exact-count oracle (fed the replayed stable argsort) still matches
    bit-for-bit across all columns."""
    from safepy_tpu.ops import permutation as perm_mod

    monkeypatch.setattr(perm_mod, "SORT_PATH_MAX_ATTRIBUTES", 256)
    nbr, n2a = _random_inputs(rng, n=40, a=14)
    assert perm_mod.uses_sort_path(n2a.shape[1])
    valid = np.flatnonzero(np.sum(~np.isnan(n2a), axis=1))
    V = len(valid)
    key = jax.random.PRNGKey(9)
    P, batch = 12, 6
    perms = _replay_sort_perms(key, P // batch, batch, V)

    obs = compute_neighborhood_score(nbr, n2a, "sum")
    got_neg, got_pos = run_permutations(
        nbr, n2a, valid, obs, key, score_type="sum",
        num_permutations=P, batch_size=batch)
    want_neg, want_pos = _numpy_counts(nbr, n2a, perms, "sum")
    np.testing.assert_array_equal(np.asarray(got_neg), want_neg)
    np.testing.assert_array_equal(np.asarray(got_pos), want_pos)
