"""Validation / NaN-policing helpers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from safepy_tpu.debug import (ValidationError, checkify_pipeline,
                              validate_attributes, validate_network_arrays)


def test_validate_network_ok():
    d = np.array([[0, 1, np.inf], [1, 0, 2], [np.inf, 2, 0.0]])
    validate_network_arrays(d)


@pytest.mark.parametrize("mutate,msg", [
    (lambda d: d.__setitem__((0, 0), 1.0), "diagonal"),
    (lambda d: d.__setitem__((0, 1), -1.0), "negative"),
    (lambda d: d.__setitem__((0, 1), np.nan), "NaN"),
    (lambda d: d.__setitem__((0, 1), 5.0), "symmetric"),
])
def test_validate_network_failures(mutate, msg):
    d = np.array([[0, 1, np.inf], [1, 0, 2], [np.inf, 2, 0.0]])
    mutate(d)
    with pytest.raises(ValidationError, match=msg):
        validate_network_arrays(d)


def test_validate_attributes():
    validate_attributes(np.ones((5, 2)), 5)
    with pytest.raises(ValidationError, match="rows"):
        validate_attributes(np.ones((4, 2)), 5)
    with pytest.raises(ValidationError, match="inf"):
        validate_attributes(np.array([[np.inf]]), 1)


def test_checkify_catches_nan():
    def f(x):
        return jnp.log(x)  # NaN for negative input

    run = checkify_pipeline(jax.jit(f))
    out = run(jnp.asarray([1.0, 2.0]))
    np.testing.assert_allclose(np.asarray(out), np.log([1.0, 2.0]))
    with pytest.raises(Exception):
        run(jnp.asarray([-1.0]))
