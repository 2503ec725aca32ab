"""Pallas selective median vs the XLA implementation: bitwise parity
in interpret mode (the on-chip A/B lives in scripts/tpu_acceptance.py)."""

import numpy as np
import pytest

import jax.numpy as jnp

from remotesensingproject_tpu.ops.median import selective_median
from remotesensingproject_tpu.ops.median_pallas import (
    selective_median_pallas)


@pytest.mark.parametrize("C", [1, 3])
@pytest.mark.parametrize("shape", [(16, 64), (23, 130), (40, 256)])
def test_median_pallas_bitwise(C, shape):
    V, U = shape
    rng = np.random.default_rng(V * 1000 + U + C)
    src = jnp.asarray(rng.random((V, U), np.float32) * 5 - 1)
    frame = jnp.asarray(rng.random((V, U, C), np.float32))
    mask = jnp.asarray(rng.random((V, U)) < 0.7)
    a = selective_median(src, frame, mask, 5, 0.1)
    b = selective_median_pallas(src, frame, mask, 5, 0.1,
                                interpret=True)
    assert np.array_equal(np.asarray(a), np.asarray(b))


def test_median_pallas_epsilon_gate():
    """Color gate excludes far-radiance taps identically."""
    V, U, C = 16, 128, 1
    rng = np.random.default_rng(7)
    src = jnp.asarray(rng.random((V, U), np.float32))
    frame = jnp.asarray((rng.random((V, U, C)) > 0.5).astype(np.float32))
    mask = jnp.ones((V, U), bool)
    a = selective_median(src, frame, mask, 5, 0.1)
    b = selective_median_pallas(src, frame, mask, 5, 0.1,
                                interpret=True)
    assert np.array_equal(np.asarray(a), np.asarray(b))
