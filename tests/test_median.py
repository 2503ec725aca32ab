"""Selective median and plain median-blur vs oracle / cv2."""

import numpy as np
import pytest

import oracle

import jax
import jax.numpy as jnp

from remotesensingproject_tpu.ops.median import median_blur, selective_median

sm_jit = jax.jit(selective_median, static_argnames=("size",))


@pytest.mark.parametrize("C", [1, 3])
def test_selective_median_matches_oracle(C, rng):
    V, U = 11, 13
    src = rng.uniform(-1, 3, (V, U)).astype(np.float32)
    frame = rng.uniform(0, 1, (V, U, C)).astype(np.float32)
    # clustered radiances so the color gate actually selects subsets
    frame = np.round(frame * 4) / 4
    mask = rng.uniform(size=(V, U)) < 0.7
    got = np.asarray(sm_jit(jnp.asarray(src), jnp.asarray(frame),
                            jnp.asarray(mask), 5, 0.1))
    want = oracle.selective_median(src, frame, mask, 5, 0.1)
    assert np.allclose(got, want), np.abs(got - want).max()


def test_selective_median_zero_outside_mask(rng):
    V, U = 6, 7
    src = rng.uniform(0, 1, (V, U)).astype(np.float32)
    frame = rng.uniform(0, 1, (V, U, 1)).astype(np.float32)
    mask = np.zeros((V, U), bool)
    mask[2, 3] = True
    got = np.array(sm_jit(jnp.asarray(src), jnp.asarray(frame),
                          jnp.asarray(mask), 5, 0.1))
    assert got[2, 3] == src[2, 3]  # only itself in the window
    got[2, 3] = 0
    assert (got == 0).all()


def test_median_blur_vs_cv2(rng):
    cv2 = pytest.importorskip("cv2")
    img = rng.uniform(0, 1, (14, 17)).astype(np.float32)
    got = np.asarray(jax.jit(median_blur, static_argnames="size")(
        jnp.asarray(img), 3))
    want = cv2.medianBlur(img, 3)
    assert np.allclose(got, want), np.abs(got - want).max()
