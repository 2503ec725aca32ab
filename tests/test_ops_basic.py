"""Unit tests for types, normalize, kernels, edge confidence."""

import numpy as np
import pytest

import oracle

import jax.numpy as jnp

from remotesensingproject_tpu.config import DepthParams
from remotesensingproject_tpu.ops.edge_confidence import (
    edge_confidence_frame, edge_confidence_volume)
from remotesensingproject_tpu.ops.kernels import (
    bandwidth_kernel, bandwidth_kernel_masked)
from remotesensingproject_tpu.ops.normalize import normalize_volume
from remotesensingproject_tpu.types import (
    norm, normsq, round_half_away, SQRT3)


def test_norm_1ch_sqrt3_scaling():
    x = jnp.asarray([-0.5])
    assert np.isclose(float(norm(x)), 0.5 * SQRT3)
    assert np.isclose(float(normsq(x)), (0.5 * SQRT3) ** 2)


def test_norm_3ch_l2():
    x = jnp.asarray([3.0, 4.0, 0.0])
    assert np.isclose(float(norm(x)), 5.0)


def test_round_half_away():
    vals = jnp.asarray([0.5, -0.5, 1.5, -1.5, 2.4, -2.4, 2.5])
    out = np.asarray(round_half_away(vals))
    assert list(out) == [1.0, -1.0, 2.0, -2.0, 2.0, -2.0, 3.0]


def test_normalize_uint8():
    v = np.arange(0, 250, dtype=np.uint8).reshape(5, 5, 10, 1)
    out = np.asarray(normalize_volume(jnp.asarray(v)))
    assert np.allclose(out, v.astype(np.float32) / 255.0)


def test_normalize_float_global_max():
    rng = np.random.default_rng(1)
    v = rng.uniform(0, 37.5, (3, 4, 5, 1)).astype(np.float32)
    out = np.asarray(normalize_volume(jnp.asarray(v)))
    assert np.allclose(out, v / v.max(), rtol=1e-6)
    out2 = np.asarray(normalize_volume(jnp.asarray(v), 75.0))
    assert np.allclose(out2, v / 75.0, rtol=1e-6)


@pytest.mark.parametrize("C", [1, 3])
def test_bandwidth_kernel_matches_oracle(C, rng):
    h = 0.2
    diffs = rng.uniform(-0.5, 0.5, (20, C)).astype(np.float32)
    diffs[3] = np.nan
    got = np.asarray(bandwidth_kernel(jnp.asarray(diffs), h))
    want = np.array([oracle.kernel_val(d, h) for d in diffs])
    assert np.allclose(got, want, atol=1e-6)

    valid = ~np.isnan(diffs).any(-1)
    filled = np.where(np.isnan(diffs), 0, diffs)
    got_m = np.asarray(bandwidth_kernel_masked(
        jnp.asarray(filled), jnp.asarray(valid), h))
    assert np.allclose(got_m, want, atol=1e-6)


@pytest.mark.parametrize("C", [1, 3])
def test_edge_confidence_matches_oracle(C, rng):
    V, S, U = 3, 4, 23
    vol = rng.uniform(0, 1, (V, S, U, C)).astype(np.float32)
    # plant some shadows
    vol[0, :, 5:8] = 0.01
    params = DepthParams()
    ce, mask = edge_confidence_volume(jnp.asarray(vol), params)
    ce = np.asarray(ce)
    mask = np.asarray(mask)
    for v in range(V):
        for s in range(S):
            ce_o, mask_o = oracle.edge_confidence_row(vol[v, s])
            assert np.allclose(ce[v, s], ce_o, atol=1e-5), (v, s)
            assert (mask[v, s] == mask_o).all()


def test_edge_confidence_frame_equals_volume_slice(rng):
    V, S, U, C = 4, 5, 17, 1
    vol = rng.uniform(0, 1, (V, S, U, C)).astype(np.float32)
    params = DepthParams()
    ce_all, mask_all = edge_confidence_volume(jnp.asarray(vol), params)
    s = 2
    ce_f, mask_f = edge_confidence_frame(jnp.asarray(vol[:, s]), params)
    assert np.allclose(np.asarray(ce_all)[:, s], np.asarray(ce_f))
    assert (np.asarray(mask_all)[:, s] == np.asarray(mask_f)).all()


def test_edge_confidence_vs_cv2_filter2d(rng):
    """Cross-check the reflect-101 window semantics against OpenCV's
    filter2D exactly as the reference composes it (core.hpp:449-462)."""
    cv2 = pytest.importorskip("cv2")
    U = 31
    row = rng.uniform(0, 1, U).astype(np.float32)
    fs, center = 9, 4
    want = np.zeros(U, np.float32)
    for j in range(fs):
        if j == center:
            continue
        k = np.zeros((1, fs), np.float32)
        k[0, center] = 1.0
        k[0, j] = -1.0
        d = cv2.filter2D(row[None, :], -1, k,
                         borderType=cv2.BORDER_REFLECT_101)
        want += d[0] ** 2
    vol = row[None, None, :, None]
    params = DepthParams(cut_shadows=False)
    ce, _ = edge_confidence_volume(jnp.asarray(vol), params)
    assert np.allclose(np.asarray(ce)[0, 0], want, atol=1e-5)
