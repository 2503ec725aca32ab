"""Pyramid ops vs OpenCV (blur/resize) and hand-checked bounds logic."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from remotesensingproject_tpu.ops.pyramid import (
    GAUSSIAN7, bounds_from_parent, cv_resize_shape, downsample_epis,
    fuse_disp_maps, gaussian_blur_vu, resize_bilinear_cv, resize_nearest_cv)


def test_gaussian7_matches_cv2():
    cv2 = pytest.importorskip("cv2")
    k = cv2.getGaussianKernel(7, 0).astype(np.float32).ravel()
    assert np.allclose(GAUSSIAN7, k, atol=1e-7), (GAUSSIAN7, k)


def test_gaussian_blur_matches_cv2(rng):
    cv2 = pytest.importorskip("cv2")
    img = rng.uniform(0, 1, (21, 33)).astype(np.float32)
    want = cv2.GaussianBlur(img, (7, 7), 0, borderType=cv2.BORDER_REFLECT)
    got = np.asarray(jax.jit(gaussian_blur_vu)(jnp.asarray(img)))
    assert np.allclose(got, want, atol=1e-6), np.abs(got - want).max()


@pytest.mark.parametrize("shape", [(20, 30), (21, 33), (11, 11)])
def test_resize_half_matches_cv2(shape, rng):
    cv2 = pytest.importorskip("cv2")
    img = rng.uniform(0, 1, shape).astype(np.float32)
    want = cv2.resize(img, None, fx=0.5, fy=0.5,
                      interpolation=cv2.INTER_LINEAR)
    out_shape = (cv_resize_shape(shape[0]), cv_resize_shape(shape[1]))
    assert want.shape == out_shape
    got = np.asarray(resize_bilinear_cv(jnp.asarray(img), out_shape,
                                        scales=(2.0, 2.0)))
    assert np.allclose(got, want, atol=1e-5), np.abs(got - want).max()


@pytest.mark.parametrize("up_shape", [(14, 20), (15, 23)])
def test_resize_up_matches_cv2(up_shape, rng):
    cv2 = pytest.importorskip("cv2")
    img = rng.uniform(0, 1, (7, 10)).astype(np.float32)
    want = cv2.resize(img, (up_shape[1], up_shape[0]),
                      interpolation=cv2.INTER_LINEAR)
    got = np.asarray(resize_bilinear_cv(jnp.asarray(img), up_shape))
    assert np.allclose(got, want, atol=1e-5), np.abs(got - want).max()

    wantn = cv2.resize(img, (up_shape[1], up_shape[0]),
                       interpolation=cv2.INTER_NEAREST)
    gotn = np.asarray(resize_nearest_cv(jnp.asarray(img), up_shape))
    assert np.allclose(gotn, wantn)


def test_downsample_epis_matches_cv2_per_frame(rng):
    cv2 = pytest.importorskip("cv2")
    V, S, U, C = 13, 4, 19, 1
    vol = rng.uniform(0, 1, (V, S, U, C)).astype(np.float32)
    got = np.asarray(jax.jit(downsample_epis)(jnp.asarray(vol)))
    for s in range(S):
        frame = vol[:, s, :, 0]
        blurred = cv2.GaussianBlur(frame, (7, 7), 0,
                                   borderType=cv2.BORDER_REFLECT)
        small = cv2.resize(blurred, None, fx=0.5, fy=0.5,
                           interpolation=cv2.INTER_LINEAR)
        assert np.allclose(got[:, s, :, 0], small, atol=1e-5)


def test_bounds_from_parent_walk_semantics():
    """Replicates the while-walk of rslf_fine_to_coarse.hpp:202-294 on a
    hand-built example, via a direct loop oracle."""
    rng = np.random.default_rng(5)
    S, Vu, Uu = 2, 6, 15
    Vd, Ud = 3, 8
    depth_up = rng.uniform(-2, 2, (S, Vu, Uu)).astype(np.float32)
    mask_up = rng.uniform(size=(S, Vu, Uu)) < 0.4
    dmin0 = np.full((S, Vd, Ud), -5.0, np.float32)
    dmax0 = np.full((S, Vd, Ud), 5.0, np.float32)

    got_min, got_max = map(np.asarray, bounds_from_parent(
        jnp.asarray(depth_up), jnp.asarray(mask_up), jnp.asarray(dmin0),
        jnp.asarray(dmax0)))

    def walk(s, v_up, u_up):
        d_left = None
        u = u_up
        while u > 1:
            u -= 1
            if mask_up[s, v_up, u]:
                d_left = depth_up[s, v_up, u]
                break
        d_right = None
        u = u_up
        while u < Uu - 1:
            u += 1
            if mask_up[s, v_up, u]:
                d_right = depth_up[s, v_up, u]
                break
        return d_left, d_right

    for s in range(S):
        for v in range(Vd):
            for u in range(Ud):
                cands = []
                v_up = min(2 * v, Vu - 1)
                u_up = min(2 * u, Uu - 1)
                dl, dr = walk(s, v_up, u_up)
                if dl is not None and dr is not None:
                    cands += [dl, dr]
                if v_up + 1 < Vu:
                    dl, dr = walk(s, v_up + 1, u_up)
                    if dl is not None and dr is not None:
                        cands += [dl, dr]
                if len(cands) > 1:
                    assert np.isclose(got_min[s, v, u], min(cands))
                    assert np.isclose(got_max[s, v, u], max(cands))
                else:
                    assert got_min[s, v, u] == -5.0
                    assert got_max[s, v, u] == 5.0


def test_fuse_disp_maps_fills_holes(rng):
    cv2 = pytest.importorskip("cv2")
    S = 2
    shapes = [(12, 16), (6, 8), (3, 4)]
    disp, valid = [], []
    for (V, U) in shapes:
        disp.append(rng.uniform(0, 1, (S, V, U)).astype(np.float32))
        valid.append(rng.uniform(size=(S, V, U)) < 0.6)
    valid[-1][:] = True  # accept-all last level
    fused, validity = jax.jit(fuse_disp_maps, static_argnums=2)(
        [jnp.asarray(d) for d in disp], [jnp.asarray(v) for v in valid], 3)
    fused, validity = np.asarray(fused), np.asarray(validity)

    # oracle per s with cv2
    for s in range(S):
        md = disp[-1][s]
        mk = valid[-1][s].astype(np.uint8)
        for p in range(len(shapes) - 1, 0, -1):
            tv, tu = shapes[p - 1]
            up = cv2.resize(md, (tu, tv), interpolation=cv2.INTER_LINEAR)
            upm = cv2.resize(mk, (tu, tv), interpolation=cv2.INTER_NEAREST)
            md = np.where(valid[p - 1][s], disp[p - 1][s], up)
            mk = (valid[p - 1][s] | (upm > 0)).astype(np.uint8)
        md = cv2.medianBlur(md, 3)
        assert np.allclose(fused[s], md, atol=1e-5), \
            np.abs(fused[s] - md).max()
        assert (validity[s] == (mk > 0)).all()
