"""Per-pixel-bounds Pallas kernel (interpret) vs the jnp sweep."""

import numpy as np
import pytest

import oracle

import jax
import jax.numpy as jnp

from remotesensingproject_tpu.config import DepthParams
from remotesensingproject_tpu.ops.sweep import sweep_pile
from remotesensingproject_tpu.ops.sweep_pallas_perpixel import (
    sweep_pile_pallas_perpixel)


@pytest.mark.parametrize("C", [1, 3])
def test_perpixel_kernel_matches_jnp(C, rng):
    V, S, U = 3, 6, 40
    dim_d = 7
    gmin, gmax = -1.0, 1.5
    vol, _ = oracle.make_synthetic_lf(S=S, V=V, U=U, C=1, n_objects=3,
                                      seed=11, dmin=gmin, dmax=gmax)
    if C == 3:
        base = vol[..., 0]
        vol = np.stack([base, 0.6 * base + 0.1, 1.0 - 0.4 * base], -1)
    vol = vol.astype(np.float32)
    # per-pixel bounds: refined on most pixels, ctor bounds on some
    dmin = rng.uniform(gmin, 0.0, (V, U)).astype(np.float32)
    dmax = rng.uniform(0.1, gmax, (V, U)).astype(np.float32)
    wide = rng.uniform(size=(V, U)) < 0.2
    dmin[wide] = gmin
    dmax[wide] = gmax
    params = DepthParams(slope_factor=0.5)

    res_j = jax.jit(sweep_pile, static_argnames=(
        "dim_d", "params", "with_k_best", "v_chunk"))(
        jnp.asarray(vol), jnp.asarray(dmin), jnp.asarray(dmax), dim_d,
        jnp.int32(3), params, with_k_best=True)
    res_p = sweep_pile_pallas_perpixel(
        jnp.asarray(vol), jnp.asarray(dmin), jnp.asarray(dmax),
        (gmin, gmax), dim_d, jnp.int32(3), params, with_k_best=True,
        interpret=True)

    assert np.allclose(np.asarray(res_p.best_score),
                       np.asarray(res_j.best_score), atol=2e-5), \
        np.abs(np.asarray(res_p.best_score)
               - np.asarray(res_j.best_score)).max()
    assert np.allclose(np.asarray(res_p.best_depth),
                       np.asarray(res_j.best_depth), atol=1e-6)
    assert np.allclose(np.asarray(res_p.rbar), np.asarray(res_j.rbar),
                       atol=2e-5)
    assert np.allclose(np.asarray(res_p.score_mean),
                       np.asarray(res_j.score_mean), atol=2e-5)
    assert np.allclose(np.asarray(res_p.k_best),
                       np.asarray(res_j.k_best), atol=2e-5)


def test_perpixel_kernel_tile_skip(rng):
    V, S, U, C = 2, 5, 160, 1  # 2 tiles along u (128 + pad)
    vol = rng.uniform(0.2, 1.0, (V, S, U, C)).astype(np.float32)
    gmin, gmax = -1.0, 1.0
    dmin = jnp.full((V, U), gmin, jnp.float32)
    dmax = jnp.full((V, U), gmax, jnp.float32)
    params = DepthParams()
    flags = jnp.asarray([[1, 0], [0, 1]], jnp.int32)
    res = sweep_pile_pallas_perpixel(
        jnp.asarray(vol), dmin, dmax, (gmin, gmax), 5, jnp.int32(2),
        params, interpret=True, tile_active=flags)
    res_full = sweep_pile_pallas_perpixel(
        jnp.asarray(vol), dmin, dmax, (gmin, gmax), 5, jnp.int32(2),
        params, interpret=True)
    # active tiles must match the dense result
    assert np.allclose(np.asarray(res.best_score)[0, :128],
                       np.asarray(res_full.best_score)[0, :128])
    assert np.allclose(np.asarray(res.best_score)[1, 128:160],
                       np.asarray(res_full.best_score)[1, 128:160])


def test_perpixel_kernel_v_blocks(rng):
    """Chunked-launch path must equal the single-launch path."""
    V, S, U, C = 7, 5, 40, 1
    vol = rng.uniform(0.2, 1.0, (V, S, U, C)).astype(np.float32)
    gmin, gmax = -1.0, 1.0
    dmin = jnp.asarray(rng.uniform(-1, 0, (V, U)).astype(np.float32))
    dmax = jnp.asarray(rng.uniform(0.1, 1, (V, U)).astype(np.float32))
    params = DepthParams()
    a = sweep_pile_pallas_perpixel(
        jnp.asarray(vol), dmin, dmax, (gmin, gmax), 5, jnp.int32(2),
        params, interpret=True, v_block=0)
    b = sweep_pile_pallas_perpixel(
        jnp.asarray(vol), dmin, dmax, (gmin, gmax), 5, jnp.int32(2),
        params, interpret=True, v_block=2)
    for x, y in zip(a, b):
        assert np.allclose(np.asarray(x), np.asarray(y)), "chunk mismatch"


def test_perpixel_kernel_masked_tile_quantized(rng):
    """Tile-quantized mode: per-tile grid bounds + per-pixel allowed
    masking must equal a per-pixel oracle over the tile grid with
    candidates outside [pdmin - step, pdmax + step] excluded."""
    V, S, U, C = 2, 6, 150, 1  # 2 u-tiles
    dim_d = 9
    gmin, gmax = -1.0, 1.5
    vol, _ = oracle.make_synthetic_lf(S=S, V=V, U=U, C=C, n_objects=3,
                                      seed=5, dmin=gmin, dmax=gmax)
    vol = vol.astype(np.float32)
    params = DepthParams(slope_factor=0.5)

    # per-pixel true bounds, mostly refined
    c = rng.uniform(gmin + 0.4, gmax - 0.4, (V, U)).astype(np.float32)
    pdmin = np.clip(c - 0.3, gmin, gmax).astype(np.float32)
    pdmax = np.clip(c + 0.3, gmin, gmax).astype(np.float32)

    # per-128-lane-tile quantized grid bounds
    qmin = np.empty_like(pdmin)
    qmax = np.empty_like(pdmax)
    for j in range((U + 127) // 128):
        sl = slice(j * 128, min(U, (j + 1) * 128))
        qmin[:, sl] = pdmin[:, sl].min(axis=1, keepdims=True)
        qmax[:, sl] = pdmax[:, sl].max(axis=1, keepdims=True)

    res = sweep_pile_pallas_perpixel(
        jnp.asarray(vol), jnp.asarray(qmin), jnp.asarray(qmax),
        (gmin, gmax), dim_d, jnp.int32(3), params, interpret=True,
        pdmin_v_u=jnp.asarray(pdmin), pdmax_v_u=jnp.asarray(pdmax))

    f32 = np.float32
    for v in range(V):
        for u in range(0, U, 13):
            scores, _, _, _, _, _ = oracle.sweep_pixel(
                vol[v], u, qmin[v, u], qmax[v, u], dim_d, 3,
                slope_factor=0.5)
            grid = np.array(
                [f32(f32(qmin[v, u]) + f32(f32(f32(d) * f32(
                    f32(qmax[v, u]) - f32(qmin[v, u]))) / f32(dim_d - 1)))
                 for d in range(dim_d)], np.float32)
            tol = f32(f32(qmax[v, u] - qmin[v, u]) / f32(dim_d - 1))
            allowed = (grid >= pdmin[v, u] - tol) & \
                (grid <= pdmax[v, u] + tol)
            assert allowed.any(), "tol must keep >= 1 candidate"
            sc = np.where(allowed, scores, -np.inf)
            best = int(np.argmax(sc))
            assert abs(res.best_score[v, u] - scores[best]) < 3e-5, (v, u)
            assert abs(res.best_depth[v, u] - grid[best]) < 1e-6, (v, u)
            mean = scores[allowed].mean()
            assert abs(res.score_mean[v, u] - mean) < 3e-5, (v, u)
