"""Pixel-compacted sweep kernel vs the XLA reference path."""

import numpy as np
import pytest

import oracle

import jax.numpy as jnp

from remotesensingproject_tpu.config import DepthParams
from remotesensingproject_tpu.ops.sweep import sweep_pile
from remotesensingproject_tpu.ops.sweep_pallas_pixel import (
    sweep_pile_pallas_pixel)


@pytest.mark.parametrize("seed,s_hat,C",
                         [(0, 3, 1), (1, 0, 1), (2, 5, 1),
                          (0, 3, 3), (2, 5, 3)])
def test_pixel_kernel_matches_xla(seed, s_hat, C):
    vol, _ = oracle.make_synthetic_lf(S=6, V=5, U=40, C=C, n_objects=3,
                                      seed=seed, dmin=-1.0, dmax=1.5)
    epis = jnp.asarray(vol) / jnp.max(jnp.asarray(vol))
    V, S, U, C = epis.shape
    params = DepthParams()
    dmin, dmax, dim_d = -1.0, 1.5, 7
    rng = np.random.default_rng(seed)
    active = jnp.asarray(rng.random((V, U)) < 0.4)

    want = sweep_pile(epis,
                      jnp.full((V, U), np.float32(dmin)),
                      jnp.full((V, U), np.float32(dmax)),
                      dim_d, jnp.int32(s_hat), params)
    got = sweep_pile_pallas_pixel(epis, dmin, dmax, dim_d,
                                  jnp.int32(s_hat), params,
                                  active_v_u=active, interpret=True)

    m = np.asarray(active)
    # scores/r_bar tolerate the scalar-shift decomposition's last-ulp
    # interpolation-weight difference vs the XLA path (same tolerance
    # as the dense kernel's tests; the mean additionally sums the
    # candidate scores in lane-tree order); depths must agree exactly
    for name, atol in (("best_score", 2e-5), ("best_depth", 1e-6),
                       ("score_mean", 5e-5)):
        g = np.asarray(getattr(got, name))[m]
        w = np.asarray(getattr(want, name))[m]
        np.testing.assert_allclose(g, w, atol=atol, err_msg=name)
    np.testing.assert_allclose(np.asarray(got.rbar)[m],
                               np.asarray(want.rbar)[m], atol=2e-5)


def test_pixel_kernel_sparse_activity():
    """A few isolated pixels; everything inactive must not crash and
    active outputs must match."""
    vol, _ = oracle.make_synthetic_lf(S=8, V=4, U=64, C=1, n_objects=3,
                                      seed=5, dmin=-1.0, dmax=1.0)
    epis = jnp.asarray(vol) / jnp.max(jnp.asarray(vol))
    V, S, U, C = epis.shape
    params = DepthParams()
    active = np.zeros((V, U), bool)
    active[0, 3] = active[0, 60] = active[2, 31] = True
    # row 1 and 3 fully inactive
    got = sweep_pile_pallas_pixel(epis, -1.0, 1.0, 5, jnp.int32(4),
                                  params, active_v_u=jnp.asarray(active),
                                  interpret=True)
    want = sweep_pile(epis, jnp.full((V, U), np.float32(-1.0)),
                      jnp.full((V, U), np.float32(1.0)), 5,
                      jnp.int32(4), params)
    m = active
    np.testing.assert_allclose(np.asarray(got.best_depth)[m],
                               np.asarray(want.best_depth)[m],
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(got.best_score)[m],
                               np.asarray(want.best_score)[m],
                               atol=2e-5)


@pytest.mark.parametrize("seed,C", [(0, 1), (1, 1), (0, 3)])
def test_pixel_kernel_per_pixel_bounds(seed, C):
    """Native per-pixel candidate grids (the bounds-edited pyramid
    levels) vs the XLA path's exact per-pixel sweep."""
    vol, _ = oracle.make_synthetic_lf(S=6, V=5, U=40, C=C, n_objects=3,
                                      seed=seed, dmin=-1.0, dmax=1.5)
    epis = jnp.asarray(vol) / jnp.max(jnp.asarray(vol))
    V, S, U, C = epis.shape
    params = DepthParams()
    gmin, gmax, dim_d = -1.0, 1.5, 7
    rng = np.random.default_rng(seed + 10)
    c = rng.uniform(gmin + 0.4, gmax - 0.4, (V, U)).astype(np.float32)
    dmin_vu = jnp.asarray(np.clip(c - 0.35, gmin, gmax))
    dmax_vu = jnp.asarray(np.clip(c + 0.35, gmin, gmax))
    active = jnp.asarray(rng.random((V, U)) < 0.5)

    want = sweep_pile(epis, dmin_vu, dmax_vu, dim_d, jnp.int32(3),
                      params)
    got = sweep_pile_pallas_pixel(epis, gmin, gmax, dim_d, jnp.int32(3),
                                  params, active_v_u=active,
                                  interpret=True,
                                  dmin_v_u=dmin_vu, dmax_v_u=dmax_vu)
    m = np.asarray(active)
    np.testing.assert_allclose(np.asarray(got.best_depth)[m],
                               np.asarray(want.best_depth)[m],
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(got.best_score)[m],
                               np.asarray(want.best_score)[m], atol=2e-5)
    np.testing.assert_allclose(np.asarray(got.score_mean)[m],
                               np.asarray(want.score_mean)[m], atol=5e-5)
    np.testing.assert_allclose(np.asarray(got.rbar)[m],
                               np.asarray(want.rbar)[m], atol=2e-5)


def test_pixel_kernel_dim_d_over_128():
    """dim_d > 128 packs multiple candidate lane blocks per pixel
    (kb = ceil(dim_d/128)); results must match the XLA oracle exactly,
    like the single-block case."""
    import numpy as np
    import jax.numpy as jnp

    import oracle
    from remotesensingproject_tpu.config import DepthParams
    from remotesensingproject_tpu.ops.sweep import sweep_pile
    from remotesensingproject_tpu.ops.sweep_pallas_pixel import (
        sweep_pile_pallas_pixel)

    S, V, U, D = 6, 4, 160, 130
    dmin, dmax = -1.0, 1.5
    params = DepthParams()
    vol, _ = oracle.make_synthetic_lf(S=S, V=V, U=U, C=1, n_objects=3,
                                      seed=2, dmin=dmin, dmax=dmax)
    epis = jnp.asarray(vol) / jnp.max(jnp.asarray(vol))
    active = jnp.ones((V, U), bool)
    got = sweep_pile_pallas_pixel(epis, dmin, dmax, D, S // 2, params,
                                  active_v_u=active, interpret=True)
    want = sweep_pile(epis, jnp.full((V, U), dmin),
                      jnp.full((V, U), dmax), D, S // 2, params)
    # candidate CHOICES match the oracle exactly here; the scores /
    # r_bar can differ in the last ulps vs the separately-jitted
    # oracle (XLA CPU codegen varies per program — same phenomenon as
    # test_depth2d_pallas), so values gate loosely and the BITWISE
    # check is kb=2 (auto) vs kb=4 (forced) below
    assert np.array_equal(np.asarray(got.best_depth),
                          np.asarray(want.best_depth))
    assert np.allclose(np.asarray(got.best_score),
                       np.asarray(want.best_score), atol=1e-3)
    assert np.allclose(np.asarray(got.rbar), np.asarray(want.rbar),
                       atol=1e-2)
    kb4 = sweep_pile_pallas_pixel(epis, dmin, dmax, D, S // 2, params,
                                  active_v_u=active, interpret=True,
                                  _force_kb=4)
    assert np.array_equal(np.asarray(got.best_depth),
                          np.asarray(kb4.best_depth))
    assert np.array_equal(np.asarray(got.best_score),
                          np.asarray(kb4.best_score))
    assert np.array_equal(np.asarray(got.rbar), np.asarray(kb4.rbar))


def test_pixel_kernel_dim_d_over_128_per_pixel_bounds():
    import numpy as np
    import jax.numpy as jnp

    import oracle
    from remotesensingproject_tpu.config import DepthParams
    from remotesensingproject_tpu.ops.sweep import sweep_pile
    from remotesensingproject_tpu.ops.sweep_pallas_pixel import (
        sweep_pile_pallas_pixel)

    S, V, U, D = 6, 4, 160, 140
    dmin, dmax = -1.0, 1.5
    params = DepthParams()
    vol, _ = oracle.make_synthetic_lf(S=S, V=V, U=U, C=1, n_objects=3,
                                      seed=4, dmin=dmin, dmax=dmax)
    epis = jnp.asarray(vol) / jnp.max(jnp.asarray(vol))
    rng = np.random.default_rng(11)
    center = rng.uniform(dmin, dmax, (V, U)).astype(np.float32)
    bmin = jnp.asarray(np.clip(center - 0.4, dmin, dmax))
    bmax = jnp.asarray(np.clip(center + 0.4, dmin, dmax))
    active = jnp.ones((V, U), bool)
    got = sweep_pile_pallas_pixel(epis, dmin, dmax, D, S // 2, params,
                                  active_v_u=active, interpret=True,
                                  dmin_v_u=bmin, dmax_v_u=bmax)
    want = sweep_pile(epis, bmin, bmax, D, S // 2, params)
    # vs the separately-jitted oracle, scores can differ in the last
    # ulp, which flips a handful of EXACT-TIE argmax picks to the
    # neighboring candidate (measured: 3/640 at this shape) — bound
    # the flip rate and step size; the bitwise check is vs the dense
    # per-pixel Pallas engine below
    gd, wd = np.asarray(got.best_depth), np.asarray(want.best_depth)
    step = np.asarray(bmax - bmin) / (D - 1)
    frac = (gd != wd).mean()
    assert frac <= 0.02, frac
    assert (np.abs(gd - wd) <= step * 1.001).all()
    # ulp-seeded mean-shift trajectory divergence accumulates over the
    # 10 iterations: value agreement is ~1e-4, choices above
    assert np.allclose(np.asarray(got.best_score),
                       np.asarray(want.best_score), atol=1e-3)
    # the STRONG invariant: the multi-block candidate machinery itself
    # is bitwise-exact — forcing kb=4 (vs the auto kb=2) must reproduce
    # the identical outputs (same program family, same op order)
    kb4 = sweep_pile_pallas_pixel(epis, dmin, dmax, D, S // 2, params,
                                  active_v_u=active, interpret=True,
                                  dmin_v_u=bmin, dmax_v_u=bmax,
                                  _force_kb=4)
    assert np.array_equal(gd, np.asarray(kb4.best_depth))
    assert np.array_equal(np.asarray(got.best_score),
                          np.asarray(kb4.best_score))
    assert np.array_equal(np.asarray(got.rbar), np.asarray(kb4.rbar))


def test_fast_mode_iteration_cap_close_to_exact():
    """DepthParams.fast caps the mean shift at 5 iterations (vs the
    reference's 10, core.hpp:16): quality-gated, NOT bit-exact — most
    pixels converge within 5 iterations, so the argmax picks mostly
    agree and disagreements stay on the candidate grid."""
    import dataclasses

    import numpy as np
    import jax.numpy as jnp

    import oracle
    from remotesensingproject_tpu.config import DepthParams
    from remotesensingproject_tpu.ops.sweep_pallas_pixel import (
        sweep_pile_pallas_pixel)

    S, V, U, D = 12, 6, 96, 24
    dmin, dmax = -1.0, 1.5
    vol, _ = oracle.make_synthetic_lf(S=S, V=V, U=U, C=1, n_objects=3,
                                      seed=11, dmin=dmin, dmax=dmax)
    epis = jnp.asarray(vol / vol.max())
    active = jnp.ones((V, U), bool)
    params = DepthParams(slope_factor=1.0)
    exact = sweep_pile_pallas_pixel(epis, dmin, dmax, D, S // 2, params,
                                    active_v_u=active, interpret=True)
    fast = sweep_pile_pallas_pixel(
        epis, dmin, dmax, D, S // 2,
        dataclasses.replace(params, fast=True),
        active_v_u=active, interpret=True)
    ed = np.asarray(exact.best_depth)
    fd = np.asarray(fast.best_depth)
    assert np.isfinite(fd).all()
    # candidate grid membership: every fast pick is a real candidate
    grid = np.float32(dmin) + np.arange(D, dtype=np.float32) * \
        np.float32(np.float32(dmax) - np.float32(dmin)) / np.float32(D - 1)
    assert np.isin(fd.round(5), grid.round(5)).all()
    # the vast majority of pixels converge within the cap
    assert (ed == fd).mean() > 0.9, (ed == fd).mean()
