"""Slope-sweep numerics vs the NumPy oracle + synthetic ground truth."""

import numpy as np
import pytest

import oracle

import functools

import jax
import jax.numpy as jnp

from remotesensingproject_tpu.config import DepthParams
from remotesensingproject_tpu.ops.sweep import (
    sweep_epi as _sweep_epi, sweep_pile as _sweep_pile)

sweep_epi = jax.jit(_sweep_epi,
                    static_argnames=("dim_d", "params", "with_k_best"))
sweep_pile = jax.jit(_sweep_pile,
                     static_argnames=("dim_d", "params", "with_k_best",
                                      "v_chunk"))


@pytest.mark.parametrize("C", [1, 3])
def test_sweep_epi_matches_oracle(C, rng):
    S, U = 7, 19
    dim_d = 9
    s_hat = 3
    dmin, dmax = -1.0, 2.0
    epi = rng.uniform(0, 1, (S, U, C)).astype(np.float32)
    params = DepthParams()

    bs, sm, bd, rb, kb = sweep_epi(
        jnp.asarray(epi), jnp.full((U,), dmin, jnp.float32),
        jnp.full((U,), dmax, jnp.float32), dim_d, s_hat, params,
        with_k_best=True)
    bs, sm, bd, rb, kb = map(np.asarray, (bs, sm, bd, rb, kb))

    for u in range(U):
        scores, best, depth, rbar, k, card = oracle.sweep_pixel(
            epi, u, dmin, dmax, dim_d, s_hat)
        assert np.isclose(bs[u], scores[best], atol=2e-5), u
        assert np.isclose(sm[u], scores.mean(), atol=2e-5), u
        assert np.isclose(bd[u], depth, atol=1e-6), (u, bd[u], depth)
        assert np.allclose(rb[u], rbar, atol=2e-5), u
        assert np.allclose(kb[:, u], k[:, best], atol=2e-5), u


def test_sweep_per_pixel_bounds(rng):
    """Per-pixel dmin/dmax (the pyramid case) must follow each pixel's own
    candidate grid."""
    S, U, C = 6, 15, 1
    dim_d = 5
    s_hat = 3
    epi = rng.uniform(0, 1, (S, U, C)).astype(np.float32)
    dmin_u = rng.uniform(-1.5, -0.5, U).astype(np.float32)
    dmax_u = rng.uniform(0.5, 1.5, U).astype(np.float32)
    params = DepthParams()
    bs, sm, bd, rb, _ = sweep_epi(
        jnp.asarray(epi), jnp.asarray(dmin_u), jnp.asarray(dmax_u),
        dim_d, s_hat, params)
    bs, bd = np.asarray(bs), np.asarray(bd)
    for u in range(0, U, 3):
        scores, best, depth, _, _, _ = oracle.sweep_pixel(
            epi, u, float(dmin_u[u]), float(dmax_u[u]), dim_d, s_hat)
        assert np.isclose(bs[u], scores[best], atol=2e-5)
        assert np.isclose(bd[u], depth, atol=1e-5)


def test_sweep_pile_equals_per_epi(rng):
    V, S, U, C = 5, 6, 17, 1
    dim_d = 7
    s_hat = 3
    vol = rng.uniform(0, 1, (V, S, U, C)).astype(np.float32)
    params = DepthParams()
    dmin = jnp.full((V, U), -1.0, jnp.float32)
    dmax = jnp.full((V, U), 1.0, jnp.float32)
    res = sweep_pile(jnp.asarray(vol), dmin, dmax, dim_d, s_hat, params,
                     v_chunk=2)
    for v in range(V):
        bs, sm, bd, rb, _ = sweep_epi(
            jnp.asarray(vol[v]), dmin[v], dmax[v], dim_d, s_hat, params)
        assert np.allclose(np.asarray(res.best_score)[v], np.asarray(bs))
        assert np.allclose(np.asarray(res.best_depth)[v], np.asarray(bd))
        assert np.allclose(np.asarray(res.rbar)[v], np.asarray(rb))


def test_sweep_recovers_synthetic_disparity():
    vol, gt = oracle.make_synthetic_lf(S=12, V=6, U=40, C=1, n_objects=3,
                                       seed=3)
    V, S, U, C = vol.shape
    dim_d = 61
    s_hat = S // 2
    params = DepthParams()
    res = sweep_pile(jnp.asarray(vol), jnp.full((V, U), -1.0, jnp.float32),
                     jnp.full((V, U), 2.0, jnp.float32), dim_d, s_hat,
                     params)
    bd = np.asarray(res.best_depth)
    bs = np.asarray(res.best_score)
    # only judge confident pixels (high score)
    conf = bs > 0.7
    assert conf.mean() > 0.5
    err = np.abs(bd - gt)[conf]
    assert np.median(err) < 0.06, np.median(err)
