"""Pallas sweep kernel (interpret mode) vs the jnp reference sweep."""

import numpy as np
import pytest

import oracle

import jax
import jax.numpy as jnp

from remotesensingproject_tpu.config import DepthParams
from remotesensingproject_tpu.ops.sweep import sweep_pile
from remotesensingproject_tpu.ops.sweep_pallas import (
    candidate_disparities, sweep_pile_pallas)


def _compare(res_p, res_j, with_k=False, atol=2e-5):
    assert np.allclose(np.asarray(res_p.best_score),
                       np.asarray(res_j.best_score), atol=atol), \
        np.abs(np.asarray(res_p.best_score)
               - np.asarray(res_j.best_score)).max()
    assert np.allclose(np.asarray(res_p.score_mean),
                       np.asarray(res_j.score_mean), atol=atol)
    # depth can only differ where scores tie at the flip point; require
    # exact match on the synthetic data used here
    assert np.allclose(np.asarray(res_p.best_depth),
                       np.asarray(res_j.best_depth), atol=1e-6)
    assert np.allclose(np.asarray(res_p.rbar), np.asarray(res_j.rbar),
                       atol=atol)
    if with_k:
        assert np.allclose(np.asarray(res_p.k_best),
                           np.asarray(res_j.k_best), atol=atol)


def test_candidate_disparities_match_cpp_order():
    d = candidate_disparities(-1.0, 1.5, 7)
    f = np.float32
    want2 = f(f(-1) + f(f(f(2) * f(2.5)) / f(6)))
    assert d[2] == want2


@pytest.mark.parametrize("C", [1, 3])
@pytest.mark.parametrize("s_hat", [3, 0])
def test_pallas_sweep_matches_jnp(C, s_hat, rng):
    V, S, U = 3, 6, 40
    dim_d = 7
    dmin, dmax = -1.0, 1.5
    vol, _ = oracle.make_synthetic_lf(S=S, V=V, U=U, C=1, n_objects=3,
                                      seed=7, dmin=dmin, dmax=dmax)
    if C == 3:
        base = vol[..., 0]
        vol = np.stack([base, 0.5 * base + 0.1, 1.0 - 0.5 * base], -1)
    vol = vol.astype(np.float32)
    params = DepthParams()

    res_j = jax.jit(sweep_pile, static_argnames=(
        "dim_d", "params", "with_k_best", "v_chunk"))(
        jnp.asarray(vol), jnp.full((V, U), dmin, jnp.float32),
        jnp.full((V, U), dmax, jnp.float32), dim_d, jnp.int32(s_hat),
        params, with_k_best=True)
    res_p = sweep_pile_pallas(jnp.asarray(vol), dmin, dmax, dim_d,
                              jnp.int32(s_hat), params, with_k_best=True,
                              interpret=True)
    _compare(res_p, res_j, with_k=True)


def test_pallas_sweep_large_offsets(rng):
    """Disparities large enough that lines leave the image: validity and
    card_R handling must match."""
    V, S, U, C = 2, 9, 30, 1
    vol = rng.uniform(0.2, 1.0, (V, S, U, C)).astype(np.float32)
    dmin, dmax, dim_d = -3.0, 4.0, 9
    params = DepthParams()
    res_j = jax.jit(sweep_pile, static_argnames=(
        "dim_d", "params", "with_k_best", "v_chunk"))(
        jnp.asarray(vol), jnp.full((V, U), dmin, jnp.float32),
        jnp.full((V, U), dmax, jnp.float32), dim_d, jnp.int32(4), params)
    res_p = sweep_pile_pallas(jnp.asarray(vol), dmin, dmax, dim_d,
                              jnp.int32(4), params, interpret=True)
    _compare(res_p, res_j)
