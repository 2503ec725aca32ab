"""Propagation (line painting) vs the sequential oracle."""

import functools

import numpy as np
import pytest

import oracle

import jax
import jax.numpy as jnp

from remotesensingproject_tpu.ops.propagation import propagate


def run_propagate(best, conf, claim, frames, depth_f, rbar, smask, s_hat,
                  d_bounds, slope, eps):
    fn = jax.jit(functools.partial(
        propagate, d_bounds=d_bounds, slope_factor=slope, epsilon=eps))
    claim_out, (best_out, conf_out) = fn(
        jnp.asarray(claim), jnp.asarray(frames), jnp.asarray(depth_f),
        jnp.asarray(rbar), jnp.asarray(smask), jnp.int32(s_hat),
        payloads=((jnp.asarray(best), jnp.asarray(depth_f)),
                  (jnp.asarray(conf), jnp.asarray(conf[s_hat]))))
    return (np.asarray(best_out), np.asarray(conf_out),
            np.asarray(claim_out))


@pytest.mark.parametrize("slope", [1.0, 0.5])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_propagate_matches_sequential_oracle(seed, slope):
    rng = np.random.default_rng(seed)
    S, V, U, C = 7, 4, 23, 1
    s_hat = 3
    dmin, dmax = -1.5, 2.0
    frames = rng.uniform(0, 1, (S, V, U, C)).astype(np.float32)
    depth_f = rng.uniform(dmin, dmax, (V, U)).astype(np.float32)
    # quantize depths so several sources share target offsets (conflicts)
    depth_f = np.round(depth_f * 4) / 4
    rbar = (frames[s_hat] + rng.normal(0, 0.05, (V, U, C))
            ).astype(np.float32)
    conf_plane = rng.uniform(0, 1, (V, U)).astype(np.float32)
    smask = rng.uniform(size=(V, U)) < 0.6
    claim0 = rng.uniform(size=(S, V, U)) < 0.8
    best0 = np.zeros((S, V, U), np.float32)
    conf0 = np.zeros((S, V, U), np.float32)
    conf0[s_hat] = conf_plane

    # oracle (sequential, in place)
    best_o = best0.copy()
    conf_o = conf0.copy()
    claim_o = claim0.copy()
    oracle.propagate(best_o, conf_o, claim_o, frames, depth_f, rbar,
                     conf_plane, smask, s_hat, slope, 0.1)

    best_g, conf_g, claim_g = run_propagate(
        best0, conf0, claim0, frames, depth_f, rbar, smask, s_hat,
        (dmin, dmax), slope, 0.1)

    assert (claim_g == claim_o).all(), (claim_g != claim_o).sum()
    assert np.allclose(best_g, best_o), np.abs(best_g - best_o).max()
    assert np.allclose(conf_g, conf_o)


def test_propagate_conflict_smallest_u_wins():
    """Two sources map to the same target; the reference's sequential
    order means the smaller u claims it first."""
    S, V, U, C = 3, 1, 9, 1
    s_hat = 1
    frames = np.full((S, V, U, C), 0.5, np.float32)
    depth_f = np.zeros((V, U), np.float32)
    # source u=2 with d=+2 targets u'=4 at s=0 (ds=+1); source u=4 with
    # d=0 targets u'=4 too.
    depth_f[0, 2] = 2.0
    depth_f[0, 4] = 0.0
    rbar = np.full((V, U, C), 0.5, np.float32)
    smask = np.zeros((V, U), bool)
    smask[0, 2] = smask[0, 4] = True
    claim0 = np.ones((S, V, U), bool)
    best0 = np.zeros((S, V, U), np.float32)
    conf_plane = np.zeros((V, U), np.float32)
    conf0 = np.zeros((S, V, U), np.float32)

    best_g, conf_g, claim_g = run_propagate(
        best0, conf0, claim0, frames, depth_f, rbar, smask, s_hat,
        (-2.0, 2.0), 1.0, 0.1)
    # target (s=0, u=4): source u=2 (offset +2) must win over u=4 (offset 0)
    assert best_g[0, 0, 4] == 2.0
    assert not claim_g[0, 0, 4]
