"""Pallas line-paint kernel vs the XLA propagate (bitwise, interpret)."""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from remotesensingproject_tpu.ops.propagation import propagate
from remotesensingproject_tpu.ops.propagation_pallas import propagate_pallas


def make_case(rng, S, V, U, C, s_hat, dmin, dmax, slope, n_payload,
              grid_depths=None, src_frac=0.6):
    frames = rng.uniform(0, 1, (S, V, U, C)).astype(np.float32)
    if grid_depths is None:
        depth_f = rng.uniform(dmin, dmax, (V, U)).astype(np.float32)
        depth_f = np.round(depth_f * 4) / 4  # shared offsets (conflicts)
    else:
        depth_f = rng.choice(grid_depths, (V, U)).astype(np.float32)
    rbar = (frames[s_hat] + rng.normal(0, 0.05, (V, U, C))
            ).astype(np.float32)
    smask = rng.uniform(size=(V, U)) < src_frac
    claim0 = rng.uniform(size=(S, V, U)) < 0.8
    payloads = []
    for k in range(n_payload):
        tgt = rng.uniform(0, 1, (S, V, U)).astype(np.float32)
        src = rng.uniform(0, 1, (V, U)).astype(np.float32)
        payloads.append((tgt, src))
    payloads[0] = (payloads[0][0], depth_f)  # depth payload, as in the
    # 2-D driver (ops/propagation.py docstring)
    return frames, depth_f, rbar, smask, claim0, payloads


def run_both(frames, depth_f, rbar, smask, claim0, payloads, s_hat,
             d_bounds, slope, eps):
    jp = [(jnp.asarray(t), jnp.asarray(s)) for t, s in payloads]
    args = (jnp.asarray(claim0), jnp.asarray(frames),
            jnp.asarray(depth_f), jnp.asarray(rbar), jnp.asarray(smask),
            jnp.int32(s_hat))
    ref_c, ref_t = jax.jit(functools.partial(
        propagate, d_bounds=d_bounds, slope_factor=slope,
        epsilon=eps))(*args, payloads=jp)
    ker_c, ker_t = jax.jit(functools.partial(
        propagate_pallas, d_bounds=d_bounds, slope_factor=slope,
        epsilon=eps, interpret=True))(*args, payloads=jp)
    return (np.asarray(ref_c), [np.asarray(t) for t in ref_t],
            np.asarray(ker_c), [np.asarray(t) for t in ker_t])


@pytest.mark.parametrize("slope", [1.0, 0.5])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_kernel_matches_xla(seed, slope):
    rng = np.random.default_rng(seed)
    S, V, U, C = 7, 5, 23, 1
    case = make_case(rng, S, V, U, C, 3, -1.5, 2.0, slope, 2)
    ref_c, ref_t, ker_c, ker_t = run_both(
        *case, 3, (-1.5, 2.0), slope, 0.1)
    assert (ker_c == ref_c).all()
    for r, k in zip(ref_t, ker_t):
        np.testing.assert_array_equal(r, k)


def test_kernel_matches_xla_rgb_three_payloads():
    rng = np.random.default_rng(7)
    S, V, U, C = 6, 4, 31, 3
    case = make_case(rng, S, V, U, C, 2, -1.0, 1.5, 1.0, 3)
    ref_c, ref_t, ker_c, ker_t = run_both(
        *case, 2, (-1.0, 1.5), 1.0, 0.1)
    assert (ker_c == ref_c).all()
    for r, k in zip(ref_t, ker_t):
        np.testing.assert_array_equal(r, k)


def test_kernel_matches_xla_multi_tile_overlap():
    """V > Vt forces an overlapped final tile (Vt=128): overlap rows are
    computed twice and must agree bitwise (per-v independence)."""
    rng = np.random.default_rng(3)
    S, V, U, C = 4, 150, 40, 1
    case = make_case(rng, S, V, U, C, 2, -1.0, 2.0, 1.0, 2)
    ref_c, ref_t, ker_c, ker_t = run_both(
        *case, 2, (-1.0, 2.0), 1.0, 0.1)
    assert (ker_c == ref_c).all()
    for r, k in zip(ref_t, ker_t):
        np.testing.assert_array_equal(r, k)


def test_kernel_no_sources_is_identity():
    rng = np.random.default_rng(4)
    S, V, U, C = 5, 4, 17, 1
    frames, depth_f, rbar, smask, claim0, payloads = make_case(
        rng, S, V, U, C, 2, -1.0, 1.0, 1.0, 2)
    smask = np.zeros_like(smask)
    ref_c, ref_t, ker_c, ker_t = run_both(
        frames, depth_f, rbar, smask, claim0, payloads, 2,
        (-1.0, 1.0), 1.0, 0.1)
    assert (ker_c == claim0).all()
    for (t0, _), k in zip(payloads, ker_t):
        np.testing.assert_array_equal(t0, k)
    assert (ker_c == ref_c).all()


def test_kernel_matches_oracle_via_xla_grid_case():
    """Grid-valued depths (the uniform-level regime the XLA bucket path
    handles): the kernel must agree there too."""
    rng = np.random.default_rng(5)
    dmin, dmax, D = -1.0, 4.0, 9
    grid = dmin + (dmax - dmin) * np.arange(D, dtype=np.float32) / (D - 1)
    S, V, U, C = 8, 6, 29, 1
    case = make_case(rng, S, V, U, C, 4, dmin, dmax, 1.0, 2,
                     grid_depths=grid)
    frames, depth_f, rbar, smask, claim0, payloads = case
    jp = [(jnp.asarray(t), jnp.asarray(s)) for t, s in payloads]
    args = (jnp.asarray(claim0), jnp.asarray(frames),
            jnp.asarray(depth_f), jnp.asarray(rbar), jnp.asarray(smask),
            jnp.int32(4))
    bucket_c, bucket_t = jax.jit(functools.partial(
        propagate, d_bounds=(dmin, dmax), slope_factor=1.0,
        epsilon=0.1, dim_d=D))(*args, payloads=jp)
    ker_c, ker_t = jax.jit(functools.partial(
        propagate_pallas, d_bounds=(dmin, dmax), slope_factor=1.0,
        epsilon=0.1, interpret=True))(*args, payloads=jp)
    assert (np.asarray(ker_c) == np.asarray(bucket_c)).all()
    for r, k in zip(bucket_t, ker_t):
        np.testing.assert_array_equal(np.asarray(r), np.asarray(k))
