"""Microbenchmark the per-pass components at level-0 bench scale."""

import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from remotesensingproject_tpu.config import DepthParams
from remotesensingproject_tpu.ops.median import selective_median
from remotesensingproject_tpu.ops.propagation import propagate
from remotesensingproject_tpu.ops.sweep_pallas import (
    prepare_padded_epis, sweep_pile_pallas)

V, S, U, C = 540, 100, 960, 1
D = 120
gmin, gmax = -1.0, 4.0
params = DepthParams(slope_factor=1.0)

rng = np.random.default_rng(0)
if os.environ.get("BENCH_STRUCTURED") == "1":
    # layered scene like the real bench: mean-shift converges slowly
    # (random noise converges in 1-2 iterations and under-states cost)
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from bench import synthetic_sequence
    epis = jnp.transpose(synthetic_sequence(S, V, U)[0], (1, 0, 2, 3))
    epis = epis / jnp.max(epis)
else:
    epis = jnp.asarray(rng.random((V, S, U, C), dtype=np.float32))
frames = jnp.transpose(epis, (1, 0, 2, 3))
padded = prepare_padded_epis(epis, gmin, gmax, params.slope_factor)
padded = (jax.block_until_ready(padded[0]), padded[1], padded[2])
print(f"padded {padded[0].shape}", flush=True)


def _sync(outs):
    # block_until_ready is unreliable over the axon tunnel: force a
    # host transfer of one element of every leaf.
    for leaf in jax.tree_util.tree_leaves(outs):
        np.asarray(jax.device_get(leaf.ravel()[-1:]))


def timeit(name, fn, *args, n=2):
    _sync(fn(*args))  # compile
    t0 = time.time()
    for _ in range(n):
        _sync(fn(*args))
    dt = (time.time() - t0) / n
    print(f"{name}: {dt * 1e3:.0f} ms", flush=True)
    return dt


# --- sweep, varying row activity --------------------------------------
# NB: padded volume must be an ARGUMENT, not a captured constant — a
# captured device array is baked into the executable and makes XLA
# compile for minutes on a 575 MB constant.
sweep = jax.jit(lambda e, pad0, flags, s: sweep_pile_pallas(
    e, gmin, gmax, D, s, params, padded=(pad0, padded[1], padded[2]),
    row_active=flags))

for frac in (1.0, 0.25, 0.05):
    flags = jnp.asarray(
        (np.arange(V) < frac * V).astype(np.int32))
    timeit(f"sweep rows={frac:.0%}", sweep, epis, padded[0], flags,
           jnp.int32(50), n=2)

# --- selective median --------------------------------------------------
depth = jnp.asarray(rng.random((V, U), dtype=np.float32))
frame = frames[50]
mask = jnp.asarray(rng.random((V, U)) < 0.5)
med = jax.jit(lambda d, f, m: selective_median(
    d, f, m, params.median_filter_size, params.median_filter_epsilon))
timeit("selective_median", med, depth, frame, mask)

# --- propagation -------------------------------------------------------
claim = jnp.asarray(rng.random((S, V, U)) < 0.5)
rbar = jnp.asarray(rng.random((V, U, C), dtype=np.float32))
conf = jnp.asarray(rng.random((S, V, U), dtype=np.float32))
depth_vol = jnp.asarray(rng.random((S, V, U), dtype=np.float32))
smask = jnp.asarray(rng.random((V, U)) < 0.3)
dscaled = jnp.asarray(
    rng.uniform(gmin, gmax, (V, U)).astype(np.float32))

prop = jax.jit(lambda c, dv, cf, dd, rb, sm, s: propagate(
    c, frames, dd, rb, sm, s, (gmin, gmax), params.slope_factor,
    params.propagation_epsilon, [(dv, dd), (cf, dd)]))
timeit("propagation dense (off-grid depths)", prop, claim, depth_vol,
       conf, dscaled, rbar, smask, jnp.int32(50))

# real sweep outputs lie on the candidate grid — measure the
# present-offsets bucket path with a layered-scene-like depth histogram
from remotesensingproject_tpu.ops.propagation import candidate_offsets
bvals = candidate_offsets((gmin, gmax), D, params.slope_factor)
layers = jnp.asarray(rng.integers(0, 6, (V, U)) * (D // 6), jnp.int32)
dgrid = bvals[layers] / params.slope_factor
prop_b = jax.jit(lambda c, dv, cf, dd, rb, sm, s: propagate(
    c, frames, dd, rb, sm, s, (gmin, gmax), params.slope_factor,
    params.propagation_epsilon, [(dv, dd), (cf, dd)], dim_d=D))
timeit("propagation buckets (6 grid depths)", prop_b, claim, depth_vol,
       conf, dgrid, rbar, smask, jnp.int32(50))
layers2 = jnp.asarray(rng.integers(0, D, (V, U)), jnp.int32)
dgrid2 = bvals[layers2] / params.slope_factor
timeit("propagation buckets (all grid depths)", prop_b, claim,
       depth_vol, conf, dgrid2, rbar, smask, jnp.int32(50))
