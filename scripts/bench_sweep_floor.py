"""Isolate the uniform sweep kernel's fixed costs on TPU.

Measures: all-rows-inactive launch (pure grid/no-op floor), single
active row, and active-row scaling — on STRUCTURED data (mean-shift
iteration counts like the real bench, not 1-2-iteration random noise).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from bench import synthetic_sequence
from remotesensingproject_tpu.config import DepthParams
from remotesensingproject_tpu.ops.sweep_pallas import (
    prepare_padded_epis, sweep_pile_pallas)

V, S, U, C = 540, 100, 960, 1
D = 120
gmin, gmax = -1.0, 4.0
params = DepthParams(slope_factor=1.0)

vol, _ = synthetic_sequence(S, V, U)       # [V, S, U, 1] on device
epis = vol / jnp.max(vol)
padded = prepare_padded_epis(epis, gmin, gmax, params.slope_factor)
padded = (jax.block_until_ready(padded[0]), padded[1], padded[2])


def _sync(outs):
    for leaf in jax.tree_util.tree_leaves(outs):
        np.asarray(jax.device_get(leaf.ravel()[-1:]))


def timeit(name, fn, *args, n=3):
    _sync(fn(*args))
    t0 = time.time()
    for _ in range(n):
        _sync(fn(*args))
    dt = (time.time() - t0) / n
    print(f"{name}: {dt * 1e3:.1f} ms", flush=True)
    return dt


sweep = jax.jit(lambda e, pad0, flags, s: sweep_pile_pallas(
    e, gmin, gmax, D, s, params, padded=(pad0, padded[1], padded[2]),
    row_active=flags))

nt = -(-U // 128)
rng = np.random.default_rng(0)

# pure launch floor: zero active chunks
zeros = jnp.zeros((V, nt), jnp.int32)
timeit("launch floor (0 active)", sweep, epis, padded[0], zeros,
       jnp.int32(50))

# one active row (all chunks)
one = np.zeros((V, nt), np.int32)
one[V // 2] = 1
timeit("1 active row", sweep, epis, padded[0], jnp.asarray(one),
       jnp.int32(50))

for k in (32, 128, 540):
    rows = np.zeros((V, nt), np.int32)
    rows[np.linspace(0, V - 1, k).astype(int)] = 1
    timeit(f"{k} active rows (row-wide)", sweep, epis, padded[0],
           jnp.asarray(rows), jnp.int32(50), n=2)

# spread activity: every row active but only m of 8 chunks
for m in (1, 4, 7):
    ch = np.zeros((V, nt), np.int32)
    ch[:, :m] = 1
    timeit(f"all rows, {m}/8 chunks (chunk-gated)", sweep, epis,
           padded[0], jnp.asarray(ch), jnp.int32(50), n=2)
