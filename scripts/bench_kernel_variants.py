"""Decompose the uniform sweep kernel's cost: gather vs mean-shift vs
while-loop, random vs structured data.  V small so each point is fast."""

import dataclasses
import time

import numpy as np

import jax
import jax.numpy as jnp

from remotesensingproject_tpu.config import DepthParams
from remotesensingproject_tpu.ops.sweep_pallas import (
    prepare_padded_epis, sweep_pile_pallas)

V, S, U, C = 64, 100, 960, 1
D = 120
gmin, gmax = -1.0, 4.0

rng = np.random.default_rng(0)
rand_epis = jnp.asarray(rng.random((V, S, U, C), dtype=np.float32))

# structured: layered strips like bench.py (piecewise-constant radiance)
disp = rng.uniform(gmin, gmax, (8,))
tex = rng.random((8, 4 * U), dtype=np.float32)
u_idx = np.arange(U)
vol = np.zeros((V, S, U), np.float32)
for s in range(S):
    for li in range(8):
        u0 = np.clip((u_idx - (50 - s) * disp[li]).astype(int) + U, 0,
                     4 * U - 1)
        band = (u_idx % 8*128) // 128 == li % 8
        vol[:, s, band] = tex[li, u0][band]
struct_epis = jnp.asarray(vol[..., None])


def run(name, epis, iters, n=1):
    params = DepthParams(slope_factor=1.0, mean_shift_max_iter=iters)
    padded = prepare_padded_epis(epis, gmin, gmax, params.slope_factor)
    padded = (jax.block_until_ready(padded[0]), padded[1], padded[2])
    fn = jax.jit(lambda e, s: sweep_pile_pallas(
        e, gmin, gmax, D, s, params, padded=padded))
    t0 = time.time()
    jax.block_until_ready(fn(epis, jnp.int32(50)))
    compile_t = time.time() - t0
    t0 = time.time()
    for _ in range(n):
        out = fn(epis, jnp.int32(50))
    jax.block_until_ready(out)
    dt = (time.time() - t0) / n
    print(f"{name}: {dt * 1e3:.0f} ms/call (compile {compile_t:.0f}s) "
          f"-> x{540 / V:.0f} = {dt * 540 / V:.1f}s at V=540", flush=True)


run("rand iters=0 (gather only)", rand_epis, 0)
run("rand iters=10", rand_epis, 10)
run("struct iters=10", struct_epis, 10)
run("struct iters=1", struct_epis, 1)
