"""Profile per-pass component costs at each pyramid level's shape.

Uses .bench_ckpt/level_XX.npz (from a BENCH_CKPT_DIR bench run) for
realistic per-pixel bounds / masks when available, else synthesizes.

Usage: python scripts/bench_levels.py [level ...]
"""

import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from remotesensingproject_tpu.config import DepthParams
from remotesensingproject_tpu.ops.median import selective_median
from remotesensingproject_tpu.ops.propagation import propagate
from remotesensingproject_tpu.ops.sweep_pallas import (
    prepare_padded_epis, sweep_pile_pallas)
from remotesensingproject_tpu.ops.sweep_pallas_perpixel import (
    sweep_pile_pallas_perpixel)
from remotesensingproject_tpu.utils.profiling import enable_compilation_cache

enable_compilation_cache()

CKPT = os.path.join(os.path.dirname(__file__), "..", ".bench_ckpt")
LEVELS = {
    0: (540, 960, 1.0),
    1: (270, 480, 0.5),
    2: (135, 240, 0.25),
    3: (68, 120, 0.125),
}
S, C, D = 100, 1, 120
gmin, gmax = -1.0, 4.0


def _sync(outs):
    for leaf in jax.tree_util.tree_leaves(outs):
        np.asarray(jax.device_get(leaf.ravel()[-1:]))


def timeit(name, fn, *args, n=3):
    _sync(fn(*args))
    t0 = time.time()
    for _ in range(n):
        _sync(fn(*args))
    dt = (time.time() - t0) / n
    print(f"  {name}: {dt * 1e3:.0f} ms", flush=True)
    return dt


def profile_level(lvl):
    V, U, slope = LEVELS[lvl]
    params = DepthParams(slope_factor=slope)
    rng = np.random.default_rng(lvl)
    epis = jnp.asarray(rng.random((V, S, U, C), dtype=np.float32))
    frames = jnp.transpose(epis, (1, 0, 2, 3))
    print(f"level {lvl}: V={V} U={U} slope={slope}", flush=True)

    ck = os.path.join(CKPT, f"level_{lvl:02d}.npz")
    if os.path.exists(ck):
        z = np.load(ck)
        dmin = jnp.asarray(z["dmin"][S // 2])
        dmax = jnp.asarray(z["dmax"][S // 2])
        active = jnp.asarray(z["ce_mask"][S // 2] & z["claim"][S // 2])
        print(f"  (ckpt bounds: refined "
              f"{float(jnp.mean((dmin != gmin) | (dmax != gmax))):.0%}, "
              f"active {float(jnp.mean(active)):.1%})", flush=True)
    else:
        c = jnp.asarray(
            rng.uniform(gmin + 0.3, gmax - 0.3, (V, U)).astype(np.float32))
        dmin = jnp.clip(c - 0.25, gmin, gmax)
        dmax = jnp.clip(c + 0.25, gmin, gmax)
        active = jnp.asarray(rng.random((V, U)) < 0.3)

    padded = prepare_padded_epis(epis, gmin, gmax, slope)
    padded = (jax.block_until_ready(padded[0]), padded[1], padded[2])

    nt = -(-U // 128)
    act_pad = jnp.pad(active, ((0, 0), (0, nt * 128 - U)))
    flags = jnp.any(act_pad.reshape(V, nt, 128), axis=2)

    uni = jax.jit(lambda e, p0, f, s: sweep_pile_pallas(
        e, gmin, gmax, D, s, params, padded=(p0, padded[1], padded[2]),
        row_active=f))
    timeit("sweep uniform (active rows)", uni, epis, padded[0], flags,
           jnp.int32(50))

    pp = jax.jit(lambda e, a, b, p0, f, s: sweep_pile_pallas_perpixel(
        e, a, b, (gmin, gmax), D, s, params,
        padded=(p0, padded[1], padded[2]), tile_active=f))
    timeit("sweep perpixel (active tiles)", pp, epis, dmin, dmax,
           padded[0], flags, jnp.int32(50))

    # tile-quantized mode: per-tile grid bounds + per-pixel masking
    Upad = nt * 128
    def quant(x, mn):
        inf = jnp.float32(jnp.inf if mn else -jnp.inf)
        xp = jnp.pad(x, ((0, 0), (0, Upad - U)), constant_values=inf)
        xt = xp.reshape(V, nt, 128)
        red = jnp.min(xt, 2) if mn else jnp.max(xt, 2)
        return jnp.repeat(red, 128, axis=1)[:, :U]
    qmin, qmax = quant(dmin, True), quant(dmax, False)
    ppq = jax.jit(lambda e, a, b, pa, pb, p0, f, s:
                  sweep_pile_pallas_perpixel(
                      e, a, b, (gmin, gmax), D, s, params,
                      padded=(p0, padded[1], padded[2]), tile_active=f,
                      pdmin_v_u=pa, pdmax_v_u=pb))
    timeit("sweep tile-quantized (active tiles)", ppq, epis, qmin, qmax,
           dmin, dmax, padded[0], flags, jnp.int32(50))
    all_flags = jnp.ones_like(flags)
    timeit("sweep tile-quantized (all tiles)", ppq, epis, qmin, qmax,
           dmin, dmax, padded[0], all_flags, jnp.int32(50))

    depth = jnp.asarray(
        rng.uniform(gmin, gmax, (V, U)).astype(np.float32))
    med = jax.jit(lambda d, f, m: selective_median(
        d, f, m, params.median_filter_size, params.median_filter_epsilon))
    timeit("selective_median", med, depth, frames[50], active)

    claim = jnp.asarray(rng.random((S, V, U)) < 0.2)
    rbar = jnp.asarray(rng.random((V, U, C), dtype=np.float32))
    conf = jnp.asarray(rng.random((S, V, U), dtype=np.float32))
    depth_vol = jnp.asarray(rng.random((S, V, U), dtype=np.float32))
    smask = active & jnp.asarray(rng.random((V, U)) < 0.5)

    prop = jax.jit(lambda c, dv, cf, dd, rb, sm, s: propagate(
        c, frames, dd, rb, sm, s, (gmin, gmax), slope,
        params.propagation_epsilon, [(dv, dd), (cf, dd)]))
    timeit("propagation", prop, claim, depth_vol, conf, depth, rbar,
           smask, jnp.int32(50))


if __name__ == "__main__":
    levels = [int(a) for a in sys.argv[1:]] or [0, 1, 2, 3]
    for lvl in levels:
        profile_level(lvl)
