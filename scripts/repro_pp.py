"""Standalone repro for the level-1 per-pixel-bounds sweep at bench scale.

Synthesizes the level-1 situation of bench.py (V=270, U=480, S=100,
D=120, slope=0.5, global bounds [-1, 4]) with per-pixel bounds that mix
tight refined ranges and unrefined full-range pixels, then times one
sweep_pile_pallas_perpixel call per s_hat plane.
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from remotesensingproject_tpu.config import DepthParams
from remotesensingproject_tpu.ops.sweep_pallas import prepare_padded_epis
from remotesensingproject_tpu.ops.sweep_pallas_perpixel import (
    sweep_pile_pallas_perpixel)

mode = sys.argv[1] if len(sys.argv) > 1 else "mixed"
V, S, U, C, D = 270, 100, 480, 1, 120
gmin, gmax = -1.0, 4.0
params = DepthParams(slope_factor=0.5)

rng = np.random.default_rng(0)
epis = rng.random((V, S, U, C), dtype=np.float32)

center = rng.uniform(gmin, gmax, (V, U)).astype(np.float32)
if mode == "smooth":
    # spatially smooth refined bounds — the realistic coarse-level case
    base = rng.uniform(gmin + 0.3, gmax - 0.3, (V // 16 + 2, U // 16 + 2))
    import numpy as _np
    yy = _np.linspace(0, base.shape[0] - 1.01, V)
    xx = _np.linspace(0, base.shape[1] - 1.01, U)
    f0 = _np.floor(yy).astype(int); fy = (yy - f0)[:, None]
    g0 = _np.floor(xx).astype(int); gx = (xx - g0)[None, :]
    sm = ((1 - fy) * (1 - gx) * base[f0][:, g0]
          + (1 - fy) * gx * base[f0][:, g0 + 1]
          + fy * (1 - gx) * base[f0 + 1][:, g0]
          + fy * gx * base[f0 + 1][:, g0 + 1]).astype(np.float32)
    dmin = np.clip(sm - 0.25, gmin, gmax)
    dmax = np.clip(sm + 0.25, gmin, gmax)
elif mode == "uniform":
    dmin = np.full((V, U), gmin, np.float32)
    dmax = np.full((V, U), gmax, np.float32)
elif mode == "tight":
    dmin = np.clip(center - 0.25, gmin, gmax)
    dmax = np.clip(center + 0.25, gmin, gmax)
else:  # mixed: 80% tight, 20% unrefined
    dmin = np.clip(center - 0.25, gmin, gmax)
    dmax = np.clip(center + 0.25, gmin, gmax)
    unref = rng.random((V, U)) < 0.2
    dmin[unref] = gmin
    dmax[unref] = gmax

epis = jnp.asarray(epis)
dmin = jnp.asarray(dmin)
dmax = jnp.asarray(dmax)
padded = prepare_padded_epis(epis, gmin, gmax, params.slope_factor)
padded = (jax.block_until_ready(padded[0]), padded[1], padded[2])
print(f"# mode={mode} padded={padded[0].shape}", flush=True)

fn = jax.jit(lambda e, a, b, s: sweep_pile_pallas_perpixel(
    e, a, b, (gmin, gmax), D, s, params, padded=padded))

for i, s_hat in enumerate([50, 51, 49]):
    t0 = time.time()
    res = fn(epis, dmin, dmax, jnp.int32(s_hat))
    bd = np.asarray(res.best_depth)
    print(f"# s_hat={s_hat} t={time.time() - t0:.1f}s "
          f"mean_bd={bd.mean():.3f}", flush=True)
