"""Per-stage cost at COARSE pyramid level shapes (levels 1+ of the
bench config): times an 8-pass _schedule_fn chunk with components
stubbed out to attribute per-pass cost to sweep / median / propagation
/ merge overhead.  Bounds are synthesized tight-around-GT like a real
bounds-edited level; claim state is a PASS_FRAC random survivor set.

Usage: python scripts/bench_coarse.py [level ...]   (default 1 2 3 4 5)
"""

import functools
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
from remotesensingproject_tpu.models.depth2d import (
    Depth2DState, _schedule_fn)
from remotesensingproject_tpu.ops.edge_confidence import (
    edge_confidence_volume)
from remotesensingproject_tpu.ops.pyramid import downsample_epis
from remotesensingproject_tpu.ops.sweep_pallas import prepare_padded_epis
from remotesensingproject_tpu.utils.profiling import (
    enable_compilation_cache)

enable_compilation_cache()

S, V0, U0, C, D = 100, 540, 960, 1, 120
dmin, dmax = -1.0, 4.0
levels = [int(a) for a in sys.argv[1:]] or [1, 2, 3, 4, 5]

vol, gt_s_u = synthetic_sequence(S, V0, U0)
rng = np.random.default_rng(0)

import remotesensingproject_tpu.models.depth2d as d2d
import remotesensingproject_tpu.ops.sweep_pallas_pixel as spx
from remotesensingproject_tpu.ops.sweep import SweepResult

orig_prop = d2d.propagate
orig_med = d2d.selective_median
orig_pix = spx.sweep_pile_pallas_pixel


def stub_prop(claim, frames_, filtered, rbar_, sm, s_hat_, db, sf, eps,
              payloads, dim_d=0):
    return claim, tuple(t for t, _ in payloads)


def stub_med(src, frame, mask, size, eps):
    return src


def stub_sweep(epis_v_s_u_c, dmin_, dmax_, dim_d_, s_hat_, params_,
               active_v_u=None, padded=None, interpret=False,
               dmin_v_u=None, dmax_v_u=None):
    V_, S_, U_, C_ = epis_v_s_u_c.shape
    z = jnp.zeros((V_, U_), jnp.float32)
    return SweepResult(best_score=z + 1.0, score_mean=z, best_depth=z,
                       rbar=jnp.zeros((V_, U_, C_)),
                       k_best=jnp.zeros((V_, S_, U_)))


level = jnp.asarray(vol)
ds_fn = jax.jit(downsample_epis)
for p in range(max(levels) + 1):
    if p > 0:
        level = ds_fn(level)
    if p not in levels:
        continue
    Vp, Sp, Up, Cp = level.shape
    sf = Up / U0
    params = DepthParams(slope_factor=sf)
    epis = level / jnp.max(level)
    frames = jnp.transpose(epis, (1, 0, 2, 3))
    ce_vsu, mask_vsu = jax.jit(edge_confidence_volume, static_argnums=1)(
        epis, params)
    ce = jnp.transpose(ce_vsu, (1, 0, 2))
    ce_mask = jnp.transpose(mask_vsu, (1, 0, 2))
    frac = float(os.environ.get("PASS_FRAC", "0.3"))
    keep = jnp.asarray(rng.random((S, Vp, Up)) < frac)
    claim0 = ce_mask & keep

    # tight synthetic bounds around GT (downsampled u by the level scale)
    u_src = np.clip((np.arange(Up) / sf).astype(int), 0, U0 - 1)
    gtp = np.asarray(gt_s_u)[:, u_src]                    # [S, Up]
    gtp = np.broadcast_to(gtp[:, None, :], (S, Vp, Up))
    bmin = jnp.asarray(np.maximum(gtp - 0.3, dmin).astype(np.float32))
    bmax = jnp.asarray(np.minimum(gtp + 0.3, dmax).astype(np.float32))

    padded = prepare_padded_epis(epis, dmin, dmax, sf)
    pad_static = (int(padded[1]), int(padded[2]))
    epis_padded = jax.block_until_ready(padded[0])

    def make_state():
        return Depth2DState(
            ce=ce, ce_mask=ce_mask,
            disp_conf=jnp.zeros((S, Vp, Up), jnp.float32),
            line_conf=jnp.zeros((S, Vp, Up), jnp.float32),
            best_depth=jnp.zeros((S, Vp, Up), jnp.float32),
            rbar=jnp.zeros((S, Vp, Up, Cp), jnp.float32),
            claim=claim0)

    def timeit(name, n_passes=8):
        fwd = jax.jit(functools.partial(
            _schedule_fn, dim_d=D, params=params, d_bounds=(dmin, dmax),
            use_pallas=True, uniform_bounds=False, pad_static=pad_static,
            coarse_mode="tile"))
        sched = jnp.asarray([Sp // 2 + i for i in range(n_passes)],
                            jnp.int32)
        st = make_state()
        out = fwd(epis, frames, bmin, bmax, epis_padded, st, sched)
        np.asarray(jax.device_get(out[2]))
        t0 = time.time()
        st = make_state()
        out = fwd(epis, frames, bmin, bmax, epis_padded, st, sched)
        np.asarray(jax.device_get(out[2]))
        dt = time.time() - t0
        print(f"  {name}: {dt * 1e3:.0f} ms / {n_passes} passes = "
              f"{dt / n_passes * 1e3:.1f} ms/pass", flush=True)

    print(f"level {p}: V={Vp} U={Up} conf={float(ce_mask.mean()):.1%}",
          flush=True)
    try:
        timeit("full           ")
        d2d.propagate = stub_prop
        timeit("prop stubbed   ")
        d2d.selective_median = stub_med
        timeit("prop+med stub  ")
        spx.sweep_pile_pallas_pixel = stub_sweep
        timeit("all stubbed    ")
    finally:
        d2d.propagate = orig_prop
        d2d.selective_median = orig_med
        spx.sweep_pile_pallas_pixel = orig_pix
