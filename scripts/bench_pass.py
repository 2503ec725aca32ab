"""Time ONE full _pass_fn / _schedule_fn chunk at bench level-0 state,
with component toggles, to locate per-pass cost beyond the sweep."""

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
from remotesensingproject_tpu.ops.sweep_pallas import prepare_padded_epis
from remotesensingproject_tpu.utils.profiling import (
    enable_compilation_cache)

enable_compilation_cache()

S, V, U, C, D = 100, 540, 960, 1, 120
dmin, dmax = -1.0, 4.0
params = DepthParams(slope_factor=1.0)

vol, _ = synthetic_sequence(S, V, U)
epis = vol / jnp.max(vol)
frames = jnp.transpose(epis, (1, 0, 2, 3))
ce_vsu, mask_vsu = jax.jit(edge_confidence_volume, static_argnums=1)(
    epis, params)
ce = jnp.transpose(ce_vsu, (1, 0, 2))
ce_mask = jnp.transpose(mask_vsu, (1, 0, 2))
print(f"confident px: {int(ce_mask.sum())} "
      f"({float(ce_mask.mean()):.1%})", flush=True)

rng = np.random.default_rng(0)
# claim state like a mid-level pass: a fraction of confident px left
frac = float(os.environ.get("PASS_FRAC", "0.3"))
keep = jnp.asarray(rng.random((S, V, U)) < frac)
claim0 = ce_mask & keep

padded = prepare_padded_epis(epis, dmin, dmax, params.slope_factor)
pad_static = (int(padded[1]), int(padded[2]))
epis_padded = jax.block_until_ready(padded[0])

full_min = jnp.full((S, V, U), jnp.float32(dmin))
full_max = jnp.full((S, V, U), jnp.float32(dmax))


def make_state():
    return Depth2DState(
        ce=ce, ce_mask=ce_mask,
        disp_conf=jnp.zeros((S, V, U), jnp.float32),
        line_conf=jnp.zeros((S, V, U), jnp.float32),
        best_depth=jnp.zeros((S, V, U), jnp.float32),
        rbar=jnp.zeros((S, V, U, C), jnp.float32),
        claim=claim0)


# v_slabs matches the production driver's auto choice at this shape
# (the platform's deferred first-activation compile makes UNslabbed
# level-0 programs cost 200-300 s once — see models.depth2d)
SLABS = int(os.environ.get("PASS_SLABS", "4"))


def timeit(name, n_passes, **kw):
    kw.setdefault("v_slabs", SLABS)
    fwd = jax.jit(functools.partial(
        _schedule_fn, dim_d=D, params=params, d_bounds=(dmin, dmax),
        use_pallas=True, uniform_bounds=True, pad_static=pad_static,
        coarse_mode="tile", **kw))
    sched = jnp.asarray([50 + i for i in range(n_passes)], jnp.int32)
    st = make_state()
    out = fwd(epis, frames, full_min, full_max, epis_padded, st, sched)
    np.asarray(jax.device_get(out[2]))  # remaining: one scalar sync
    t0 = time.time()
    st = make_state()
    out = fwd(epis, frames, full_min, full_max, epis_padded, st, sched)
    np.asarray(jax.device_get(out[2]))
    dt = time.time() - t0
    print(f"{name}: {dt * 1e3:.0f} ms total, "
          f"{dt / n_passes * 1e3:.0f} ms/pass", flush=True)


timeit("schedule 1 pass", 1)
timeit("schedule 8 passes", 8)
timeit("schedule 8 passes, v_slabs=2", 8, v_slabs=2)


# ---- bisect: stub out stages to find the activity-independent cost ----
import remotesensingproject_tpu.models.depth2d as d2d
from remotesensingproject_tpu.ops.sweep import SweepResult

import remotesensingproject_tpu.ops.propagation_pallas as ppx
import remotesensingproject_tpu.ops.sweep_pallas as sp
import remotesensingproject_tpu.ops.sweep_pallas_pixel as spx

# the uniform-bounds pass routes to the PIXEL-compacted kernel
# (depth2d._pass_fn imports it at trace time), so that is the one to stub
orig_sweep = spx.sweep_pile_pallas_pixel
orig_prop = d2d.propagate
orig_prop_pallas = ppx.propagate_pallas
orig_med = d2d.selective_median


def stub_sweep(epis_v_s_u_c, *a, **k):
    V_, S_, U_, C_ = epis_v_s_u_c.shape
    z = jnp.zeros((V_, U_), jnp.float32)
    return SweepResult(best_score=z + 1.0, score_mean=z,
                      best_depth=z, rbar=jnp.zeros((V_, U_, C_)),
                      k_best=jnp.zeros((V_, S_, U_)))


def stub_prop(claim, frames_, filtered, rbar_, sm, s_hat_, db, sf, eps,
              payloads, dim_d=0):
    return claim, tuple(t for t, _ in payloads)


def stub_prop_pallas(claim, frames_, filtered, rbar_, sm, s_hat_, db, sf,
                     eps, payloads, interpret=False):
    # the Pallas-path pass imports propagate_pallas at trace time, so
    # stubbing d2d.propagate alone leaves the REAL propagation in the
    # timed program (round-3 advisor: the 'prop stubbed' row measured
    # an unstubbed pass)
    return claim, tuple(t for t, _ in payloads)


def stub_med(src, frame, mask, size, eps):
    return src


import importlib


def with_stubs(name, sweep=None, prop=None, med=None):
    # re-bind the names _pass_fn closes over / imports at trace time
    d2d.propagate = prop or orig_prop
    ppx.propagate_pallas = stub_prop_pallas if prop else orig_prop_pallas
    d2d.selective_median = med or orig_med
    spx.sweep_pile_pallas_pixel = sweep or orig_sweep
    try:
        timeit(name, 8)
    finally:
        d2d.propagate = orig_prop
        ppx.propagate_pallas = orig_prop_pallas
        d2d.selective_median = orig_med
        spx.sweep_pile_pallas_pixel = orig_sweep


with_stubs("8 passes, sweep stubbed", sweep=stub_sweep)
with_stubs("8 passes, prop stubbed", prop=stub_prop)
with_stubs("8 passes, median stubbed", med=stub_med)
with_stubs("8 passes, all stubbed", sweep=stub_sweep, prop=stub_prop,
           med=stub_med)


# ---- gather vs mean-shift split: iters=1 removes ~all MS iterations ---
params = DepthParams(slope_factor=1.0, mean_shift_max_iter=1)
timeit("8 passes, ms_iter=1", 8)
params = DepthParams(slope_factor=1.0, mean_shift_max_iter=3)
timeit("8 passes, ms_iter=3", 8)
