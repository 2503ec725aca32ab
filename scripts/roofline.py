"""Roofline / utilization measurement of the hot kernels on the v5e.

VERDICT r1 #4 / r2 #4: docs/ALGORITHM.md models the sweep as VPU-bound
(~90 flops/element); this script MEASURES the achieved useful
element-op throughput of the three Pallas kernels at the bench's
level-0 shape and compares against the v5e ceilings:

  VPU peak  ~= 8 x 128 x 4 ALUs x 0.94 GHz ~= 3.85 T elem-ops/s (f32)
  HBM BW    ~= 819 GB/s

The op model counts ALGORITHMIC work (the ops the computation cannot
avoid), so the reported fraction folds in every real overhead: padding
lanes, rolls/selects for alignment, DMA stalls, mean-shift convergence
slack, grid bookkeeping.  Numbers land in docs/PERF.md and
ROOFLINE.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from remotesensingproject_tpu.config import DepthParams
from remotesensingproject_tpu.utils.profiling import (
    enable_compilation_cache)

VPU_PEAK = 8 * 128 * 4 * 0.94e9         # f32 elem-ops/s
HBM_BW = 819e9                          # B/s

enable_compilation_cache()

S, V, U, C, D = 100, 540, 960, 1, 120
dmin, dmax = -1.0, 4.0
params = DepthParams(slope_factor=1.0)

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from bench import synthetic_sequence  # noqa: E402

vol, _ = synthetic_sequence(S, V, U)
epis = vol / jnp.max(vol)
frames = jnp.transpose(epis, (1, 0, 2, 3))


def sync(x):
    # ONE leaf only: every extra device_get is a ~25 ms axon tunnel
    # round trip that pollutes the timing (all outputs of a single
    # executable complete together)
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(jax.device_get(leaf.ravel()[-1:]))


def timeit(fn, *args, n=3):
    sync(fn(*args))
    t0 = time.time()
    for _ in range(n):
        sync(fn(*args))
    return (time.time() - t0) / n


report = {}

# ---- pixel-compacted sweep kernel -------------------------------------
from remotesensingproject_tpu.ops.sweep_pallas import (  # noqa: E402
    prepare_padded_epis)
from remotesensingproject_tpu.ops.sweep_pallas_pixel import (  # noqa: E402
    sweep_pile_pallas_pixel)

padded = prepare_padded_epis(epis, dmin, dmax, params.slope_factor)
padded = (jax.block_until_ready(padded[0]), padded[1], padded[2])
S_tot = S + int(padded[2])

rng = np.random.default_rng(0)
for frac, tag in ((0.9, "dense"), (0.05, "sparse")):
    active = jnp.asarray(rng.random((V, U)) < frac)
    n_act = int(jnp.sum(active))
    pad_f, s_pad = int(padded[1]), int(padded[2])
    # big arrays must be jit ARGUMENTS (captured device constants blow
    # up the axon compile payload)
    fn = jax.jit(lambda e, a, ep: sweep_pile_pallas_pixel(
        e, dmin, dmax, D, S // 2, params, active_v_u=a,
        padded=(ep, pad_f, s_pad)))
    dt = timeit(fn, epis, active, padded[0])
    # per active pixel: D lanes x S_tot rows x (gather ~6 + mean-shift
    # iters x 9 + score 3) elem-ops; iters measured separately via the
    # ms_iter=1 delta (bench_pass.py) ~ 6 effective at this scene
    iters_eff = 6
    ops = n_act * 128 * S_tot * (6 + 9 * iters_eff + 3)
    report[f"sweep_pixel_{tag}"] = {
        "active_px": n_act, "time_s": round(dt, 4),
        "model_elem_ops": ops,
        "achieved_Tops": round(ops / dt / 1e12, 3),
        "vpu_fraction": round(ops / dt / VPU_PEAK, 3),
    }
    print(f"sweep_pixel {tag}: {dt*1e3:.1f} ms, "
          f"{ops/dt/1e12:.2f} Tops/s "
          f"({ops/dt/VPU_PEAK*100:.0f}% VPU)", flush=True)

# ---- propagation line-paint kernel ------------------------------------
from remotesensingproject_tpu.ops.propagation_pallas import (  # noqa: E402
    propagate_pallas)

s_hat = S // 2
grid = dmin + (dmax - dmin) * np.arange(D, dtype=np.float32) / (D - 1)
for frac, tag in ((0.5, "dense"), (0.02, "sparse")):
    sm = rng.random((V, U)) < frac
    depth_f = jnp.asarray(rng.choice(grid, (V, U)).astype(np.float32))
    rbar = frames[s_hat] + 0.01
    claim = jnp.asarray(rng.random((S, V, U)) < 0.5)
    tgt = jnp.zeros((S, V, U), jnp.float32)
    pay = ((tgt, depth_f), (tgt, depth_f))
    fn = jax.jit(lambda c, m, fr, df, rb, t: propagate_pallas(
        c, fr, df, rb, m, s_hat, (dmin, dmax),
        params.slope_factor, params.propagation_epsilon,
        ((t, df), (t, df))))
    smj = jnp.asarray(sm)
    dt = timeit(fn, claim, smj, frames, depth_f, rbar, tgt)
    # executed o-steps (upper bound: full per-tile ranges), ~13 elem-ops
    # per [Vt, U9] plane element per step
    offs = np.asarray(depth_f) * params.slope_factor
    offs_m = np.where(sm, offs, np.nan)
    Vt = 128
    V8 = (-(-V // 32)) * 32
    n_vt = -(-V8 // Vt)
    U9 = -(-U // 128) * 128
    # the kernel tiles the 32-PADDED grid (v0 = min(t*Vt, V8 - Vt), with
    # source-free padding rows), so the model must tile identically or
    # its per-tile offset extremes / o-step count diverge from what
    # actually executes (round-3 advisor)
    offs_pad = np.full((V8, U), np.nan, np.float32)
    offs_pad[:V] = offs_m
    steps = 0
    for t in range(n_vt):
        v0 = min(t * Vt, V8 - Vt)
        o = offs_pad[v0:v0 + Vt]
        if np.isnan(o).all():
            continue
        mn, mx = np.nanmin(o), np.nanmax(o)
        for s in range(S):
            ds = s_hat - s
            c1, c2 = round(mn * ds), round(mx * ds)
            steps += abs(c2 - c1) + 1
    ops = steps * Vt * U9 * 13
    report[f"prop_{tag}"] = {
        "sources": int(sm.sum()), "o_steps": int(steps),
        "time_s": round(dt, 4),
        "model_elem_ops": int(ops),
        "achieved_Tops": round(ops / dt / 1e12, 3),
        "vpu_fraction": round(ops / dt / VPU_PEAK, 3),
    }
    print(f"prop {tag}: {dt*1e3:.1f} ms, {steps} o-steps, "
          f"{ops/dt/1e12:.2f} Tops/s ({ops/dt/VPU_PEAK*100:.0f}% VPU)",
          flush=True)

# ---- HBM streaming floor of a pass ------------------------------------
# the per-pass state traffic (claim + frame + 2 targets r/w + masks),
# the bandwidth-bound term no kernel can avoid
bytes_pass = S * V * U * (1 + 4 * C + 2 * 4 * 2 + 1)
report["pass_stream_floor_ms"] = round(bytes_pass / HBM_BW * 1e3, 3)
print(f"per-pass HBM streaming floor: "
      f"{bytes_pass/HBM_BW*1e3:.2f} ms", flush=True)

with open("ROOFLINE.json", "w") as f:
    json.dump(report, f, indent=1)
print("wrote ROOFLINE.json")
