"""Attribute CLIENT-SIDE compile time of the level-0 pass pipeline to
its components: pixel sweep kernel (Mosaic), propagation, selective
median, and the full _schedule_fn chunk (the static scan around
everything).

CAVEAT (round-4 finding, docs/PERF.md): on the axon platform,
.lower().compile() only measures the CLIENT step (~seconds) — the real
backend compile is DEFERRED to each program's first execution and can
be 100x larger.  Use a first-vs-second EXECUTION timing (with a true
np.asarray sync; block_until_ready lies over the tunnel) to measure
the deferred cost.  These rows are still useful for trace/lowering
regressions.

Usage: python scripts/bench_compile.py [S V U D]   (default small bench)
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from remotesensingproject_tpu.config import DepthParams
from remotesensingproject_tpu.models.depth2d import (
    Depth2DState, _pass_fn, _schedule_fn)
from remotesensingproject_tpu.ops.median import selective_median
from remotesensingproject_tpu.ops.propagation import propagate
from remotesensingproject_tpu.ops.sweep_pallas import prepare_padded_epis
from remotesensingproject_tpu.ops.sweep_pallas_pixel import (
    sweep_pile_pallas_pixel)

args = [int(a) for a in sys.argv[1:]] or [24, 128, 256, 32]
S, V, U, D = args
dmin, dmax = -1.0, 4.0
params = DepthParams()

epis = jnp.zeros((V, S, U, 1), jnp.float32)
frames = jnp.zeros((S, V, U, 1), jnp.float32)
padded = prepare_padded_epis(epis, dmin, dmax, 1.0)
pad_static = (int(padded[1]), int(padded[2]))
epi_pad = padded[0]
active = jnp.ones((V, U), bool)


def timed(name, fn, *xs):
    t0 = time.time()
    lowered = jax.jit(fn).lower(*xs)
    t_lower = time.time() - t0
    t0 = time.time()
    lowered.compile()
    t_compile = time.time() - t0
    print(f"{name:28s} trace+lower {t_lower:6.1f}s   compile "
          f"{t_compile:6.1f}s", flush=True)


# NOTE: epi_pad must be an ARGUMENT, not a closure constant — jit
# lowering fetches closure-captured device arrays back to the host to
# embed them as MLIR constants, which over the remote axon tunnel
# stalls .lower() indefinitely on the ~0.5 GB padded volume.
def sweep_only(epis, active, ep):
    return sweep_pile_pallas_pixel(
        epis, dmin, dmax, D, S // 2, params, active_v_u=active,
        padded=(ep, pad_static[0], pad_static[1]))


def sweep_pp(epis, active, bmin, bmax, ep):
    return sweep_pile_pallas_pixel(
        epis, dmin, dmax, D, S // 2, params, active_v_u=active,
        padded=(ep, pad_static[0], pad_static[1]),
        dmin_v_u=bmin, dmax_v_u=bmax)


def prop_only(claim, frames, filt, rbar, sm):
    payloads = [(jnp.zeros((S, V, U)), filt),
                (jnp.zeros((S, V, U)), jnp.zeros((V, U)))]
    return propagate(claim, frames, filt, rbar, sm, S // 2,
                     (dmin, dmax), 1.0, 0.1, payloads, dim_d=D)


def med_only(d, f, m):
    return selective_median(d, f, m, params.median_filter_size,
                            params.median_filter_epsilon)


st = Depth2DState(
    ce=jnp.zeros((S, V, U)), ce_mask=jnp.zeros((S, V, U), bool),
    disp_conf=jnp.zeros((S, V, U)), line_conf=jnp.zeros((S, V, U)),
    best_depth=jnp.zeros((S, V, U)),
    rbar=jnp.zeros((S, V, U, 1)), claim=jnp.zeros((S, V, U), bool))
bmin = jnp.full((S, V, U), dmin)
bmax = jnp.full((S, V, U), dmax)

kw = dict(dim_d=D, params=params, d_bounds=(dmin, dmax),
          use_pallas=True, uniform_bounds=True, pad_static=pad_static,
          coarse_mode="tile")

timed("pixel sweep (uniform)", sweep_only, epis, active, epi_pad)
timed("pixel sweep (per-pixel)", sweep_pp, epis, active,
      jnp.full((V, U), dmin), jnp.full((V, U), dmax), epi_pad)
timed("propagation (buckets)", prop_only,
      jnp.zeros((S, V, U), bool), frames, jnp.zeros((V, U)),
      jnp.zeros((V, U, 1)), jnp.zeros((V, U), bool))
timed("selective median", med_only, jnp.zeros((V, U)),
      jnp.zeros((V, U, 1)), jnp.zeros((V, U), bool))
timed("one _pass_fn (uniform)",
      functools.partial(_pass_fn, **kw),
      epis, frames, bmin, bmax, epi_pad, st, jnp.int32(S // 2))
timed("8-pass _schedule_fn",
      functools.partial(_schedule_fn, **kw),
      epis, frames, bmin, bmax, epi_pad, st,
      jnp.arange(8, dtype=jnp.int32))
