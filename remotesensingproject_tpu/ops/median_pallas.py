"""Pallas selective-median kernel.

The XLA selective median (ops/median.py) is the last non-kernel stage
inside the pass loop: even with the odd-even min/max network replacing
the variadic sort, XLA materializes enough of the 25 tap planes between
fusions that a level-0 pass pays ~50 ms (scripts/bench_pass.py).  This
kernel keeps the whole thing in VMEM: one grid step loads a
(Vt + halo, U) row block of src/mask/frame once, builds the 25 shifted
taps with static row/lane offsets, runs the identical inclusion test
(mask & sqrt(chan_scale * sum((f_c - f_tap)^2)) < eps — the exact
types.norm expression), the same odd-even transposition network, and
the same n//2 one-hot pick, then writes the interior rows.

Bit-parity with ops.median.selective_median is asserted in interpret
mode (tests/test_median_pallas.py) and on-chip by
scripts/tpu_acceptance.py: every arithmetic op sequence matches the
XLA path exactly (same inclusion expression, same network, same pick).

Reference: selective_median_filter,
rslf_depth_computation_core.hpp:663-718.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..types import DTYPE, chan_scale
from .median import _sort_taps

VT = 16          # interior rows per grid step
ROW_PAD = 8      # top padding rows (>= halo 2, sublane-aligned)


def _median_kernel(src_hbm, mask_hbm, frame_hbm, out_hbm,
                   src_v, mask_v, frame_v, out_v,
                   sem_in, sem_out, *,
                   size: int, epsilon: float, Vt: int, WROWS: int,
                   U: int, UP: int, C: int, n_vt: int):
    t = pl.program_id(0)
    w = (size - 1) // 2
    r0 = pl.multiple_of(t * Vt, 8)

    cps = [pltpu.make_async_copy(src_hbm.at[pl.ds(r0, WROWS)], src_v,
                                 sem_in),
           pltpu.make_async_copy(mask_hbm.at[pl.ds(r0, WROWS)], mask_v,
                                 sem_in)]
    for c in range(C):
        cps.append(pltpu.make_async_copy(
            frame_hbm.at[c, pl.ds(r0, WROWS)], frame_v.at[c], sem_in))
    for cp in cps:
        cp.start()
    for cp in cps:
        cp.wait()

    # interior rows sit at ROW_PAD within the padded array, i.e. at
    # ROW_PAD - r0 + t*Vt = ROW_PAD (r0 == t*Vt) within this window;
    # taps span [ROW_PAD - w, ROW_PAD + Vt + w).
    base_r = ROW_PAD
    base_u = 128

    def tap(ref, dy, dx):
        return ref[base_r - w + dy: base_r - w + dy + Vt,
                   base_u - w + dx: base_u - w + dx + U]

    def ftap(c, dy, dx):
        return frame_v[c, base_r - w + dy: base_r - w + dy + Vt,
                       base_u - w + dx: base_u - w + dx + U]

    center_mask = tap(mask_v, w, w)
    sortable = []
    n = jnp.zeros((Vt, U), jnp.int32)
    for dy in range(size):
        for dx in range(size):
            sv = tap(src_v, dy, dx)
            mv = tap(mask_v, dy, dx)
            dsq = None
            for c in range(C):
                diff = ftap(c, w, w) - ftap(c, dy, dx)
                d2 = diff * diff
                dsq = d2 if dsq is None else dsq + d2
            # the exact types.norm expression of the XLA path
            nrm = jnp.sqrt(DTYPE(chan_scale(C)) * dsq)
            inc = (mv > 0) & (nrm < DTYPE(epsilon))
            sortable.append(jnp.where(inc, sv, DTYPE(jnp.inf)))
            n = n + inc.astype(jnp.int32)

    ordered = _sort_taps(sortable)
    pick = jnp.clip(n // 2, 0, size * size - 1)
    med = jnp.zeros((Vt, U), DTYPE)
    for i, o in enumerate(ordered):
        med = med + jnp.where(pick == i, o, 0.0)
    out_v[:, :U] = jnp.where(center_mask > 0, med, 0.0)
    out_v[:, U:] = jnp.zeros((Vt, UP - U), DTYPE)

    co = pltpu.make_async_copy(out_v, out_hbm.at[pl.ds(r0, Vt)], sem_out)
    co.start()
    co.wait()


def selective_median_pallas(src_v_u, frame_v_u_c, mask_v_u, size: int,
                            epsilon: float, interpret: bool = False):
    """Drop-in for ops.median.selective_median (bitwise identical)."""
    V, U = src_v_u.shape
    C = frame_v_u_c.shape[-1]
    w = (size - 1) // 2
    assert w <= ROW_PAD and w <= 128
    n_vt = -(-V // VT)
    Rp = ROW_PAD + n_vt * VT + VT + ROW_PAD   # slack for the window DMA
    UP = 128 + (-(-U // 128)) * 128 + 128

    def pad(x, v_axis=0):
        cfg = [(0, 0)] * x.ndim
        cfg[v_axis] = (ROW_PAD, Rp - V - ROW_PAD)
        cfg[v_axis + 1] = (128, UP - U - 128)
        return jnp.pad(x, cfg)

    srcp = pad(src_v_u)
    maskp = pad(mask_v_u.astype(DTYPE))
    framep = pad(jnp.moveaxis(frame_v_u_c, -1, 0), v_axis=1)  # [C,Rp,UP]

    WROWS = VT + 2 * ROW_PAD
    kernel = functools.partial(
        _median_kernel, size=size, epsilon=float(np.float32(epsilon)),
        Vt=VT, WROWS=WROWS, U=U, UP=UP, C=C, n_vt=n_vt)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_vt,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY)] * 3,
        out_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY)],
        scratch_shapes=[
            pltpu.VMEM((WROWS, UP), DTYPE),        # src window
            pltpu.VMEM((WROWS, UP), DTYPE),        # mask window
            pltpu.VMEM((C, WROWS, UP), DTYPE),     # frame window
            pltpu.VMEM((VT, UP), DTYPE),           # out rows
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((n_vt * VT, UP), DTYPE)],
        interpret=interpret,
    )(srcp, maskp, framep)[0]
    return out[:V, :U]
