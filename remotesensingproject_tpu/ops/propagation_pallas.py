"""Pallas line-paint kernel for temporal depth propagation.

The XLA path (ops/propagation.py) executes each per-offset paint step as
HBM-bound full-plane ops: one step reads ~9 padded planes (~30 MB at the
SkysatLR18 shape), and a pass visits hundreds to thousands of steps —
measured ~100-250 ms/pass, the single largest term of a level-0 pass
(docs/PERF.md).  This kernel runs the IDENTICAL descending-offset scan
with every per-offset op in VMEM (~20x the bandwidth), streaming each
(s, v-tile) block exactly once per pass:

* grid = (v-tiles, s): propagation is independent across both axes —
  every paint touches only (s_hat-sourced rows, same v, shifted u), so
  (s, v-tile) blocks never interact (rslf_depth_computation_core.hpp:
  1083-1129 writes target plane s from the s_hat sources only);
* the source rows (masked offsets, r_bar, payload sources — functions of
  the s_hat plane only) are DMA'd to VMEM once per v-tile and reused for
  all S planes (grid iterates s fastest);
* the per-s offset scan runs o = o_hi .. o_lo DESCENDING (first-writer-
  wins == the reference's smallest-source-u-first sequential order, see
  ops/propagation.py), with the per-(tile, s) range derived from the
  tile's masked per-unit-ds offset extremes — round_half_away is
  monotone, so [rnd(mn*ds), rnd(mx*ds)] bounds every realized offset of
  the tile exactly and skipping unrealized offsets is a no-op;
* each offset step materializes the shifted source windows via the
  aligned-slice + pltpu.roll idiom (Mosaic has no unaligned dynamic
  lane slice), tests the tag row for any match, and skips the radiance
  gate + paint when no source realizes this offset (late passes leave
  gappy ranges);
* the final v-tile overlaps the previous one when Vt does not divide V:
  per-v independence makes the overlap rows compute bit-identical
  results in both grid steps, so the double write is benign.

Bit-parity with ops/propagation.propagate is enforced by
tests/test_propagation_pallas.py (interpret mode) and the on-chip
acceptance script.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..types import DTYPE, chan_scale


def _round_half_away(x):
    # types.round_half_away, inlined for the kernel (same float ops)
    return jnp.sign(x) * jnp.floor(jnp.abs(x) + 0.5)


def _paint_kernel(s_hat_ref, mn_ref, mx_ref, any_ref,
                  offs_hbm, rbar_hbm, src_hbm, claim_hbm, frames_hbm,
                  tgt_hbm,
                  claim_out, tgt_out,
                  offs_vmem, rbar_vmem, src_vmem, tag_scr,
                  claim_vmem, frame_vmem, tgt_vmem,
                  sem_src, sem_in, sem_out, *,
                  S: int, V8: int, U9: int, C: int, P: int, Vt: int,
                  PADO: int, W_roll: int, eps_sq: float):
    t = pl.program_id(0)
    s = pl.program_id(1)
    # tile starts are multiples of 32 by construction (V8, Vt both are):
    # the hint lets Mosaic prove the HBM slices respect the memref tiling
    v0 = pl.multiple_of(jnp.minimum(t * Vt, V8 - Vt), 32)
    s_hat = s_hat_ref[0, 0]
    a = DTYPE(chan_scale(C))

    # ---- per-v-tile source rows (s iterates fastest: load at s == 0) --
    @pl.when(s == 0)
    def _load_sources():
        cps = [pltpu.make_async_copy(
            offs_hbm.at[pl.ds(v0, Vt)], offs_vmem, sem_src)]
        for c in range(C):
            cps.append(pltpu.make_async_copy(
                rbar_hbm.at[c, pl.ds(v0, Vt)], rbar_vmem.at[c], sem_src))
        for p in range(P):
            cps.append(pltpu.make_async_copy(
                src_hbm.at[p, pl.ds(v0, Vt)], src_vmem.at[p], sem_src))
        for cp in cps:
            cp.start()
        for cp in cps:
            cp.wait()

    # ---- per-(tile, s) block loads ------------------------------------
    cps = [pltpu.make_async_copy(
        claim_hbm.at[s, pl.ds(v0, Vt)], claim_vmem, sem_in)]  # int8
    for c in range(C):
        cps.append(pltpu.make_async_copy(
            frames_hbm.at[c, s, pl.ds(v0, Vt)], frame_vmem.at[c], sem_in))
    for p in range(P):
        cps.append(pltpu.make_async_copy(
            tgt_hbm.at[p, s, pl.ds(v0, Vt)], tgt_vmem.at[p], sem_in))
    for cp in cps:
        cp.start()
    for cp in cps:
        cp.wait()

    ds = (s_hat - s).astype(DTYPE)
    c1 = _round_half_away(mn_ref[0, t] * ds)
    c2 = _round_half_away(mx_ref[0, t] * ds)
    o_lo = jnp.minimum(c1, c2).astype(jnp.int32)
    o_hi = jnp.maximum(c1, c2).astype(jnp.int32)
    claimable = jnp.max(claim_vmem[:, :].astype(jnp.int32)) > 0
    n_o = jnp.where((any_ref[0, t] > 0) & claimable, o_hi - o_lo + 1, 0)

    # hoisted per-s: tags = rounded realized offsets of masked sources
    # (inf at unmasked: inf * ds = +-inf and inf * 0 = nan, neither ever
    # equals an integer offset — the XLA path's separate sm test, folded)
    tag_scr[:, :] = _round_half_away(offs_vmem[:, :] * ds)

    def windows(o):
        """Shifted [Vt, U] views of the source rows at offset o."""
        st = PADO - o
        rem = jax.lax.rem(st, 128)
        base = pl.multiple_of(st - rem, 128)

        # positive-equivalent rotate amount: tpu.dynamic_rotate's
        # hardware lowering diverges from interpret mode for negative
        # shifts (measured on v5e: negative amounts under-rotate)
        sh = jnp.where(rem == 0, 0, W_roll - rem)

        def cut(ref):
            w = ref[:, pl.ds(base, W_roll)]
            return pltpu.roll(w, sh, axis=1)[:, :U9]
        return cut

    def per_o(i, carry):
        o = o_hi - i
        o_f = o.astype(DTYPE)
        cut = windows(o)
        cond_src = cut(tag_scr) == o_f
        n_hit = jnp.max(jnp.where(cond_src, jnp.int32(1), jnp.int32(0)))

        @pl.when(n_hit > 0)
        def _paint():
            dsq = None
            for c in range(C):
                diff = frame_vmem[c, :, :] - cut(rbar_vmem.at[c])
                d2 = diff * diff
                dsq = d2 if dsq is None else dsq + d2
            cond = (cond_src & (claim_vmem[:, :] != 0)
                    & (a * dsq < DTYPE(eps_sq)))
            for p in range(P):
                tgt_vmem[p, :, :] = jnp.where(
                    cond, cut(src_vmem.at[p]), tgt_vmem[p, :, :])
            claim_vmem[:, :] = jnp.where(cond, jnp.int8(0),
                                         claim_vmem[:, :])
        return carry

    jax.lax.fori_loop(0, n_o, per_o, 0)

    # ---- write back ----------------------------------------------------
    cps = [pltpu.make_async_copy(
        claim_vmem, claim_out.at[s, pl.ds(v0, Vt)], sem_out)]
    for p in range(P):
        cps.append(pltpu.make_async_copy(
            tgt_vmem.at[p], tgt_out.at[p, s, pl.ds(v0, Vt)], sem_out))
    for cp in cps:
        cp.start()
    for cp in cps:
        cp.wait()


def propagate_pallas(
    claim_s_v_u: jnp.ndarray,       # [S, V, U] bool (True = unclaimed)
    frames_s_v_u_c: jnp.ndarray,    # [S, V, U, C] normalized volume
    depth_f_v_u: jnp.ndarray,       # [V, U] filtered sweep depths at s_hat
    rbar_v_u_c: jnp.ndarray,        # [V, U, C] dominant radiance at s_hat
    source_mask_v_u: jnp.ndarray,   # [V, U] bool propagation criterion
    s_hat,                           # traced int32
    d_bounds: Tuple[float, float],   # static global (dmin, dmax) of level
    slope_factor: float,
    epsilon: float,
    payloads: Sequence[Tuple[jnp.ndarray, jnp.ndarray]],
    interpret: bool = False,
):
    """Line painting with the Pallas kernel; same contract and bitwise
    results as ops.propagation.propagate (any per-pixel depth values —
    no candidate-grid assumption, unlike the XLA bucket path)."""
    S, V, U = claim_s_v_u.shape
    C = frames_s_v_u_c.shape[-1]
    P = len(payloads)
    dmin, dmax = d_bounds
    s_hat = jnp.asarray(s_hat, jnp.int32).reshape(1, 1)

    ds_max = max(1, S - 1)
    PADO = int(np.ceil(max(abs(dmin), abs(dmax)) * slope_factor
                       * ds_max)) + 1
    # every sliced lane extent must be 128-aligned (Mosaic memref
    # tiling): the per-s blocks are padded to U9 (pad columns carry
    # claim 0 — never painted — and are sliced off at the end), the
    # roll window covers U9 plus one lane group of slack
    U9 = (-(-U // 128)) * 128
    W_roll = U9 + 128
    W_src = (-(-(2 * PADO + W_roll) // 128)) * 128

    # v padded to the int8 memref tiling (32) so every tile start is a
    # provably-aligned dynamic slice; padded rows have no sources
    # (tag inf) and claim 0, so they are never painted
    V8 = (-(-V // 32)) * 32
    Vt = V8 if V8 < 64 else 64
    n_vt = -(-V8 // Vt)

    offs_num = depth_f_v_u * DTYPE(slope_factor)
    offs_m = jnp.where(source_mask_v_u, offs_num, jnp.inf)

    def pad_u(x, value, v_axis=None):
        cfg = [(0, 0)] * x.ndim
        cfg[-1] = (PADO, W_src - U - PADO)
        if v_axis is not None:
            cfg[v_axis] = (0, V8 - V)
        return jnp.pad(x, cfg, constant_values=value)

    def pad_v(x, axis):
        cfg = [(0, 0)] * x.ndim
        cfg[axis] = (0, V8 - V)
        cfg[-1] = (0, U9 - U)
        return jnp.pad(x, cfg)

    offs_pad = pad_u(offs_m, jnp.inf, v_axis=0)              # [V8, W]
    rbar_pad = pad_u(jnp.moveaxis(rbar_v_u_c, -1, 0), 0.0,
                     v_axis=1)                               # [C, V8, W]
    src_pad = pad_u(jnp.stack([s for _, s in payloads]), 0.0,
                    v_axis=1)                                # [P, V8, W]
    frames_t = pad_v(jnp.moveaxis(frames_s_v_u_c, -1, 0), 2)  # [C,S,V8,U]
    tgt_in = pad_v(jnp.stack([t for t, _ in payloads]), 2)   # [P,S,V8,U]
    claim_in = pad_v(claim_s_v_u.astype(jnp.int8), 1)        # [S, V8, U]

    # per-tile masked offset extremes -> exact realized o ranges
    mns, mxs, anys = [], [], []
    for t in range(n_vt):
        v0 = min(t * Vt, V8 - Vt)
        sm_t = source_mask_v_u[v0:v0 + Vt]
        of_t = offs_num[v0:v0 + Vt]
        any_t = jnp.any(sm_t)
        mns.append(jnp.where(
            any_t, jnp.min(jnp.where(sm_t, of_t, jnp.inf)), 0.0))
        mxs.append(jnp.where(
            any_t, jnp.max(jnp.where(sm_t, of_t, -jnp.inf)), 0.0))
        anys.append(any_t.astype(jnp.int32))
    mn_arr = jnp.stack(mns)[None].astype(DTYPE)              # [1, n_vt]
    mx_arr = jnp.stack(mxs)[None].astype(DTYPE)
    any_arr = jnp.stack(anys)[None]                          # [1, n_vt]

    kernel = functools.partial(
        _paint_kernel, S=S, V8=V8, U9=U9, C=C, P=P, Vt=Vt, PADO=PADO,
        W_roll=W_roll, eps_sq=float(np.float32(epsilon) ** 2))

    def smem2(cols):
        return pl.BlockSpec((1, cols), lambda i, j: (0, 0),
                            memory_space=pltpu.SMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_vt, S),
        in_specs=[
            smem2(1),                                   # s_hat
            smem2(n_vt), smem2(n_vt), smem2(n_vt),      # mn, mx, any
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),       # offs_pad
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),       # rbar_pad
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),       # src_pad
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),       # claim
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),       # frames
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),       # targets
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),       # claim out
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),       # targets out
        ],
        scratch_shapes=[
            pltpu.VMEM((Vt, W_src), DTYPE),             # offs rows
            pltpu.VMEM((C, Vt, W_src), DTYPE),          # rbar rows
            pltpu.VMEM((P, Vt, W_src), DTYPE),          # payload rows
            pltpu.VMEM((Vt, W_src), DTYPE),             # tag scratch
            pltpu.VMEM((Vt, U9), jnp.int8),             # claim block
            pltpu.VMEM((C, Vt, U9), DTYPE),             # frame block
            pltpu.VMEM((P, Vt, U9), DTYPE),             # target blocks
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )

    claim_out, tgt_out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((S, V8, U9), jnp.int8),
            jax.ShapeDtypeStruct((P, S, V8, U9), DTYPE),
        ],
        interpret=interpret,
    )(s_hat, mn_arr, mx_arr, any_arr, offs_pad, rbar_pad, src_pad,
      claim_in, frames_t, tgt_in)

    return claim_out[:, :V, :U].astype(jnp.bool_), tuple(
        tgt_out[p][:, :V, :U] for p in range(P))
