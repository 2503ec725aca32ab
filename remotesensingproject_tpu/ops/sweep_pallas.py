"""Pallas TPU kernel for the slope sweep (uniform disparity bounds).

This is the hot path of the whole engine — the TPU-native re-design of
compute_1D_depth_epi (rslf_depth_computation_core.hpp:480-661) for the
case where every pixel shares the same [dmin, dmax] candidate grid (the
finest pyramid level and any standalone Depth1D/2D run; coarser levels
with per-pixel bounds use the XLA path in sweep.py).

Design (one grid step per EPI row v):

* the whole NaN-padded EPI ``[C, S, U + 2*PAD]`` sits in VMEM (<= ~1.2 MB
  for a 100 x 1920 float32 EPI) — the sheared gather at a uniform
  disparity d is then a DYNAMIC SLICE per (s, d): all u lanes read at a
  common integer offset floor((s_hat - s) * d * slope) and blend two
  shifted rows with a scalar weight.  No per-lane gather, no index
  matrices (the reference materializes I = S*D + u per pixel, which a
  vector machine does not need).
* out-of-range samples are zero with a separate arithmetic validity mask
  (a per-(s,d) u-interval), reproducing the reference's interpolation
  validity rule (rslf_interpolation.hpp:182) without NaNs in the kernel.
* the truncated mean shift runs as (S, U)-shaped VPU array ops inside a
  fori over the d candidates, carrying running argmax state as [U] rows —
  the d axis never materializes in memory.
* numerics follow the reference exactly (kernel-of-last-iteration scoring,
  card_R division, first-max argmax) except that the sample index
  I = shift + u is decomposed as (floor(shift), frac(shift)) shared by
  all lanes, which can differ from the reference's per-pixel float32
  rounding of shift + u in the last ulp of the interpolation weight.

The kernel is VPU-compute-bound: ~9 flops/element over S*U*D*iters
elements per (v, pass); HBM traffic is one EPI read per v plus rows.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import DepthParams
from ..types import DTYPE, chan_scale
from .sweep import SweepResult


def candidate_disparities(dmin: float, dmax: float, dim_d: int) -> np.ndarray:
    """The uniform candidate grid with the reference's exact float32
    arithmetic order (core.hpp:548)."""
    f = np.float32
    rng = f(f(dmax) - f(dmin))
    return np.array(
        [f(f(dmin) + f(f(f(d) * rng) / f(dim_d - 1)))
         for d in range(dim_d)], np.float32)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def make_fetch_remap(flags):
    """Map row i -> the nearest active row index at or before i.

    Used as the EPI block index for skipped rows: consecutive grid steps
    with an unchanged block index skip the DMA entirely, so a pass where
    most rows are claimed fetches only the active rows' EPIs instead of
    paying a fetch-latency floor for every row.
    """
    V = flags.shape[0]
    idx = jnp.where(flags > 0, jnp.arange(V, dtype=jnp.int32), -1)
    rowmap = jax.lax.cummax(idx)
    return jnp.maximum(rowmap, 0)


def _sweep_kernel(flags_ref, rowmap_ref, s_hat_ref, dvec_ref, epi_ref,
                  best_score_ref, score_sum_ref, best_depth_ref,
                  rbar_ref, kbest_ref, shear_ref, valid_ref, *,
                  S: int, U: int, Ux: int, C: int, PAD: int, dim_d: int,
                  s_pad: int, slope_factor: float, h: float,
                  iters: int, with_k_best: bool):
    """One EPI row: full (d, mean-shift) sweep.  See module docstring.

    ``Ux`` is the 128-aligned compute width (>= U); surplus lanes compute
    garbage that the wrapper slices off — all lane ops are element-wise so
    they never contaminate real lanes.

    The kernel is NaN-free: the EPI is ZERO-padded and sample validity is
    the interval  -floor(shift) <= u <= U-1-ceil(shift)  (the reference's
    interpolation rule, rslf_interpolation.hpp:182, specialised to a
    per-(s,d) scalar shift), evaluated as lane-iota compares.
    """
    # Row skipping: rows whose active-pixel flag is 0 (all pixels
    # claimed or unconfident) skip the whole sweep — the merge in the
    # driver never reads their outputs.  This is what makes the later
    # center-outward passes nearly free, the dense analog of the
    # reference's findNonZero sparsity (core.hpp:515-516).
    run_row = flags_ref[pl.program_id(0)] != 0

    @pl.when(run_row)
    def _run():
        _sweep_row_body(s_hat_ref, dvec_ref, epi_ref, best_score_ref,
                        score_sum_ref, best_depth_ref, rbar_ref,
                        kbest_ref, shear_ref, valid_ref, S=S, U=U, Ux=Ux,
                        C=C, PAD=PAD, dim_d=dim_d, s_pad=s_pad,
                        slope_factor=slope_factor, h=h, iters=iters,
                        with_k_best=with_k_best)


def _sweep_row_body(s_hat_ref, dvec_ref, epi_ref,
                    best_score_ref, score_sum_ref, best_depth_ref,
                    rbar_ref, kbest_ref, shear_ref, valid_ref, *,
                    S: int, U: int, Ux: int, C: int, PAD: int,
                    dim_d: int, s_pad: int, slope_factor: float,
                    h: float, iters: int, with_k_best: bool):
    s_hat = s_hat_ref[0, 0]
    a = DTYPE(chan_scale(C) / (h * h))
    S_tot = S + s_pad
    lane_u = jax.lax.broadcasted_iota(jnp.int32, (1, Ux), 1)

    def load_shifted_row(c, s, start):
        """epi[c, s, start : start + Ux] via 256-lane window rotates.

        Mosaic's dynamic lane rotate mis-rotates 3-vreg (384-lane)
        windows (verified on v5e), so each 128-lane output chunk rotates
        its own 2-vreg window — always width 256, rotate in [0, 127].
        """
        rem = jax.lax.rem(start, 128)
        base = start - rem
        parts = []
        for j in range(Ux // 128):
            win = epi_ref[0, c, pl.ds(s, 1),
                          pl.ds(pl.multiple_of(base + j * 128, 128), 256)]
            parts.append(pltpu.roll(win, -rem, axis=1)[:, :128])
        return jnp.concatenate(parts, axis=1)

    def sweep_one_d(d, carry):
        best_score, best_depth, score_sum, rbar, kbest = carry
        dval = dvec_ref[0, d]

        # ---- sheared gather ------------------------------------------
        # Mosaic only allows 128-aligned dynamic slices on the lane dim:
        # load an aligned window around the offset and lane-rotate the
        # residue into place (tpu dynamic rotate).
        def gather_s(s, _):
            shift = (s_hat - s).astype(DTYPE) * dval * DTYPE(slope_factor)
            i0 = jnp.floor(shift)
            t = shift - i0
            i0i = i0.astype(jnp.int32)
            start = i0i + PAD
            # validity interval: floor(u+shift) >= 0 and
            # ceil(u+shift) <= U-1  (ceil = i0i + (t > 0))
            ceil_off = i0i + (t > 0).astype(jnp.int32)
            ok_row = jnp.logical_and(
                lane_u >= -i0i,
                lane_u <= (U - 1) - ceil_off)
            ok_row = jnp.logical_and(ok_row, s < S)
            valid_ref[pl.ds(s, 1), :] = ok_row.astype(DTYPE)
            for c in range(C):
                row_a = load_shifted_row(c, s, start)
                row_b = load_shifted_row(c, s, start + 1)
                blend = (DTYPE(1.0) - t) * row_a + t * row_b
                shear_ref[c, pl.ds(s, 1), :] = jnp.where(
                    t == 0, row_a, blend)
            return 0

        jax.lax.fori_loop(0, S_tot, gather_s, 0)

        validf = valid_ref[:, :]                         # [S_tot, Ux]
        r0 = shear_ref[:, :, :] * validf                 # signed, 0-filled
        rpos = jnp.maximum(r0, 0.0)                      # un-nanified
        card = jnp.sum(validf, axis=0, keepdims=True)    # [1, Ux]

        # r_bar init: the s_hat row (shift 0 there, core.hpp:577);
        # read through the ref (dynamic scalar index on a ref is cheap).
        rbar0 = jnp.concatenate(
            [shear_ref[c, pl.ds(s_hat, 1), :] for c in range(C)], axis=0)

        def ms_iter(_, state):
            rbar_d, _k_last = state
            sq = jnp.zeros((S_tot, Ux), DTYPE)
            for c in range(C):
                diff = r0[c] - rbar_d[c:c + 1, :]
                sq = sq + diff * diff
            k = jnp.maximum(1.0 - a * sq, 0.0) * validf  # [S_tot, Ux]
            sum_k = jnp.sum(k, axis=0, keepdims=True)    # [1, Ux]
            nums = [jnp.sum(rpos[c] * k, axis=0, keepdims=True)
                    for c in range(C)]
            new_rbar = jnp.concatenate([
                jnp.where(sum_k > 0, n / sum_k, 0.0) for n in nums],
                axis=0)                                  # [C, Ux]
            return new_rbar, k

        # early exit when r_bar is stationary: further iterations are
        # exact no-ops (K, sums and r_bar reproduce themselves), so the
        # result is bit-identical to the fixed-count loop.
        k0 = jnp.zeros((S_tot, Ux), DTYPE)

        def ms_cond(state):
            i, _rb, _k, done = state
            return jnp.logical_and(i < iters, jnp.logical_not(done))

        def ms_step(state):
            i, rb, k, _done = state
            new_rb, new_k = ms_iter(i, (rb, k))
            done = jnp.all(new_rb == rb)
            return i + 1, new_rb, new_k, done

        _, rbar_d, k_last, _ = jax.lax.while_loop(
            ms_cond, ms_step, (jnp.int32(0), rbar0, k0, False))

        # score from the LAST iteration's kernel values (core.hpp:612-622)
        sum_k = jnp.sum(k_last, axis=0, keepdims=True)
        score = jnp.where(card > 0, sum_k / card, 0.0)   # [1, Ux]

        better = score > best_score                      # [1, Ux]
        best_score = jnp.where(better, score, best_score)
        best_depth = jnp.where(better, dval, best_depth)
        rbar = jnp.where(better, rbar_d, rbar)
        if with_k_best:
            kbest = jnp.where(better, k_last, kbest)
        score_sum = score_sum + score
        return best_score, best_depth, score_sum, rbar, kbest

    kbest_init = jnp.zeros((S_tot, Ux) if with_k_best else (8, 128),
                           DTYPE)
    init = (
        jnp.full((1, Ux), -1.0, DTYPE),
        jnp.zeros((1, Ux), DTYPE),
        jnp.zeros((1, Ux), DTYPE),
        jnp.zeros((C, Ux), DTYPE),
        kbest_init,
    )
    best_score, best_depth, score_sum, rbar, kbest = jax.lax.fori_loop(
        0, dim_d, sweep_one_d, init)

    best_score_ref[0, :, :] = best_score
    score_sum_ref[0, :, :] = score_sum
    best_depth_ref[0, :, :] = best_depth
    rbar_ref[0, :, :] = rbar
    if with_k_best:
        kbest_ref[0, :, :] = kbest


def prepare_padded_epis(epis_v_s_u_c, dmin: float, dmax: float,
                        slope_factor: float):
    """NaN-pad the EPI volume along u for the rotate-based gather and
    transpose to the kernel layout ``[V, C, S_tot, U_tot]``.

    The left pad PAD covers the maximum |(s_hat - s) * d * slope| plus the
    +1 of the linear blend; the right pad additionally covers the aligned
    window (base + Ux + 128 must stay in bounds).  S is padded to a
    sublane multiple with NaN rows (zero weight via the validity mask).
    """
    V, S, U, C = epis_v_s_u_c.shape
    max_abs_d = max(abs(dmin), abs(dmax))
    # >= 128 so that per-pixel-kernel window starts stay non-negative
    pad_f = max(128, int(np.ceil(S * max_abs_d * slope_factor)) + 2)
    Ux = _round_up(U, 128)
    # max window end: base + Ux + 128 <= start_max + Ux + 128
    #               <= (pad_f + pad_f) + Ux + 128
    right_needed = pad_f + (Ux - U) + pad_f + 256
    U_tot = _round_up(pad_f + U + right_needed, 128)
    pad_right = U_tot - U - pad_f
    s_pad = _round_up(S, 8) - S

    x = jnp.transpose(epis_v_s_u_c, (0, 3, 1, 2))  # [V, C, S, U]
    x = jnp.pad(x, ((0, 0), (0, 0), (0, s_pad), (pad_f, pad_right)))
    return x, pad_f, s_pad


def sweep_pile_pallas(epis_v_s_u_c, dmin: float, dmax: float, dim_d: int,
                      s_hat, params: DepthParams,
                      with_k_best: bool = False,
                      padded=None, interpret: bool = False,
                      row_active=None) -> SweepResult:
    """Dense uniform-bounds sweep over all EPIs via the Pallas kernel.

    Args:
      epis_v_s_u_c: ``[V, S, U, C]`` normalized volume (used for shapes
        and, when ``padded`` is None, to build the padded kernel input).
      dmin/dmax: scalar disparity bounds (static floats).
      s_hat: traced int32.
      padded: optional precomputed (padded_epis, PAD, s_pad) from
        :func:`prepare_padded_epis` to avoid repadding every pass.
      row_active: optional ``[V]`` bool/int; rows with 0 skip the sweep
        entirely (their outputs are garbage — callers must merge through
        an active-pixel mask, which the drivers do).
    """
    if params.interpolation != "linear":
        raise NotImplementedError(
            "pallas sweep implements linear interpolation only")
    V, S, U, C = epis_v_s_u_c.shape
    if padded is None:
        padded = prepare_padded_epis(epis_v_s_u_c, dmin, dmax,
                                     params.slope_factor)
    epi_pad, PAD, s_pad = padded
    S_tot = S + s_pad
    U_tot = epi_pad.shape[-1]

    dvec = candidate_disparities(dmin, dmax, dim_d)[None, :]  # (1, D)
    s_hat_arr = jnp.asarray(s_hat, jnp.int32).reshape(1, 1)

    Ux = _round_up(U, 128)
    kernel = functools.partial(
        _sweep_kernel, S=S, U=U, Ux=Ux, C=C, PAD=PAD, dim_d=dim_d,
        s_pad=s_pad,
        slope_factor=params.slope_factor, h=params.kernel_h,
        iters=params.mean_shift_max_iter, with_k_best=with_k_best)

    kb_S = S_tot if with_k_best else 8
    kb_U = Ux if with_k_best else 128
    out_shapes = [
        jax.ShapeDtypeStruct((V, 1, Ux), DTYPE),       # best_score
        jax.ShapeDtypeStruct((V, 1, Ux), DTYPE),       # score_sum
        jax.ShapeDtypeStruct((V, 1, Ux), DTYPE),       # best_depth
        jax.ShapeDtypeStruct((V, C, Ux), DTYPE),       # rbar
        jax.ShapeDtypeStruct((V, kb_S, kb_U), DTYPE),  # kbest
    ]
    out_specs = [
        pl.BlockSpec((1, 1, Ux), lambda i, f, r: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, Ux), lambda i, f, r: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, Ux), lambda i, f, r: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, C, Ux), lambda i, f, r: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, kb_S, kb_U), lambda i, f, r: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]

    if row_active is None:
        flags = jnp.ones((V,), jnp.int32)
    else:
        flags = row_active.astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(V,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i, f, r: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, dim_d), lambda i, f, r: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, C, S_tot, U_tot), lambda i, f, r: (r[i], 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        scratch_shapes=[pltpu.VMEM((C, S_tot, Ux), DTYPE),
                        pltpu.VMEM((S_tot, Ux), DTYPE)],
    )

    best_score, score_sum, best_depth, rbar, kbest = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        interpret=interpret,
    )(flags, make_fetch_remap(flags), s_hat_arr,
      jnp.asarray(dvec), epi_pad)

    if with_k_best:
        k_best = kbest[:, :S, :U]
    else:
        k_best = jnp.zeros((V, S, U), DTYPE)

    return SweepResult(
        best_score=best_score[:, 0, :U],
        score_mean=score_sum[:, 0, :U] / DTYPE(dim_d),
        best_depth=best_depth[:, 0, :U],
        rbar=jnp.transpose(rbar[:, :, :U], (0, 2, 1)),
        k_best=k_best,
    )
