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
* out-of-range samples are NaN by construction (the pad), reproducing the
  reference's interpolation validity rule (rslf_interpolation.hpp:182).
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


def _sweep_kernel(s_hat_ref, dvec_ref, epi_ref,
                  best_score_ref, score_sum_ref, best_depth_ref,
                  rbar_ref, kbest_ref, shear_ref, *,
                  S: int, U: int, C: int, PAD: int, dim_d: int,
                  s_pad: int, slope_factor: float, h: float,
                  iters: int, with_k_best: bool):
    """One EPI row: full (d, mean-shift) sweep.  See module docstring."""
    s_hat = s_hat_ref[0, 0]
    a = DTYPE(chan_scale(C) / (h * h))
    S_tot = S + s_pad

    def sweep_one_d(d, carry):
        best_score, best_depth, score_sum, rbar, kbest = carry
        dval = dvec_ref[0, d]

        # ---- sheared gather: dynamic slices at per-(s,d) offsets -------
        def gather_s(s, _):
            shift = (s_hat - s).astype(DTYPE) * dval * DTYPE(slope_factor)
            i0 = jnp.floor(shift)
            t = shift - i0
            start = i0.astype(jnp.int32) + PAD
            for c in range(C):
                row_a = epi_ref[0, c, s, pl.ds(start, U)]
                row_b = epi_ref[0, c, s, pl.ds(start + 1, U)]
                blend = (DTYPE(1.0) - t) * row_a + t * row_b
                shear_ref[c, s, :] = jnp.where(t == 0, row_a, blend)
            return 0

        jax.lax.fori_loop(0, S_tot, gather_s, 0, unroll=4)

        shear = shear_ref[:, :, :]                       # [C, S_tot, U]
        valid = jnp.logical_not(jnp.isnan(shear[0]))     # [S_tot, U]
        validf = valid.astype(DTYPE)
        r0 = jnp.where(jnp.isnan(shear), 0.0, shear)     # signed, 0-filled
        rpos = jnp.maximum(r0, 0.0)                      # un-nanified
        card = jnp.sum(validf, axis=0)                   # [U]

        # r_bar init: the s_hat row (shift 0 there, core.hpp:577);
        # read through the ref (dynamic scalar index on a ref is cheap).
        rbar0 = jnp.stack([shear_ref[c, s_hat, :] for c in range(C)])

        def ms_iter(_, state):
            rbar_d, _k_last = state
            sq = jnp.zeros((S_tot, U), DTYPE)
            for c in range(C):
                diff = r0[c] - rbar_d[c][None, :]
                sq = sq + diff * diff
            k = jnp.maximum(1.0 - a * sq, 0.0) * validf  # [S_tot, U]
            sum_k = jnp.sum(k, axis=0)                   # [U]
            nums = [jnp.sum(rpos[c] * k, axis=0) for c in range(C)]
            new_rbar = jnp.stack([
                jnp.where(sum_k > 0, n / sum_k, 0.0) for n in nums])
            return new_rbar, k

        k0 = jnp.zeros((S_tot, U), DTYPE)
        rbar_d, k_last = jax.lax.fori_loop(
            0, iters, ms_iter, (rbar0, k0))

        # score from the LAST iteration's kernel values (core.hpp:612-622)
        sum_k = jnp.sum(k_last, axis=0)
        score = jnp.where(card > 0, sum_k / card, 0.0)   # [U]

        better = score > best_score
        best_score = jnp.where(better, score, best_score)
        best_depth = jnp.where(better, dval, best_depth)
        rbar = jnp.where(better[None, :], rbar_d, rbar)
        if with_k_best:
            kbest = jnp.where(better[None, :], k_last, kbest)
        score_sum = score_sum + score
        return best_score, best_depth, score_sum, rbar, kbest

    kbest_init = jnp.zeros((S_tot, U) if with_k_best else (8, 128), DTYPE)
    init = (
        jnp.full((U,), -1.0, DTYPE),
        jnp.zeros((U,), DTYPE),
        jnp.zeros((U,), DTYPE),
        jnp.zeros((C, U), DTYPE),
        kbest_init,
    )
    best_score, best_depth, score_sum, rbar, kbest = jax.lax.fori_loop(
        0, dim_d, sweep_one_d, init)

    best_score_ref[0, :] = best_score
    score_sum_ref[0, :] = score_sum
    best_depth_ref[0, :] = best_depth
    rbar_ref[0, :, :] = rbar
    if with_k_best:
        kbest_ref[0, :, :] = kbest


def prepare_padded_epis(epis_v_s_u_c, dmin: float, dmax: float,
                        slope_factor: float):
    """NaN-pad the EPI volume along u for the slice-based gather and
    transpose to the kernel layout ``[V, C, S_tot, U + 2*PAD]``.

    PAD covers the maximum |(s_hat - s) * d * slope| plus the +1 of the
    linear blend; S is padded to a sublane multiple with NaN rows (they
    contribute zero weight via the validity mask).
    """
    V, S, U, C = epis_v_s_u_c.shape
    max_abs_d = max(abs(dmin), abs(dmax))
    pad_f = int(np.ceil(S * max_abs_d * slope_factor)) + 2
    upad_total = _round_up(U + 2 * pad_f, 128)
    extra = upad_total - (U + 2 * pad_f)
    pad_left = pad_f
    pad_right = pad_f + extra
    s_pad = _round_up(S, 8) - S

    x = jnp.transpose(epis_v_s_u_c, (0, 3, 1, 2))  # [V, C, S, U]
    x = jnp.pad(x, ((0, 0), (0, 0), (0, s_pad), (pad_left, pad_right)),
                constant_values=np.nan)
    return x, pad_left, s_pad


def sweep_pile_pallas(epis_v_s_u_c, dmin: float, dmax: float, dim_d: int,
                      s_hat, params: DepthParams,
                      with_k_best: bool = False,
                      padded=None, interpret: bool = False) -> SweepResult:
    """Dense uniform-bounds sweep over all EPIs via the Pallas kernel.

    Args:
      epis_v_s_u_c: ``[V, S, U, C]`` normalized volume (used for shapes
        and, when ``padded`` is None, to build the padded kernel input).
      dmin/dmax: scalar disparity bounds (static floats).
      s_hat: traced int32.
      padded: optional precomputed (padded_epis, PAD, s_pad) from
        :func:`prepare_padded_epis` to avoid repadding every pass.
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

    kernel = functools.partial(
        _sweep_kernel, S=S, U=U, C=C, PAD=PAD, dim_d=dim_d, s_pad=s_pad,
        slope_factor=params.slope_factor, h=params.kernel_h,
        iters=params.mean_shift_max_iter, with_k_best=with_k_best)

    kb_S = S_tot if with_k_best else 8
    kb_U = U if with_k_best else 128
    out_shapes = [
        jax.ShapeDtypeStruct((V, U), DTYPE),          # best_score
        jax.ShapeDtypeStruct((V, U), DTYPE),          # score_sum
        jax.ShapeDtypeStruct((V, U), DTYPE),          # best_depth
        jax.ShapeDtypeStruct((V, C, U), DTYPE),       # rbar
        jax.ShapeDtypeStruct((V, kb_S, kb_U), DTYPE),  # kbest
    ]
    out_specs = [
        pl.BlockSpec((1, U), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, U), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, U), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, C, U), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, kb_S, kb_U), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(V,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, dim_d), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, C, S_tot, U_tot), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        scratch_shapes=[pltpu.VMEM((C, S_tot, U), DTYPE)],
    )

    best_score, score_sum, best_depth, rbar, kbest = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        interpret=interpret,
    )(s_hat_arr, jnp.asarray(dvec), epi_pad)

    if with_k_best:
        k_best = jnp.transpose(kbest[:, :S, :], (0, 1, 2))
    else:
        k_best = jnp.zeros((V, S, U), DTYPE)

    return SweepResult(
        best_score=best_score,
        score_mean=score_sum / DTYPE(dim_d),
        best_depth=best_depth,
        rbar=jnp.transpose(rbar, (0, 2, 1)),
        k_best=k_best,
    )
