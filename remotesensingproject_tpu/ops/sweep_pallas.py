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
                  rbar_ref, kbest_ref, shear_ref, valid_ref,
                  shear_c_ref, valid_c_ref, *,
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
    # Activity skipping at two granularities (the dense analog of the
    # reference's findNonZero sparsity, core.hpp:515-516): rows whose
    # 128-lane chunks are ALL inactive skip everything; within an active
    # row, the gather runs full-width but the mean-shift/score — the
    # dominant cost — runs only on active chunks.  The merge in the
    # driver never reads inactive pixels' outputs.
    i = pl.program_id(0)
    n_chunks = Ux // 128
    any_chunk = flags_ref[i * n_chunks]
    for j in range(1, n_chunks):
        any_chunk = any_chunk | flags_ref[i * n_chunks + j]
    run_row = any_chunk != 0

    @pl.when(run_row)
    def _run():
        _sweep_row_body(i, flags_ref, s_hat_ref, dvec_ref, epi_ref,
                        best_score_ref,
                        score_sum_ref, best_depth_ref, rbar_ref,
                        kbest_ref, shear_ref, valid_ref,
                        shear_c_ref, valid_c_ref, S=S, U=U, Ux=Ux,
                        C=C, PAD=PAD, dim_d=dim_d, s_pad=s_pad,
                        slope_factor=slope_factor, h=h, iters=iters,
                        with_k_best=with_k_best)


def _sweep_row_body(i, flags_ref, s_hat_ref, dvec_ref, epi_ref,
                    best_score_ref, score_sum_ref, best_depth_ref,
                    rbar_ref, kbest_ref, shear_ref, valid_ref,
                    shear_c_ref, valid_c_ref, *,
                    S: int, U: int, Ux: int, C: int, PAD: int,
                    dim_d: int, s_pad: int, slope_factor: float,
                    h: float, iters: int, with_k_best: bool):
    s_hat = s_hat_ref[0, 0]
    a = DTYPE(chan_scale(C) / (h * h))
    S_tot = S + s_pad
    n_chunks = Ux // 128
    row0 = i * n_chunks
    lane_u = jax.lax.broadcasted_iota(jnp.int32, (1, Ux), 1)

    def load_shifted_rows(c, s, start):
        """(epi[c, s, start:start+Ux], epi[c, s, start+1:start+1+Ux]).

        256-lane window rotates (Mosaic's dynamic lane rotate mis-rotates
        3-vreg/384-lane windows — verified on v5e — so each 128-lane
        output chunk rotates its own 2-vreg window, rotate in [0, 127]).
        The +1 row is a STATIC single-lane rotate of the same rotated
        window — valid because rem + 128 <= 255 keeps lanes [1:129]
        un-wrapped — which halves the slices and dynamic rotates.
        """
        rem = jax.lax.rem(start, 128)
        base = start - rem
        parts_a, parts_b = [], []
        for j in range(Ux // 128):
            win = epi_ref[0, c, pl.ds(s, 1),
                          pl.ds(pl.multiple_of(base + j * 128, 128), 256)]
            parts_a.append(pltpu.roll(win, -rem, axis=1)[:, :128])
            parts_b.append(pltpu.roll(win, -(rem + 1), axis=1)[:, :128])
        return (jnp.concatenate(parts_a, axis=1),
                jnp.concatenate(parts_b, axis=1))

    def gather_d(dval):
        """Sheared gather of the full row for one candidate d.

        Mosaic only allows 128-aligned dynamic slices on the lane dim:
        load an aligned window around the offset and lane-rotate the
        residue into place (tpu dynamic rotate).
        """
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
                row_a, row_b = load_shifted_rows(c, s, start)
                blend = (DTYPE(1.0) - t) * row_a + t * row_b
                shear_ref[c, pl.ds(s, 1), :] = jnp.where(
                    t == 0, row_a, blend)
            return 0

        jax.lax.fori_loop(0, S_tot, gather_s, 0)

    def ms_score(shear, validf, use_while, rbar0):
        """Mean shift + score on a [S_tot, W] tile.

        ``use_while`` picks the early-exit while (worth it row-wide,
        where the scalar convergence check amortizes over the full
        width) vs a fixed-count fori (better per-chunk: no per-
        iteration scalar reduce/branch serialization).  Extra
        iterations after the fixpoint are exact no-ops, so both are
        bit-identical.
        """
        W = validf.shape[1]
        r0 = [sh * validf for sh in shear]
        rpos = [jnp.maximum(r, 0.0) for r in r0]
        card = jnp.sum(validf, axis=0, keepdims=True)

        def ms_iter(state):
            rbar_d, _k = state
            sq = jnp.zeros((S_tot, W), DTYPE)
            for c in range(C):
                diff = r0[c] - rbar_d[c:c + 1, :]
                sq = sq + diff * diff
            k = jnp.maximum(1.0 - a * sq, 0.0) * validf
            sum_k = jnp.sum(k, axis=0, keepdims=True)
            nums = [jnp.sum(rpos[c] * k, axis=0, keepdims=True)
                    for c in range(C)]
            new_rbar = jnp.concatenate([
                jnp.where(sum_k > 0, n / sum_k, 0.0)
                for n in nums], axis=0)
            return new_rbar, k

        k0 = jnp.zeros((S_tot, W), DTYPE)
        if use_while:
            def ms_cond(state):
                it, _rb, _k, done = state
                return jnp.logical_and(it < iters,
                                       jnp.logical_not(done))

            def ms_step(state):
                it, rb, k, _done = state
                new_rb, new_k = ms_iter((rb, k))
                done = jnp.all(new_rb == rb)
                return it + 1, new_rb, new_k, done

            _, rbar_d, k_last, _ = jax.lax.while_loop(
                ms_cond, ms_step, (jnp.int32(0), rbar0, k0, False))
        else:
            rbar_d, k_last = jax.lax.fori_loop(
                0, iters, lambda _, st: ms_iter(st), (rbar0, k0))

        # score from the LAST iteration's kernel values (core.hpp:612-622)
        sum_k = jnp.sum(k_last, axis=0, keepdims=True)
        score = jnp.where(card > 0, sum_k / card, 0.0)
        return score, rbar_d, k_last

    # ---- adaptive granularity (decided once per row: flags are pass
    # constants).  Fully-active rows run the ORIGINAL row-wide d-loop
    # with register-carried argmax state; partially-active rows run
    # chunk-gated with the state in the output refs, so claimed 128-lane
    # chunks cost nothing — late passes have most chunks fully claimed
    # (the dense analog of the reference's findNonZero sparsity).
    n_act = flags_ref[row0]
    for j in range(1, n_chunks):
        n_act = n_act + flags_ref[row0 + j]
    all_active = n_act == n_chunks

    @pl.when(all_active)
    def _row_wide():
        def sweep_one_d(d, carry):
            best_score, best_depth, score_sum, rbar, kbest = carry
            dval = dvec_ref[0, d]
            gather_d(dval)
            validf = valid_ref[:, :]
            shear = [shear_ref[c, :, :] for c in range(C)]
            rbar0 = jnp.concatenate(
                [shear_ref[c, pl.ds(s_hat, 1), :] for c in range(C)],
                axis=0)                                  # [C, Ux]
            score, rbar_d, k_last = ms_score(shear, validf, True, rbar0)

            better = score > best_score                  # [1, Ux]
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

    def gather_chunk(dval, j, shear_c_ref, valid_c_ref):
        """Sheared gather of ONE 128-lane chunk only (chunk-gated path):
        the same per-s scan as gather_d but producing just chunk j's
        lanes, so a row with one active chunk pays 1/n_chunks of the
        gather.  Writes go to chunk-width scratch (static lane extent —
        Mosaic can't store at a dynamic sublane index combined with a
        dynamic lane offset)."""
        lane_local = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1) \
            + j * 128

        def gather_s(s, _):
            shift = (s_hat - s).astype(DTYPE) * dval * DTYPE(slope_factor)
            i0 = jnp.floor(shift)
            t = shift - i0
            i0i = i0.astype(jnp.int32)
            start = i0i + PAD
            ceil_off = i0i + (t > 0).astype(jnp.int32)
            ok_row = jnp.logical_and(
                lane_local >= -i0i,
                lane_local <= (U - 1) - ceil_off)
            ok_row = jnp.logical_and(ok_row, s < S)
            valid_c_ref[pl.ds(s, 1), :] = ok_row.astype(DTYPE)
            rem = jax.lax.rem(start, 128)
            base = start - rem
            for c in range(C):
                win = epi_ref[0, c, pl.ds(s, 1),
                              pl.ds(pl.multiple_of(base + j * 128, 128),
                                    256)]
                row_a = pltpu.roll(win, -rem, axis=1)[:, :128]
                row_b = pltpu.roll(win, -(rem + 1), axis=1)[:, :128]
                blend = (DTYPE(1.0) - t) * row_a + t * row_b
                shear_c_ref[c, pl.ds(s, 1), :] = jnp.where(
                    t == 0, row_a, blend)
            return 0

        jax.lax.fori_loop(0, S_tot, gather_s, 0)

    @pl.when(jnp.logical_not(all_active))
    def _chunked():
        # argmax state lives in the OUTPUT refs so per-chunk updates
        # under pl.when are plain read-modify-writes.
        best_score_ref[0, :, :] = jnp.full((1, Ux), -1.0, DTYPE)
        score_sum_ref[0, :, :] = jnp.zeros((1, Ux), DTYPE)
        best_depth_ref[0, :, :] = jnp.zeros((1, Ux), DTYPE)
        rbar_ref[0, :, :] = jnp.zeros((C, Ux), DTYPE)
        if with_k_best:
            kbest_ref[0, :, :] = jnp.zeros((S_tot, Ux), DTYPE)

        def sweep_one_d(d, _):
            dval = dvec_ref[0, d]

            def ms_chunk(j, _):
                @pl.when(flags_ref[row0 + j] != 0)
                def _chunk():
                    gather_chunk(dval, j, shear_c_ref, valid_c_ref)
                    sl = pl.ds(pl.multiple_of(j * 128, 128), 128)
                    validf = valid_c_ref[:, :]           # [S_tot, 128]
                    shear = [shear_c_ref[c, :, :] for c in range(C)]
                    # r_bar init: the s_hat row via an s-iota select
                    # (exact — single nonzero term; Mosaic can't mix a
                    # dynamic sublane index with a dynamic lane slice).
                    at_hat = (jax.lax.broadcasted_iota(
                        jnp.int32, (S_tot, 1), 0) == s_hat).astype(DTYPE)
                    rbar0 = jnp.concatenate(
                        [jnp.sum(sh * at_hat, axis=0, keepdims=True)
                         for sh in shear], axis=0)       # [C, 128]
                    score, rbar_d, k_last = ms_score(shear, validf, False,
                                                     rbar0)

                    prev = best_score_ref[0, 0:1, sl]
                    better = score > prev
                    best_score_ref[0, 0:1, sl] = jnp.where(
                        better, score, prev)
                    prev_d = best_depth_ref[0, 0:1, sl]
                    best_depth_ref[0, 0:1, sl] = jnp.where(
                        better, dval, prev_d)
                    prev_r = rbar_ref[0, :, sl]
                    rbar_ref[0, :, sl] = jnp.where(better, rbar_d, prev_r)
                    if with_k_best:
                        prev_k = kbest_ref[0, :, sl]
                        kbest_ref[0, :, sl] = jnp.where(
                            better, k_last, prev_k)
                    score_sum_ref[0, 0:1, sl] = \
                        score_sum_ref[0, 0:1, sl] + score
                return 0

            jax.lax.fori_loop(0, n_chunks, ms_chunk, 0)
            return 0

        jax.lax.fori_loop(0, dim_d, sweep_one_d, 0)


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
      row_active: optional ``[V]`` (per-row) or ``[V, ceil(U/128)]``
        (per-chunk) bool/int; inactive rows skip the sweep entirely and
        inactive chunks skip the mean-shift/score (their outputs are
        garbage — callers must merge through an active-pixel mask,
        which the drivers do).
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

    # Candidate grid computed ON DEVICE with the exact expression (and
    # barriers) of the XLA path (sweep.py) and the per-pixel kernel, so
    # every engine produces bit-identical candidate VALUES per backend.
    # (A host-numpy grid is correctly-rounded where XLA's division is
    # reciprocal-based — one ulp apart on some grids, which would make
    # mixed-engine results inconsistent; see candidate_disparities for
    # the reference-bit-exact host version used by the oracle tests.)
    d_idx = jnp.arange(dim_d, dtype=DTYPE)
    rng_ = DTYPE(np.float32(np.float32(dmax) - np.float32(dmin)))
    num = jax.lax.optimization_barrier(d_idx * rng_)
    den = jax.lax.optimization_barrier(jnp.asarray(DTYPE(dim_d - 1)))
    dvec = (DTYPE(np.float32(dmin))
            + jax.lax.optimization_barrier(num / den))[None, :]
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

    n_chunks = Ux // 128
    if row_active is None:
        flags = jnp.ones((V, n_chunks), jnp.int32)
    else:
        flags = row_active.astype(jnp.int32)
        if flags.ndim == 1:
            flags = jnp.broadcast_to(flags[:, None], (V, n_chunks))
    row_any = flags.max(axis=1)
    flags = flags.reshape(-1)

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
                        pltpu.VMEM((S_tot, Ux), DTYPE),
                        pltpu.VMEM((C, S_tot, 128), DTYPE),
                        pltpu.VMEM((S_tot, 128), DTYPE)],
    )

    best_score, score_sum, best_depth, rbar, kbest = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        interpret=interpret,
    )(flags, make_fetch_remap(row_any), s_hat_arr, dvec, epi_pad)

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
