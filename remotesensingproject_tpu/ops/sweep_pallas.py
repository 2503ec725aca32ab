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


def gather_window(pad: int):
    """Number of 128-lane groups the per-lane gather can touch: with the
    chunk window based at j*128, sample indices span
    [2, 2*PAD + 126] (+1 for the blend's ceil sample)."""
    return _round_up(2 * pad + 127, 128) // 128


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


def _sweep_kernel(flags_ref, s_hat_ref, dvec_ref, epi_hbm_ref,
                  out_hbm_ref, kbest_hbm_ref,
                  epi_vmem, outbuf_ref, kbest_ref,
                  shear_c_ref, valid_c_ref, ga_ref, gb_ref,
                  sem_in, sem_out, *,
                  S: int, U: int, Ux: int, C: int, PAD: int, dim_d: int,
                  s_pad: int, slope_factor: float, h: float,
                  iters: int, with_k_best: bool, n_grp: int):
    """One EPI row: full (d, mean-shift) sweep.  See module docstring.

    ``Ux`` is the 128-aligned compute width (>= U); surplus lanes compute
    garbage that the wrapper slices off — all lane ops are element-wise so
    they never contaminate real lanes.

    The EPI volume and the outputs live in ANY/HBM memory space with
    MANUAL per-row DMA under the activity gate: the automatic block
    pipeline re-issues its DMAs every grid step even when the (data-
    dependent) block index is unchanged, which put a ~140 ms floor on a
    540-row pass with nothing to do (~0.26 ms per no-op step, measured
    on v5e).  With manual DMA a skipped row costs nothing.

    The kernel is NaN-free: the EPI is ZERO-padded and sample validity is
    the interval  -floor(shift) <= u <= U-1-ceil(shift)  (the reference's
    interpolation rule, rslf_interpolation.hpp:182, specialised to a
    per-(s,d) scalar shift), evaluated as lane-iota compares.
    """
    # Activity skipping at two granularities (the dense analog of the
    # reference's findNonZero sparsity, core.hpp:515-516): rows whose
    # 128-lane chunks are ALL inactive skip everything; within an active
    # row, the gather runs per active chunk in the chunk-gated path.
    # The merge in the driver never reads inactive pixels' outputs.
    i = pl.program_id(0)
    n_chunks = Ux // 128
    any_chunk = flags_ref[i * n_chunks]
    for j in range(1, n_chunks):
        any_chunk = any_chunk | flags_ref[i * n_chunks + j]
    run_row = any_chunk != 0

    @pl.when(run_row)
    def _run():
        copy_in = pltpu.make_async_copy(epi_hbm_ref.at[i], epi_vmem,
                                        sem_in)
        copy_in.start()
        copy_in.wait()
        _sweep_row_body(i, flags_ref, s_hat_ref, dvec_ref, epi_vmem,
                        outbuf_ref, kbest_ref,
                        shear_c_ref, valid_c_ref, ga_ref, gb_ref,
                        S=S, U=U, Ux=Ux,
                        C=C, PAD=PAD, dim_d=dim_d, s_pad=s_pad,
                        slope_factor=slope_factor, h=h, iters=iters,
                        with_k_best=with_k_best, n_grp=n_grp)
        copy_out = pltpu.make_async_copy(outbuf_ref, out_hbm_ref.at[i],
                                         sem_out)
        copy_out.start()
        if with_k_best:
            copy_kb = pltpu.make_async_copy(kbest_ref,
                                            kbest_hbm_ref.at[i], sem_in)
            copy_kb.start()
            copy_kb.wait()
        copy_out.wait()


def _sweep_row_body(i, flags_ref, s_hat_ref, dvec_ref, epi_ref,
                    outbuf_ref, kbest_ref,
                    shear_c_ref, valid_c_ref, ga_ref, gb_ref, *,
                    S: int, U: int, Ux: int, C: int, PAD: int,
                    dim_d: int, s_pad: int, slope_factor: float,
                    h: float, iters: int, with_k_best: bool,
                    n_grp: int):
    # outbuf rows: 0 best_score, 1 score_sum, 2 best_depth, 3:3+C rbar
    s_hat = s_hat_ref[0, 0]
    a = DTYPE(chan_scale(C) / (h * h))
    S_tot = S + s_pad
    n_chunks = Ux // 128
    row0 = i * n_chunks
    n_blk = S_tot // 8
    sub8 = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)

    def gather_chunk(dval, j):
        """Sheared gather of one 128-lane chunk for candidate d.

        For chunk j the window is based at lane j*128 of the padded EPI
        (the left pad is PAD >= max |shift| + 2), so every sample index
        idx = floor(shift) + PAD + lane lies in (0, 2*PAD + 127).  The
        window is processed in 128-lane GROUPS with Mosaic's native
        per-lane dynamic gather (take_along_axis within one vreg
        group — wider gathers don't lower); groups the [idx_lo, idx_hi]
        interval of this (d, chunk) cannot touch are skipped with a
        scalar branch, so the cost scales with |d|*slope*S instead of
        the worst case.  All per-s arithmetic is (S_tot, 1)-vectorized.
        """
        lane = jax.lax.broadcasted_iota(jnp.int32, (S_tot, 128), 1)
        lane_g = lane + j * 128                      # global u
        s_col = jax.lax.broadcasted_iota(jnp.int32, (S_tot, 1), 0)
        slope_c = DTYPE(slope_factor)
        shift = (s_hat - s_col).astype(DTYPE) * dval * slope_c
        i0 = jnp.floor(shift)                        # (S_tot, 1)
        t = shift - i0
        i0i = i0.astype(jnp.int32)
        idx = i0i + PAD + lane                       # (S_tot, 128)

        # validity interval: floor(u+shift) >= 0 and
        # ceil(u+shift) <= U-1  (ceil = i0i + (t > 0))
        ceil_off = i0i + (t > 0).astype(jnp.int32)
        ok = (lane_g >= -i0i) & (lane_g <= (U - 1) - ceil_off) \
            & (s_col < S)
        valid_c_ref[:, :] = ok.astype(DTYPE)

        # scalar index bounds from the monotonic shift endpoints
        sh_a = jnp.floor(s_hat.astype(DTYPE) * dval * slope_c
                         ).astype(jnp.int32)
        sh_b = jnp.floor((s_hat - (S_tot - 1)).astype(DTYPE)
                         * dval * slope_c).astype(jnp.int32)
        idx_lo = jnp.minimum(sh_a, sh_b) + PAD
        idx_hi = jnp.maximum(sh_a, sh_b) + PAD + 128  # +127 lanes +1

        for c in range(C):
            ga_ref[c, :, :] = jnp.zeros((S_tot, 128), DTYPE)
            gb_ref[c, :, :] = jnp.zeros((S_tot, 128), DTYPE)
        base = pl.multiple_of(j * 128, 128)
        for g in range(n_grp):
            @pl.when(jnp.logical_and(idx_hi >= g * 128,
                                     idx_lo < (g + 1) * 128))
            def _group(g=g):
                rel = idx - g * 128
                relb = rel + 1
                in_a = (rel >= 0) & (rel < 128)
                in_b = (relb >= 0) & (relb < 128)
                rel_c = jnp.clip(rel, 0, 127)
                relb_c = jnp.clip(relb, 0, 127)
                for c in range(C):
                    srcg = epi_ref[c, :, pl.ds(base + g * 128, 128)]
                    va = jnp.take_along_axis(srcg, rel_c, axis=1)
                    vb = jnp.take_along_axis(srcg, relb_c, axis=1)
                    ga_ref[c, :, :] = jnp.where(in_a, va,
                                                ga_ref[c, :, :])
                    gb_ref[c, :, :] = jnp.where(in_b, vb,
                                                gb_ref[c, :, :])
        for c in range(C):
            row_a = ga_ref[c, :, :]
            blend = (DTYPE(1.0) - t) * row_a + t * gb_ref[c, :, :]
            shear_c_ref[c, :, :] = jnp.where(t == 0, row_a, blend)

    def ms_score(shear, validf, rbar0):
        """Mean shift + score on a [S_tot, 128] tile, with an exact
        early exit: iterations after the fixpoint reproduce K, the sums
        and r_bar, so stopping there is bit-identical to the reference's
        fixed count (core.hpp:566-610)."""
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

        def ms_cond(state):
            it, _rb, _k, done = state
            return jnp.logical_and(it < iters, jnp.logical_not(done))

        def ms_step(state):
            it, rb, k, _done = state
            new_rb, new_k = ms_iter((rb, k))
            done = jnp.all(new_rb == rb)
            return it + 1, new_rb, new_k, done

        _, rbar_d, k_last, _ = jax.lax.while_loop(
            ms_cond, ms_step, (jnp.int32(0), rbar0, k0, False))

        # score from the LAST iteration's kernel values (core.hpp:612-622)
        sum_k = jnp.sum(k_last, axis=0, keepdims=True)
        score = jnp.where(card > 0, sum_k / card, 0.0)
        return score, rbar_d, k_last

    # chunk-gated sweep: claimed 128-lane chunks cost nothing — the
    # dense analog of the reference's findNonZero sparsity
    # (core.hpp:515-516).  Argmax state lives in the outbuf scratch so
    # per-chunk updates under pl.when are plain read-modify-writes.
    outbuf_ref[0:1, :] = jnp.full((1, Ux), -1.0, DTYPE)
    outbuf_ref[1:2, :] = jnp.zeros((1, Ux), DTYPE)
    outbuf_ref[2:3, :] = jnp.zeros((1, Ux), DTYPE)
    outbuf_ref[3:3 + C, :] = jnp.zeros((C, Ux), DTYPE)
    if with_k_best:
        kbest_ref[:, :] = jnp.zeros((S_tot, Ux), DTYPE)

    def sweep_one_d(d, _):
        dval = dvec_ref[0, d]

        def ms_chunk(j, _):
            @pl.when(flags_ref[row0 + j] != 0)
            def _chunk():
                gather_chunk(dval, j)
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
                score, rbar_d, k_last = ms_score(shear, validf, rbar0)

                prev = outbuf_ref[0:1, sl]
                better = score > prev
                outbuf_ref[0:1, sl] = jnp.where(
                    better, score, prev)
                prev_d = outbuf_ref[2:3, sl]
                outbuf_ref[2:3, sl] = jnp.where(
                    better, dval, prev_d)
                prev_r = outbuf_ref[3:3 + C, sl]
                outbuf_ref[3:3 + C, sl] = jnp.where(
                    better, rbar_d, prev_r)
                if with_k_best:
                    prev_k = kbest_ref[:, sl]
                    kbest_ref[:, sl] = jnp.where(
                        better, k_last, prev_k)
                outbuf_ref[1:2, sl] = outbuf_ref[1:2, sl] + score
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
    # gather windows reach up to (n_chunks-1)*128 + n_grp*128 lanes
    right_needed = (Ux - 128) + 128 * gather_window(pad_f) - (pad_f + U) \
        + 256
    right_needed = max(right_needed, pad_f + 256)
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
        iters=params.mean_shift_max_iter, with_k_best=with_k_best,
        n_grp=gather_window(PAD))

    kb_S = S_tot if with_k_best else 8
    kb_U = Ux if with_k_best else 128
    R = 3 + C  # combined row block: score, score_sum, depth, rbar[C]
    # EPI and outputs live in ANY memory space with MANUAL per-row DMA
    # inside the kernel (active rows only) — the automatic block
    # pipeline re-issues DMAs every grid step even for unchanged data-
    # dependent block indices (~0.26 ms per no-op step at these sizes),
    # which dominated late passes.  Inactive rows' output rows keep
    # uninitialized garbage, which the drivers merge out through the
    # active-pixel mask.
    out_shapes = [
        jax.ShapeDtypeStruct((V, R, Ux), DTYPE),       # combined
        jax.ShapeDtypeStruct((V, kb_S, kb_U), DTYPE),  # kbest
    ]
    out_specs = [
        pl.BlockSpec(memory_space=pltpu.ANY),
        pl.BlockSpec(memory_space=pltpu.ANY),
    ]

    n_chunks = Ux // 128
    if row_active is None:
        flags = jnp.ones((V, n_chunks), jnp.int32)
    else:
        flags = row_active.astype(jnp.int32)
        if flags.ndim == 1:
            flags = jnp.broadcast_to(flags[:, None], (V, n_chunks))
    flags = flags.reshape(-1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(V,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i, f: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, dim_d), lambda i, f: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=out_specs,
        scratch_shapes=[pltpu.VMEM((C, S_tot, U_tot), DTYPE),  # epi
                        pltpu.VMEM((R, Ux), DTYPE),            # outbuf
                        pltpu.VMEM((kb_S, kb_U), DTYPE),       # kbest
                        pltpu.VMEM((C, S_tot, 128), DTYPE),    # shear
                        pltpu.VMEM((S_tot, 128), DTYPE),       # valid
                        pltpu.VMEM((C, S_tot, 128), DTYPE),    # gather a
                        pltpu.VMEM((C, S_tot, 128), DTYPE),    # gather b
                        pltpu.SemaphoreType.DMA,
                        pltpu.SemaphoreType.DMA],
    )

    out, kbest = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        interpret=interpret,
    )(flags, s_hat_arr, dvec, epi_pad)

    if with_k_best:
        k_best = kbest[:, :S, :U]
    else:
        k_best = jnp.zeros((V, S, U), DTYPE)

    return SweepResult(
        best_score=out[:, 0, :U],
        score_mean=out[:, 1, :U] / DTYPE(dim_d),
        best_depth=out[:, 2, :U],
        rbar=out[:, 3:3 + C, :U].transpose(0, 2, 1),
        k_best=k_best,
    )
