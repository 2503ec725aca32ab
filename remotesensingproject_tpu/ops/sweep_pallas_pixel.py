"""Pixel-compacted Pallas sweep: d-candidates on lanes, active pixels
on 128-lane blocks.

The dense row kernel (sweep_pallas.py) re-builds the sheared (s, u)
matrix for every (candidate, 128-lane chunk) — its per-pass cost is
~constant once activity is SPREAD (a few active pixels per chunk keep
every chunk alive), which is exactly the late-pass regime of the 2-D
propagation driver (claims scatter along EPI lines, leaving isolated
survivors).  This kernel instead puts the CANDIDATE axis on the 128
vector lanes and processes 8 COMPACTED active pixels per (S_tot, 1024)
tile, so one tile evaluates all dim_d candidates of 8 pixels at once
and per-pass cost scales with the ACTIVE PIXEL COUNT — the reference's
findNonZero sparsity (rslf_depth_computation_core.hpp:515-516), made
dense per tile.

Per row v (one grid step):
* the row's active u list is compacted ON THE SCALAR CORE while the
  EPI row DMA is in flight (the old wrapper-side argsort + inverse
  permutation cost ~190 ms/call at the bench shape);
* the EPI row is DMA'd to VMEM once (manual DMA — the auto pipeline
  re-issues per-step DMAs, see sweep_pallas.py);
* floor/frac/valid of the sheared positions I = (s_hat - s) * d_j *
  slope (identical decomposition and float32 ops as sweep_pallas.py,
  so samples and weights are bit-identical) are hoisted per row: they
  do not depend on u;
* per batch of 8 pixels: the per-lane gather runs with Mosaic's native
  take_along_axis within 128-lane groups of each pixel's window
  (the dynamic group range is clipped to both the candidate span AND
  the valid-sample window, so near-edge pixels skip up to half the
  reach), then the truncated mean shift + scoring on the
  (S_tot, 1024) tile — masked samples enter as +inf so the kernel
  weight collapses to +0 with no per-iteration mask multiply — then
  per-pixel lane reductions (first-max argmax over the d lanes);
  results land directly at their true u positions in the output row.

score_version="line" (k_best export) also rides this kernel: the
winning candidate's K(r - rbar) column is extracted with an MXU
one-hot contraction and stored per pixel into a (Upad, S) export
plane (``with_k_best=True``), so line mode keeps the
activity-proportional cost.
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
from .sweep_pallas import _round_up, gather_window, prepare_padded_epis

BATCH = 8  # pixels per tile (one 128-lane block each)


def _pixel_kernel(nact_ref, s_hat_ref, uval_ref, dvec_ref, act_ref,
                  *rest,
                  S: int, U: int, C: int, PAD: int, dim_d: int,
                  s_pad: int, slope_factor: float, h: float,
                  iters: int, n_grp: int, dmin: float, dmax: float,
                  per_pixel: bool, interpret: bool, kb: int = 1,
                  with_k: bool = False):
    rest = list(rest)
    if per_pixel:
        bmin_hbm, bmax_hbm = rest.pop(0), rest.pop(0)
    else:
        bmin_hbm = bmax_hbm = bmin_scr = bmax_scr = None
    epi_hbm_ref, out_hbm_ref = rest.pop(0), rest.pop(0)
    kb_hbm_ref = rest.pop(0) if with_k else None
    (epi_vmem, i0_scr, t_scr, co_scr, valid_scr,
     ga_scr, gb_scr, outb_ref, ulist_scr, act_scr) = rest[:10]
    rest = rest[10:]
    if per_pixel:
        bmin_scr, bmax_scr = rest.pop(0), rest.pop(0)
    kb_vmem = rest.pop(0) if with_k else None
    sem_in, sem_act, sem_out = rest
    i = pl.program_id(0)
    S_tot = S + s_pad
    W = BATCH * 128
    # dim_d > 128: each pixel owns kb 128-lane candidate blocks and the
    # tile carries PB = BATCH // kb pixels (the reference's [240] rows)
    PB = BATCH // kb
    CW = 128 * kb
    a = DTYPE(chan_scale(C) / (h * h))
    s_hat = s_hat_ref[0, 0]
    # sample-validity window in LOCAL u coordinates ([0, U-1] for a
    # whole row; the global image bounds for a u-haloed shard block —
    # can extend beyond the block into the materialized halo)
    u_lo = uval_ref[0, 0]
    u_hi = uval_ref[0, 1]
    n_act = nact_ref[i]

    @pl.when(n_act > 0)
    def _run():
        # ALL per-row inputs are DMA'd under the activity gate: an
        # auto-pipelined SMEM block costs ~0.25 ms per grid step even
        # when the body is skipped (measured: 540 skipped rows = 138 ms
        # — the old late-pass floor)
        cpa = pltpu.make_async_copy(act_ref.at[i], act_scr, sem_act)
        cpa.start()
        cp = pltpu.make_async_copy(epi_hbm_ref.at[i], epi_vmem, sem_in)
        cp.start()
        if per_pixel:
            cb1 = pltpu.make_async_copy(bmin_hbm.at[i], bmin_scr,
                                        sem_act)
            cb2 = pltpu.make_async_copy(bmax_hbm.at[i], bmax_scr,
                                        sem_act)
            cb1.start()
            cb2.start()
        cpa.wait()

        # scalar-core compaction of this row's active u list (replaces
        # the wrapper's argsort + inverse-permutation gathers — those
        # cost ~190 ms/call at the bench shape, the entire late-pass
        # sweep floor).  Runs while the EPI row DMA is in flight.
        def compact_body(u, cnt):
            is_a = act_scr[0, u] > 0

            @pl.when(is_a)
            def _():
                ulist_scr[0, cnt] = u
            return cnt + is_a.astype(jnp.int32)

        cnt = jax.lax.fori_loop(0, U, compact_body, jnp.int32(0))

        # dump column for tail-batch slots (Upad > U by construction):
        # their stores land off-image and are sliced off by the wrapper
        def dump_body(k, _):
            ulist_scr[0, k] = jnp.int32(U)
            return 0

        jax.lax.fori_loop(cnt, ((cnt + PB - 1) // PB) * PB,
                          dump_body, 0)
        if per_pixel:
            cb1.wait()
            cb2.wait()
        cp.wait()

        s_col = jax.lax.broadcasted_iota(jnp.int32, (S_tot, 1), 0)
        if not per_pixel:
            # ---- hoisted (u-independent) shear decomposition --------
            # d candidates tiled across the BATCH blocks
            dpad = dvec_ref[0:1, :]                        # (1, CW)
            drow0 = jnp.concatenate([dpad] * PB, axis=1) \
                if PB > 1 else dpad
            shift = (s_hat - s_col).astype(DTYPE) * drow0 \
                * DTYPE(slope_factor)                      # (S_tot, W)
            i0 = jnp.floor(shift)
            t_scr[:, :] = shift - i0
            i0_scr[:, :] = i0.astype(jnp.int32)
            co_scr[:, :] = i0_scr[:, :] \
                + (t_scr[:, :] > 0).astype(jnp.int32)

        lane_d = jax.lax.rem(
            jax.lax.broadcasted_iota(jnp.int32, (1, W), 1), CW)
        is_cand = lane_d < dim_d                           # (1, W)
        s_ok = s_col < S

        def span_bounds(d_lo, d_hi):
            # extreme floor(shift) over (s, d) is attained at a corner;
            # widened by one lane — conservative skipping only drops
            # certainly-untouched groups
            sh = []
            for ds_end in (s_hat, s_hat - (S_tot - 1)):
                for d_end in (d_lo, d_hi):
                    sh.append(jnp.floor(
                        ds_end.astype(DTYPE) * d_end
                        * DTYPE(slope_factor)).astype(jnp.int32))
            return (jnp.minimum(jnp.minimum(sh[0], sh[1]),
                                jnp.minimum(sh[2], sh[3])) - 1,
                    jnp.maximum(jnp.maximum(sh[0], sh[1]),
                                jnp.maximum(sh[2], sh[3])) + 1)

        if not per_pixel:
            sh_min, sh_max = span_bounds(DTYPE(np.float32(dmin)),
                                         DTYPE(np.float32(dmax)))

        lane_f = jax.lax.broadcasted_iota(
            jnp.int32, (1, CW), 1).astype(DTYPE)           # candidate k
        n_batches = pl.cdiv(n_act, PB)

        def batch_body(b, _):
            # ---- gather PB pixels' (s, d) radiance samples ----------
            dblk = []
            for p in range(PB):
                u_r = ulist_scr[0, b * PB + p]      # == U on tail slots
                u_p = jnp.minimum(u_r, U - 1)        # gather safety
                blk = pl.ds(p * CW, CW)
                if per_pixel:
                    # the pixel's own candidate grid, with the
                    # reference's float op order (core.hpp:548) and the
                    # interpret-mode barriers of the dense pp kernel
                    bmin_p = bmin_scr[0, u_p]
                    rng_p = bmax_scr[0, u_p] - bmin_p
                    if interpret:
                        dnum = jax.lax.optimization_barrier(
                            lane_f * rng_p)
                        dden = jax.lax.optimization_barrier(
                            jnp.full((1, 1), DTYPE(dim_d - 1), DTYPE))
                        delta = bmin_p + jax.lax.optimization_barrier(
                            dnum / dden)
                    else:
                        delta = bmin_p + (lane_f * rng_p) / DTYPE(
                            dim_d - 1)                     # (1, CW)
                    shift_b = (s_hat - s_col).astype(DTYPE) * delta \
                        * DTYPE(slope_factor)              # (S_tot, CW)
                    i0f = jnp.floor(shift_b)
                    tb = shift_b - i0f
                    i0b = i0f.astype(jnp.int32)
                    i0_scr[:, blk] = i0b
                    t_scr[:, blk] = tb
                    co_scr[:, blk] = i0b + (tb > 0).astype(jnp.int32)
                else:
                    delta = dvec_ref[0:1, :]
                    i0b = i0_scr[:, blk]
                dblk.append(delta)
                base = u_p - jax.lax.rem(u_p, 128)
                for c in range(C):
                    ga_scr[c, :, blk] = jnp.zeros((S_tot, CW), DTYPE)
                    gb_scr[c, :, blk] = jnp.zeros((S_tot, CW), DTYPE)
                # dynamic fori over EXACTLY the touched 128-lane groups
                # of each candidate sub-block (g*128 <= idx_hi and
                # idx_lo < (g+1)*128 is an interval condition, so the
                # active set is the contiguous range
                # [idx_lo // 128, idx_hi // 128]).  A Python-unrolled
                # n_grp loop compiles one branch body per (pixel,
                # group): measured on the v5e, that structural size is
                # what the platform's deferred first-activation compile
                # pays for — the unrolled level-0 kernel cost 100-280 s
                # of ONE-TIME compile at first real execution vs ~4 s
                # for the structurally smaller coarse-level kernels.
                for q in range(kb):
                    lo_l, hi_l = q * 128, min(dim_d - 1, q * 128 + 127)
                    if per_pixel:
                        # this sub-block's candidate range, widened by
                        # one grid step so the static-fraction formula
                        # covers the device-computed lane values
                        f_lo = DTYPE(max(0.0, (lo_l - 1.0))
                                     / (dim_d - 1))
                        f_hi = DTYPE(min(float(dim_d - 1), hi_l + 1.0)
                                     / (dim_d - 1))
                        s_lo, s_hi = span_bounds(bmin_p + rng_p * f_lo,
                                                 bmin_p + rng_p * f_hi)
                    elif kb == 1:
                        s_lo, s_hi = sh_min, sh_max
                    else:
                        step = (np.float32(dmax) - np.float32(dmin)) \
                            / max(1, dim_d - 1)
                        s_lo, s_hi = span_bounds(
                            DTYPE(np.float32(dmin) + (lo_l - 1) * step),
                            DTYPE(np.float32(dmin) + (hi_l + 1) * step))
                    sblk = pl.ds(p * CW + q * 128, 128)
                    # clip the sheared reach to the VALID sample window
                    # [PAD + u_lo, PAD + u_hi + 1] (floor >= u_lo, ceil
                    # <= u_hi in local coords): samples outside are
                    # masked by validf, so skipping their groups is
                    # bitwise-free — for near-edge pixels this drops up
                    # to half the reach
                    abs_lo = jnp.maximum(s_lo + (u_p + PAD),
                                         PAD + u_lo)
                    abs_hi = jnp.minimum(s_hi + (u_p + PAD) + 1,
                                         PAD + u_hi + 1)
                    g_lo = jnp.maximum(jnp.int32(0),
                                       (abs_lo - base) // 128)
                    g_hi = jnp.minimum(jnp.int32(n_grp - 1),
                                       (abs_hi - base) // 128)
                    off_s = u_p + PAD - base

                    def grp_body(g, _, sblk=sblk, base=base,
                                 off_s=off_s):
                        rel = i0_scr[:, sblk] + (off_s - g * 128)
                        relb = rel + 1
                        in_a = (rel >= 0) & (rel < 128)
                        in_b = (relb >= 0) & (relb < 128)
                        rc = jnp.clip(rel, 0, 127)
                        rbc = jnp.clip(relb, 0, 127)
                        # per-channel gather from the same window (the
                        # shear geometry is channel-independent)
                        for c in range(C):
                            src = epi_vmem[c, :,
                                           pl.ds(pl.multiple_of(
                                               base + g * 128, 128),
                                               128)]
                            va = jnp.take_along_axis(src, rc, axis=1)
                            vb = jnp.take_along_axis(src, rbc, axis=1)
                            ga_scr[c, :, sblk] = jnp.where(
                                in_a, va, ga_scr[c, :, sblk])
                            gb_scr[c, :, sblk] = jnp.where(
                                in_b, vb, gb_scr[c, :, sblk])
                        return 0

                    jax.lax.fori_loop(g_lo, g_hi + 1, grp_body, 0)
                # validity: floor >= u_lo and ceil <= u_hi at this
                # pixel (u_lo/u_hi default to the 0 / U-1 image edges)
                ok = (u_p + i0b >= u_lo) \
                    & (u_p + co_scr[:, blk] <= u_hi) & s_ok
                cand_b = is_cand[:, p * CW:(p + 1) * CW]
                valid_scr[:, blk] = (ok & cand_b).astype(DTYPE)

            t_ = t_scr[:, :]
            validf = valid_scr[:, :]
            at_hat = (s_col == s_hat).astype(DTYPE)
            r0 = []     # per-channel masked radiance (S_tot, W)
            rpos = []
            rbar0 = []  # per-channel init: the s_hat row (shift = 0)
            for c in range(C):
                row_a = ga_scr[c, :, :]
                shear_c = jnp.where(t_ == 0, row_a,
                                    (DTYPE(1.0) - t_) * row_a
                                    + t_ * gb_scr[c, :, :])
                r0_c = shear_c * validf
                r0.append(r0_c)
                rpos.append(jnp.maximum(r0_c, 0.0))
                rbar0.append(jnp.sum(r0_c * at_hat, axis=0,
                                     keepdims=True))
            card = jnp.sum(validf, axis=0, keepdims=True)

            # ---- truncated mean shift on (S_tot, W) ----------------
            # K(r - r_bar) = max(1 - a * sum_c diff_c^2, 0): the channel
            # sum generalizes the 1-ch x3 scaling (chan_scale in `a`;
            # src/rslf_kernels.cpp:40-54 for the 3-ch reduce).
            #
            # Masked samples enter the iteration as +inf, so the kernel
            # weight collapses to +0 arithmetically (max(-inf, 0)) —
            # BITWISE identical to the * validf of the jnp oracle while
            # saving one (S_tot, W) multiply per iteration; r_pos is 0
            # at masked lanes, so inf never reaches the numerator.
            #
            # (A bfloat16 fast path was implemented and MEASURED SLOWER
            # on the v5e — its VPU has no native bf16 elementwise rate
            # advantage and even bf16 vector compares fail to lower, so
            # every op pays conversions.  DepthParams.fast instead caps
            # the mean-shift iterations — see the wrapper.)
            rf = [jnp.where(validf > 0, r0[c], DTYPE(jnp.inf))
                  for c in range(C)]

            def ms_iter(rbar_t):
                dsq = None
                for c in range(C):
                    diff = rf[c] - rbar_t[c]
                    dsq = diff * diff if dsq is None \
                        else dsq + diff * diff
                k = jnp.maximum(1.0 - a * dsq, 0.0)
                sum_k = jnp.sum(k, axis=0, keepdims=True)
                new_rbar = tuple(
                    jnp.where(sum_k > 0,
                              jnp.sum(rpos[c] * k, axis=0,
                                      keepdims=True) / sum_k, 0.0)
                    for c in range(C))
                return new_rbar, k

            def ms_cond(st):
                it, _rb, _k, done = st
                return jnp.logical_and(it < iters,
                                       jnp.logical_not(done))

            def ms_step(st):
                it, rb, k, _ = st
                nrb, nk = ms_iter(rb)
                same = jnp.array(True)
                for c in range(C):
                    same = jnp.logical_and(same,
                                           jnp.all(nrb[c] == rb[c]))
                return it + 1, nrb, nk, same

            k0 = jnp.zeros((S_tot, W), DTYPE)
            _, rbar_d, k_last, _ = jax.lax.while_loop(
                ms_cond, ms_step,
                (jnp.int32(0), tuple(rbar0), k0, False))

            sum_k = jnp.sum(k_last, axis=0, keepdims=True)
            score = jnp.where(card > 0, sum_k / card, 0.0)  # (1, W)
            score = jnp.where(is_cand, score, -1.0)

            # ---- per-pixel lane reductions -> SMEM compact slots ----
            lane128 = jax.lax.broadcasted_iota(jnp.int32, (1, CW), 1)
            for p in range(PB):
                lo, hi = p * CW, (p + 1) * CW
                sc = score[0:1, lo:hi]                      # (1, CW)
                best = jnp.max(sc)
                # FIRST max over the d lanes (reference argmax order)
                bidx = jnp.min(jnp.where(sc == best, lane128,
                                         jnp.int32(2 ** 30)))
                ssum = jnp.sum(jnp.where(is_cand[0:1, lo:hi], sc, 0.0))
                onehot = (lane128 == bidx).astype(DTYPE)
                dbest = jnp.sum(dblk[p] * onehot)
                # results land at the TRUE u position (no inverse
                # permutation outside); tail slots write the dump
                # column u == U (sliced off by the wrapper)
                u_w = ulist_scr[0, b * PB + p]
                outb_ref[0, u_w] = best
                outb_ref[1, u_w] = ssum
                outb_ref[2, u_w] = dbest
                for c in range(C):
                    outb_ref[3 + c, u_w] = jnp.sum(
                        rbar_d[c][0:1, lo:hi] * onehot)
                if with_k:
                    # K(r - rbar) column at the winning candidate (the
                    # line-confidence export, core.hpp:645-651): an
                    # MXU one-hot contraction over the d lanes — exact
                    # (0/1 weights, single non-zero per row) — lands
                    # the column as a (1, S_tot) ROW, stored at
                    # sublane u_w of the (Upad, S) export plane
                    kcol = jax.lax.dot_general(
                        onehot, k_last[:, lo:hi],
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=DTYPE)   # (1, S_tot)
                    kb_vmem[pl.ds(u_w, 1), 0:S_tot] = kcol
            return 0

        jax.lax.fori_loop(0, n_batches, batch_body, 0)
        co = pltpu.make_async_copy(outb_ref, out_hbm_ref.at[i], sem_out)
        co.start()
        co.wait()
        if with_k:
            ck = pltpu.make_async_copy(kb_vmem, kb_hbm_ref.at[i],
                                       sem_out)
            ck.start()
            ck.wait()


def sweep_pile_pallas_pixel(epis_v_s_u_c, dmin: float, dmax: float,
                            dim_d: int, s_hat, params: DepthParams,
                            active_v_u=None, padded=None,
                            interpret: bool = False,
                            dmin_v_u=None, dmax_v_u=None,
                            with_k_best: bool = False,
                            u_valid=None,
                            _force_kb=None) -> SweepResult:
    """Pixel-compacted sweep (C in (1, 3)).

    RGB (C == 3) gathers each channel from the same sheared window and
    runs the mean shift with the channel-summed bandwidth kernel
    (src/rslf_kernels.cpp:40-54) — the per-pass cost still scales with
    the active pixel count, covering the reference's costliest headline
    config (RGB MansionLR, report/rs_report.tex:427).

    ``active_v_u``: [V, U] bool — pixels to sweep (required; the point
    of this kernel).  Outputs at inactive pixels are garbage, exactly
    like the dense kernel's inactive chunks.

    ``u_valid``: optional (lo, hi) sample-validity window in LOCAL u
    coordinates overriding the (0, U - 1) image edges — the u-sharded
    driver passes the GLOBAL image bounds so samples materialized in a
    shard's u-halo count as valid exactly like the unsharded operator
    (ops.sweep's u_valid analog; parallel/sharding2d.py).

    ``with_k_best``: export the winning candidate's K(r - rbar) column
    (the line-confidence input, core.hpp:645-651) — an MXU one-hot
    contraction per pixel into a per-row (Upad, S) plane, so
    score_version="line" rides THIS kernel's activity-proportional
    cost instead of the dense-row kernel.  k_best at inactive pixels
    is garbage (stale scratch), exactly like the other outputs.

    ``dmin_v_u``/``dmax_v_u``: optional [V, U] PER-PIXEL grid bounds
    (the bounds-edited pyramid levels, rslf_fine_to_coarse.hpp:202-294)
    — each pixel then sweeps ITS OWN candidate grid, the reference's
    exact semantics (no tile quantization needed: the gather is
    per-lane anyway).  dmin/dmax remain the static ctor constants that
    bound every per-pixel value (they size the pad and the windows).
    """
    if params.interpolation != "linear":
        raise NotImplementedError("linear interpolation only")
    V, S, U, C = epis_v_s_u_c.shape
    if C not in (1, 3):
        raise NotImplementedError("pixel kernel supports C in (1, 3)")
    if padded is None:
        padded = prepare_padded_epis(epis_v_s_u_c, dmin, dmax,
                                     params.slope_factor)
    epi_pad, PAD, s_pad = padded
    S_tot = S + s_pad
    U_tot = epi_pad.shape[-1]
    # row capacity: > U so column U can serve as the tail-slot dump
    Upad = _round_up(U + 1, BATCH * 16)

    if active_v_u is None:
        active_v_u = jnp.ones((V, U), bool)

    # the kernel compacts each row's active u list on the scalar core
    # (the old wrapper-side argsort + inverse-permutation gathers cost
    # ~190 ms/call at the bench shape — the whole late-pass floor)
    n_act = jnp.sum(active_v_u, axis=1).astype(jnp.int32)  # [V]
    act = jnp.pad(active_v_u.astype(jnp.int32),
                  ((0, 0), (0, Upad - U)))[:, None, :]

    d_idx = jnp.arange(dim_d, dtype=DTYPE)
    rng_ = DTYPE(np.float32(np.float32(dmax) - np.float32(dmin)))
    num = jax.lax.optimization_barrier(d_idx * rng_)
    den = jax.lax.optimization_barrier(jnp.asarray(DTYPE(dim_d - 1)))
    dvec = (DTYPE(np.float32(dmin))
            + jax.lax.optimization_barrier(num / den))[None, :]
    s_hat_arr = jnp.asarray(s_hat, jnp.int32).reshape(1, 1)
    if u_valid is None:
        u_valid = (0, U - 1)
    uval_arr = jnp.stack([jnp.asarray(u_valid[0], jnp.int32),
                          jnp.asarray(u_valid[1], jnp.int32)]
                         ).reshape(1, 2)

    # dim_d > 128: kb 128-lane candidate blocks per pixel, BATCH // kb
    # pixels per tile (serves the reference's [240] configs on the
    # fast path; kb must divide BATCH, so dim_d <= 1024)
    kb = -(-dim_d // 128) if _force_kb is None else _force_kb
    if kb > BATCH:
        raise NotImplementedError("dim_d > 1024")
    while BATCH % kb:
        kb += 1
    dvec = jnp.pad(dvec, ((0, 0), (0, kb * 128 - dim_d)))
    per_pixel = dmin_v_u is not None
    n_grp = gather_window(PAD)
    # fast mode: cap the truncated mean shift at 5 iterations (the
    # reference's fixed 10, core.hpp:16; convergence typically lands
    # at ~6) — quality-gated via the REF_ANCHOR margin, not bit-exact
    iters = params.mean_shift_max_iter
    if getattr(params, "fast", False):
        iters = min(iters, 5)
    kernel = functools.partial(
        _pixel_kernel, S=S, U=U, C=C, PAD=PAD, dim_d=dim_d, s_pad=s_pad,
        slope_factor=params.slope_factor, h=params.kernel_h,
        iters=iters, n_grp=n_grp,
        dmin=dmin, dmax=dmax, per_pixel=per_pixel, interpret=interpret,
        kb=kb, with_k=with_k_best)

    W = BATCH * 128
    in_specs = [
        pl.BlockSpec((1, 1), lambda i, n: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 2), lambda i, n: (0, 0),
                     memory_space=pltpu.SMEM),         # u_valid window
        pl.BlockSpec((1, 128 * kb), lambda i, n: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),  # act rows
    ]
    operands = [s_hat_arr, uval_arr, dvec, act]
    if per_pixel:
        def padb(x):
            return jnp.pad(x.astype(DTYPE),
                           ((0, 0), (0, Upad - U)))[:, None, :]
        bspec = pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY)
        in_specs += [bspec, bspec]
        operands += [padb(dmin_v_u), padb(dmax_v_u)]
    in_specs.append(pl.BlockSpec(memory_space=pltpu.ANY))  # epi volume
    operands.append(epi_pad)
    SL = _round_up(S_tot, 128)       # k_best export lane width
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,                     # n_act
        grid=(V,),
        in_specs=in_specs,
        out_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * \
            (2 if with_k_best else 1),
        scratch_shapes=[
            pltpu.VMEM((C, S_tot, U_tot), DTYPE),     # epi row
            pltpu.VMEM((S_tot, W), jnp.int32),        # i0
            pltpu.VMEM((S_tot, W), DTYPE),            # t
            pltpu.VMEM((S_tot, W), jnp.int32),        # ceil offset
            pltpu.VMEM((S_tot, W), DTYPE),            # valid
            pltpu.VMEM((C, S_tot, W), DTYPE),         # gather a
            pltpu.VMEM((C, S_tot, W), DTYPE),         # gather b
            # field axis padded to the sublane tiling: a (6, Upad)
            # DMA slice of the C=3 output trips Mosaic's "slice must be
            # aligned to tiling (8)" check (4 divides 8, 6 does not)
            pltpu.SMEM((_round_up(3 + C, 4), Upad), DTYPE),  # out row
            pltpu.SMEM((1, Upad), jnp.int32),         # compacted u list
            pltpu.SMEM((1, Upad), jnp.int32),         # active-mask row
        ] + ([pltpu.SMEM((1, Upad), DTYPE)] * 2 if per_pixel else [])
        + ([pltpu.VMEM((Upad, SL), DTYPE)] if with_k_best else []) + [
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )

    out_shapes = [jax.ShapeDtypeStruct((V, _round_up(3 + C, 4), Upad),
                                       DTYPE)]
    if with_k_best:
        out_shapes.append(jax.ShapeDtypeStruct((V, Upad, SL), DTYPE))
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        interpret=interpret,
    )(n_act, *operands)
    out = outs[0]

    def back(r):
        return out[:, r, :U]

    if with_k_best:
        # [V, Upad(u), SL(s)] -> [V, S, U]
        k_best = jnp.transpose(outs[1][:, :U, :S], (0, 2, 1))
    else:
        k_best = jnp.zeros((V, S, U), DTYPE)
    return SweepResult(
        best_score=back(0),
        score_mean=back(1) / DTYPE(dim_d),
        best_depth=back(2),
        rbar=jnp.stack([back(3 + c) for c in range(C)], axis=-1),
        k_best=k_best,
    )
