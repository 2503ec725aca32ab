"""Pallas TPU kernel for the slope sweep with PER-PIXEL disparity bounds.

The coarse pyramid levels refine each pixel's [dmin, dmax] from its
confident parents (rslf_fine_to_coarse.hpp:202-294), so the candidate
disparity — and hence the sheared sample index — varies per pixel and the
uniform-shift kernel (sweep_pallas.py) does not apply.  TPUs have no
per-lane vector gather, so this kernel works on 128-lane u-tiles and
resolves the gather with a window scan VECTORIZED OVER s: for one
candidate index k_d, the integer sample positions of all (s, lane) pairs
span a window [w0, w0 + kcount); scanning k over that window, reading the
aligned row block E[:, w0+k : w0+k+TU] (one dynamic slice + lane rotate
for ALL s at once) and selecting it into the (s, lane) pairs whose
floor-position matches, costs O(kcount) vector ops on [S, TU] tiles.
kcount is bounded by the padded window (no data-dependent blowup), and
the per-iteration work is S-tall — two orders of magnitude fewer loop
iterations than a per-s scalar scan, which is what makes this kernel
launch-watchdog-safe at production sizes.

Numerics: this kernel computes the sample position I = (s_hat - s) *
delta_u * slope + u PER LANE in float32, matching the reference's
per-pixel rounding exactly (core.hpp:534-552), unlike the uniform kernel
which shares a scalar shift per (s, d).  Everything else (mean shift,
scoring, argmax) mirrors sweep_pallas.py.
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
from .sweep_pallas import (_round_up, make_fetch_remap,
                           prepare_padded_epis)


def _sweep_pp_kernel(flags_ref, s_hat_ref, bounds_hbm_ref, epi_hbm_ref,
                     out_hbm_ref, kbest_hbm_ref,
                     epi_vmem, bounds_vmem, outbuf_ref, kbest_buf,
                     shear_scr, reb_scr, cur_row_ref, sem_in, sem_out,
                     *, S: int, U: int, C: int, PAD: int, dim_d: int,
                     s_pad: int, slope_factor: float, h: float,
                     iters: int, with_k_best: bool, U_tot: int,
                     masked: bool, interpret: bool):
    """One (v, u-tile) cell: per-pixel-bounds sweep on 128 lanes.

    The EPI volume, the stacked bounds planes and the outputs live in
    ANY/HBM memory space with MANUAL DMA under the activity gate (the
    automatic block pipeline re-issues DMAs every grid step even for
    unchanged data-dependent indices — ~0.26 ms per no-op step).  The
    EPI row is fetched once per ACTIVE row, tracked across the
    sequential grid with an SMEM cursor.
    """
    i = pl.program_id(0)
    j = pl.program_id(1)
    n_tiles = pl.num_programs(1)
    run_tile = flags_ref[i * n_tiles + j] != 0

    @pl.when(jnp.logical_and(i == 0, j == 0))
    def _init():
        cur_row_ref[0] = -1

    @pl.when(run_tile)
    def _run():
        @pl.when(cur_row_ref[0] != i)
        def _fetch_row():
            cp = pltpu.make_async_copy(epi_hbm_ref.at[i], epi_vmem,
                                       sem_in)
            cp.start()
            cp.wait()
            cur_row_ref[0] = i

        TU = 128
        cb = pltpu.make_async_copy(
            bounds_hbm_ref.at[i, :, pl.ds(j * TU, TU)], bounds_vmem,
            sem_in)
        cb.start()
        cb.wait()
        _sweep_pp_body(j, s_hat_ref, bounds_vmem, epi_vmem,
                       outbuf_ref, kbest_buf, shear_scr, reb_scr,
                       S=S, U=U, C=C, PAD=PAD, dim_d=dim_d, s_pad=s_pad,
                       slope_factor=slope_factor, h=h, iters=iters,
                       with_k_best=with_k_best, U_tot=U_tot,
                       masked=masked, interpret=interpret)
        co = pltpu.make_async_copy(
            outbuf_ref, out_hbm_ref.at[i, :, pl.ds(j * TU, TU)],
            sem_out)
        co.start()
        if with_k_best:
            ck = pltpu.make_async_copy(
                kbest_buf, kbest_hbm_ref.at[i, :, pl.ds(j * TU, TU)],
                sem_in)
            ck.start()
            ck.wait()
        co.wait()


def _sweep_pp_body(j, s_hat_ref, bounds_vmem, epi_ref,
                   outbuf_ref, kbest_ref, shear_scr, reb_scr, *,
                   S: int, U: int, C: int, PAD: int, dim_d: int,
                   s_pad: int, slope_factor: float, h: float,
                   iters: int, with_k_best: bool, U_tot: int,
                   masked: bool, interpret: bool = False):
    # bounds_vmem rows: 0 dmin, 1 dmax (+ 2 pdmin, 3 pdmax when masked)
    # outbuf rows: 0 best_score, 1 score_sum, 2 best_depth, 3:3+C rbar
    TU = 128
    s_hat = s_hat_ref[0, 0]
    a = DTYPE(chan_scale(C) / (h * h))
    S_tot = S + s_pad

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, TU), 1)
    upos_i = j * TU + lane                      # global u (int)
    upos = upos_i.astype(DTYPE)
    dmin_u = bounds_vmem[0:1, :]                # (1, TU)
    dmax_u = bounds_vmem[1:2, :]
    drange = dmax_u - dmin_u
    if masked:
        # allowed-candidate interval, padded by one grid step so every
        # pixel keeps at least one candidate even when its own range
        # falls between two grid points of the (wider) tile grid
        tol = drange / DTYPE(dim_d - 1)
        pd_lo = bounds_vmem[2:3, :] - tol
        pd_hi = bounds_vmem[3:4, :] + tol

    s_col = jax.lax.broadcasted_iota(jnp.int32, (S_tot, 1), 0)
    ds_col = (s_hat - s_col).astype(DTYPE)      # (S_tot, 1)
    s_valid = s_col < S                          # (S_tot, 1)

    def sweep_one_d(d, carry):
        best_score, best_depth, score_sum, n_allowed, rbar, kbest = carry
        # per-lane candidate with the reference's exact f32 op order
        # (core.hpp:548); the barriers keep the division a true divide
        # (not reciprocal-multiply) so candidate VALUES are bit-identical
        # to the XLA path (sweep.py) and the uniform kernel's dvec
        # (Mosaic has no optimization_barrier and compiles the divide
        # literally; interpret mode goes through XLA CPU, which would
        # rewrite x / c into x * (1 / c) without the barriers.)
        if interpret:
            delta_num = jax.lax.optimization_barrier(
                d.astype(DTYPE) * drange)
            delta_den = jax.lax.optimization_barrier(
                jnp.full((1, 1), DTYPE(dim_d - 1), DTYPE))
            delta_u = dmin_u + jax.lax.optimization_barrier(
                delta_num / delta_den)
        else:
            delta_u = dmin_u + (d.astype(DTYPE) * drange) / DTYPE(
                dim_d - 1)
        if masked:
            allowed = (delta_u >= pd_lo) & (delta_u <= pd_hi)  # (1, TU)

        # ---- sheared positions for ALL (s, lane) at once -------------
        # I = (s_hat - s) * d * slope + u, per lane (core.hpp:550-552)
        shift = ds_col * delta_u * DTYPE(slope_factor)     # [S_tot, TU]
        I = shift + upos
        fi = jnp.floor(I)
        t = I - fi
        fi_i = fi.astype(jnp.int32)
        ceil_i = fi_i + (t > 0).astype(jnp.int32)
        ok = (fi_i >= 0) & (ceil_i <= U - 1) & s_valid
        validf = ok.astype(DTYPE)

        # window coordinates: row block at offset w reads lane l from
        # E_pad[s, w + l]; position p matches iteration k when
        # p - l - base == k.  Invalid pairs collapse onto the min valid
        # relative offset so they never widen the scan.
        pos = fi_i + PAD                                  # [S_tot, TU]
        rel = pos - lane                                  # [S_tot, TU]
        BIG = jnp.int32(2 ** 30)

        # ---- block rebase: scan length = local position spread -------
        # Rows are re-based in 8-row blocks by the block's own minimum
        # position, so the cross-s drift ds*d*slope contributes at most
        # one block's worth (8*|d|*slope) to the scan length instead of
        # the whole S span.  The block loop is a STATIC unroll — all
        # sublane offsets static, no per-s scalar loop (that shape is
        # loop-overhead-bound on the TPU scalar core).  Tiles whose
        # local spread still exceeds the scratch window (wildly mixed
        # bounds) fall back to the global-window scan.
        n_blk = S_tot // 8
        rel_ok = jnp.where(ok, rel, BIG)
        blockmins = [jnp.clip(jnp.min(rel_ok[b * 8:(b + 1) * 8, :]),
                              0, U_tot - 384)
                     for b in range(n_blk)]               # scalars
        base_col = jnp.concatenate(
            [jnp.full((8, 1), bm, jnp.int32) for bm in blockmins],
            axis=0)                                       # [S_tot, 1]
        rel2 = jnp.where(ok, rel - base_col, 0)           # [S_tot, TU]
        dev = jnp.max(rel2)
        use_rebase = dev <= 126

        zeros = tuple(jnp.zeros((S_tot, TU), DTYPE) for _ in range(C))

        @pl.when(use_rebase)
        def _rebased():
            for b in range(n_blk):
                bm = blockmins[b]
                rem = jax.lax.rem(bm, 128)
                base = pl.multiple_of(bm - rem, 128)
                for c in range(C):
                    chunks = []
                    # NB rolls use the positive-equivalent amount:
                    # hardware tpu.dynamic_rotate diverges from
                    # interpret mode for negative shifts (measured on
                    # v5e; see ops/propagation_pallas.py)
                    for jj in range(2):
                        win = epi_ref[c, pl.ds(b * 8, 8),
                                      pl.ds(pl.multiple_of(
                                          base + jj * 128, 128), 256)]
                        sh = jnp.where(rem == 0, 0, 256 - rem)
                        chunks.append(
                            pltpu.roll(win, sh, axis=1)[:, :128])
                    # full-width store at a static sublane offset; lanes
                    # [256, 384) are never selected by the scan — pad
                    # with a dummy chunk.
                    reb_scr[c, b * 8:(b + 1) * 8, :] = jnp.concatenate(
                        chunks + [chunks[0]], axis=1)

            def kbody(k, vab):
                va, vb = vab
                rem = jax.lax.rem(k, 128)
                base = pl.multiple_of(k - rem, 128)
                rows = []
                for c in range(C):
                    win = reb_scr[c, pl.ds(0, S_tot), pl.ds(base, 256)]
                    sh = jnp.where(rem == 0, 0, 256 - rem)
                    rows.append(pltpu.roll(win, sh, axis=1)[:, :TU])
                hit_a = rel2 == k
                hit_b = rel2 == k - 1
                va = tuple(va_c + jnp.where(hit_a, r, 0.0)
                           for va_c, r in zip(va, rows))
                vb = tuple(vb_c + jnp.where(hit_b, r, 0.0)
                           for vb_c, r in zip(vb, rows))
                return va, vb

            va, vb = jax.lax.fori_loop(0, dev + 2, kbody, (zeros, zeros))
            for c in range(C):
                shear_scr[c, :, :] = (DTYPE(1.0) - t) * va[c] + t * vb[c]

        @pl.when(jnp.logical_not(use_rebase))
        def _global_window():
            w0 = jnp.min(jnp.where(ok, rel, BIG))
            w0 = jnp.minimum(w0, jnp.int32(PAD + U))      # all-invalid
            w0 = jnp.maximum(w0, jnp.int32(0))
            krel = jnp.where(ok, rel, w0) - w0            # [S_tot, TU]
            kcount = jnp.max(krel) + 2

            def kbody(k, vab):
                va, vb = vab
                start = w0 + k
                rem = jax.lax.rem(start, 128)
                base = pl.multiple_of(start - rem, 128)
                rows = []
                for c in range(C):
                    win = epi_ref[c, pl.ds(0, S_tot), pl.ds(base, 256)]
                    sh = jnp.where(rem == 0, 0, 256 - rem)
                    rows.append(pltpu.roll(win, sh, axis=1)[:, :TU])
                hit_a = krel == k
                hit_b = krel == k - 1
                va = tuple(va_c + jnp.where(hit_a, r, 0.0)
                           for va_c, r in zip(va, rows))
                vb = tuple(vb_c + jnp.where(hit_b, r, 0.0)
                           for vb_c, r in zip(vb, rows))
                return va, vb

            va, vb = jax.lax.fori_loop(0, kcount, kbody, (zeros, zeros))
            for c in range(C):
                shear_scr[c, :, :] = (DTYPE(1.0) - t) * va[c] + t * vb[c]

        shear = [shear_scr[c, :, :] for c in range(C)]    # C x [S_tot, TU]

        r0 = [sh * validf for sh in shear]
        rpos = [jnp.maximum(r, 0.0) for r in r0]
        card = jnp.sum(validf, axis=0, keepdims=True)

        # r_bar init: the s_hat row (core.hpp:577) — shift there is 0 so
        # the sheared value is the EPI row itself; select it from the
        # computed shear via an s-iota compare (no ref indexing needed).
        at_hat = (s_col == s_hat).astype(DTYPE)           # [S_tot, 1]
        rbar0 = jnp.concatenate(
            [jnp.sum(sh * at_hat, axis=0, keepdims=True) for sh in shear],
            axis=0)                                       # [C, TU]

        def ms_iter(_, state):
            rbar_d, _k = state
            sq = jnp.zeros((S_tot, TU), DTYPE)
            for c in range(C):
                diff = r0[c] - rbar_d[c:c + 1, :]
                sq = sq + diff * diff
            k = jnp.maximum(1.0 - a * sq, 0.0) * validf
            sum_k = jnp.sum(k, axis=0, keepdims=True)
            nums = [jnp.sum(rpos[c] * k, axis=0, keepdims=True)
                    for c in range(C)]
            new_rbar = jnp.concatenate([
                jnp.where(sum_k > 0, n / sum_k, 0.0) for n in nums],
                axis=0)
            return new_rbar, k

        # early exit when r_bar is stationary: further iterations are
        # exact no-ops (K, sums and r_bar reproduce themselves), so the
        # result is bit-identical to the fixed-count loop.
        k0 = jnp.zeros((S_tot, TU), DTYPE)

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

        sum_k = jnp.sum(k_last, axis=0, keepdims=True)
        score = jnp.where(card > 0, sum_k / card, 0.0)

        better = score > best_score
        if masked:
            better = better & allowed
            score_sum = score_sum + jnp.where(allowed, score, 0.0)
            n_allowed = n_allowed + allowed.astype(DTYPE)
        else:
            score_sum = score_sum + score
        best_score = jnp.where(better, score, best_score)
        best_depth = jnp.where(better, delta_u, best_depth)
        rbar = jnp.where(better, rbar_d, rbar)
        if with_k_best:
            kbest = jnp.where(better, k_last, kbest)
        return best_score, best_depth, score_sum, n_allowed, rbar, kbest

    kbest_init = jnp.zeros((S_tot, TU) if with_k_best else (8, TU), DTYPE)
    init = (
        jnp.full((1, TU), -1.0, DTYPE),
        jnp.zeros((1, TU), DTYPE),
        jnp.zeros((1, TU), DTYPE),
        jnp.zeros((1, TU), DTYPE),
        jnp.zeros((C, TU), DTYPE),
        kbest_init,
    )
    (best_score, best_depth, score_sum, n_allowed, rbar,
     kbest) = jax.lax.fori_loop(0, dim_d, sweep_one_d, init)

    outbuf_ref[0:1, :] = best_score
    if masked:
        # the wrapper's score_mean divides by dim_d: pre-scale so the
        # mean is over the ALLOWED candidates only (tol guarantees >= 1)
        outbuf_ref[1:2, :] = (score_sum * DTYPE(dim_d)
                              / jnp.maximum(n_allowed, 1.0))
    else:
        outbuf_ref[1:2, :] = score_sum
    outbuf_ref[2:3, :] = best_depth
    outbuf_ref[3:3 + C, :] = rbar
    if with_k_best:
        kbest_ref[:, :] = kbest


def sweep_pile_pallas_perpixel(epis_v_s_u_c, dmin_v_u, dmax_v_u,
                               global_bounds, dim_d: int, s_hat,
                               params: DepthParams,
                               with_k_best: bool = False,
                               padded=None, interpret: bool = False,
                               tile_active=None,
                               v_block: int = 128,
                               pdmin_v_u=None,
                               pdmax_v_u=None) -> SweepResult:
    """Per-pixel-bounds sweep via the tile kernel.

    Args:
      dmin_v_u / dmax_v_u: ``[V, U]`` per-pixel GRID bounds (each pixel's
        candidate grid is dmin + k * (dmax - dmin) / (dim_d - 1)).
      global_bounds: static (dmin, dmax) floats bounding every per-pixel
        value (the level's ctor constants) — determines the pad width.
      tile_active: optional ``[V, ceil(U/128)]`` activity flags.
      v_block: rows per pallas launch — bounds the per-launch runtime so
        remote-device watchdogs never trip even at worst-case scans.
      pdmin_v_u / pdmax_v_u: optional ``[V, U]`` per-pixel ALLOWED ranges:
        when given, candidates outside [pdmin - step, pdmax + step] are
        excluded from the argmax and the score mean (the tile-quantized
        coarse-sweep mode: grid bounds shared per 128-lane tile for a
        cheap uniform-shift gather, range restriction kept per pixel).
    """
    if params.interpolation != "linear":
        raise NotImplementedError("linear interpolation only")
    V, S, U, C = epis_v_s_u_c.shape
    gmin, gmax = global_bounds
    masked = pdmin_v_u is not None
    if padded is None:
        padded = prepare_padded_epis(epis_v_s_u_c, gmin, gmax,
                                     params.slope_factor)
    epi_pad, PAD, s_pad = padded
    S_tot = S + s_pad

    if v_block and v_block < V:
        # split into row blocks (tail handled by a second call shape)
        n_full = V // v_block
        Vf = n_full * v_block
        def call(epis_c, dmin_c, dmax_c, pad_c, act_c, pmin_c, pmax_c):
            return sweep_pile_pallas_perpixel(
                epis_c, dmin_c, dmax_c, global_bounds, dim_d, s_hat,
                params, with_k_best=with_k_best,
                padded=(pad_c, PAD, s_pad), interpret=interpret,
                tile_active=act_c, v_block=0,
                pdmin_v_u=pmin_c, pdmax_v_u=pmax_c)
        nt = _round_up(U, 128) // 128
        if tile_active is None:
            tile_active = jnp.ones((V, nt), jnp.int32)
        if not masked:
            pdmin_v_u = dmin_v_u  # placeholder leaves for lax.map
            pdmax_v_u = dmax_v_u

        def blk(args):
            (e, a, b, p, f, pm, px) = args
            return call(e, a, b, p, f, pm if masked else None,
                        px if masked else None)
        parts = jax.lax.map(blk, (
            epis_v_s_u_c[:Vf].reshape(n_full, v_block, S, U, C),
            dmin_v_u[:Vf].reshape(n_full, v_block, U),
            dmax_v_u[:Vf].reshape(n_full, v_block, U),
            epi_pad[:Vf].reshape((n_full, v_block) + epi_pad.shape[1:]),
            tile_active[:Vf].reshape(n_full, v_block, nt),
            pdmin_v_u[:Vf].reshape(n_full, v_block, U),
            pdmax_v_u[:Vf].reshape(n_full, v_block, U)))
        merged = [x.reshape((Vf,) + x.shape[2:]) for x in parts]
        if Vf < V:
            tail = call(epis_v_s_u_c[Vf:], dmin_v_u[Vf:], dmax_v_u[Vf:],
                        epi_pad[Vf:], tile_active[Vf:],
                        pdmin_v_u[Vf:] if masked else None,
                        pdmax_v_u[Vf:] if masked else None)
            merged = [jnp.concatenate([m, t], axis=0)
                      for m, t in zip(merged, tail)]
        return SweepResult(*merged)
    U_tot = epi_pad.shape[-1]
    TU = 128
    n_tiles = _round_up(U, TU) // TU
    Upad = n_tiles * TU

    def padu(x):
        if Upad == U:
            return x[:, None, :]
        return jnp.pad(x, ((0, 0), (0, Upad - U)))[:, None, :]

    dmin_p = padu(dmin_v_u)   # [V, 1, Upad]: tileable block shape
    dmax_p = padu(dmax_v_u)
    if masked:
        pdmin_p = padu(pdmin_v_u)
        pdmax_p = padu(pdmax_v_u)

    if tile_active is None:
        flags = jnp.ones((V * n_tiles,), jnp.int32)
    else:
        flags = tile_active.astype(jnp.int32).reshape(-1)

    s_hat_arr = jnp.asarray(s_hat, jnp.int32).reshape(1, 1)

    kernel = functools.partial(
        _sweep_pp_kernel, S=S, U=U, C=C, PAD=PAD, dim_d=dim_d,
        s_pad=s_pad, slope_factor=params.slope_factor,
        h=params.kernel_h, iters=params.mean_shift_max_iter,
        with_k_best=with_k_best, U_tot=U_tot, masked=masked,
        interpret=interpret)

    kb_S = S_tot if with_k_best else 8
    R = 3 + C
    B = 4 if masked else 2
    # stacked bounds planes [V, B, Upad]: one manual DMA per active tile
    bounds = jnp.concatenate(
        [dmin_p, dmax_p] + ([pdmin_p, pdmax_p] if masked else []),
        axis=1)
    # EPI, bounds and outputs in ANY memory space with MANUAL DMA under
    # the activity gate (see _sweep_pp_kernel docstring); inactive
    # tiles' output slices keep uninitialized garbage, which callers
    # merge out through the active-pixel mask.
    out_shapes = [
        jax.ShapeDtypeStruct((V, R, Upad), DTYPE),
        jax.ShapeDtypeStruct((V, kb_S, Upad if with_k_best else TU),
                             DTYPE),
    ]
    out_specs = [
        pl.BlockSpec(memory_space=pltpu.ANY),
        pl.BlockSpec(memory_space=pltpu.ANY),
    ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(V, n_tiles),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i, j, f: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),   # bounds
            pl.BlockSpec(memory_space=pltpu.ANY),   # epi
        ],
        out_specs=out_specs,
        scratch_shapes=[pltpu.VMEM((C, S_tot, U_tot), DTYPE),  # epi row
                        pltpu.VMEM((B, TU), DTYPE),            # bounds
                        pltpu.VMEM((R, TU), DTYPE),            # outbuf
                        pltpu.VMEM((kb_S, TU), DTYPE),         # kbest
                        pltpu.VMEM((C, S_tot, TU), DTYPE),     # shear
                        pltpu.VMEM((C, S_tot, 384), DTYPE),    # rebase
                        pltpu.SMEM((1,), jnp.int32),           # cur row
                        pltpu.SemaphoreType.DMA,
                        pltpu.SemaphoreType.DMA],
    )

    out, kbest = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        interpret=interpret,
    )(flags, s_hat_arr, bounds, epi_pad)

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
