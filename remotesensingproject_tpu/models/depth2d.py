"""Full 2-D depth computation with temporal propagation.

TPU-native analog of Depth2DComputer (rslf_depth_computation.hpp:651-915)
driving compute_2D_edge_confidence + compute_2D_depth_epi
(rslf_depth_computation_core.hpp:901-1133):

* edge confidence C_e for every (s, v, u), once;
* claim masks initialized to the C_e masks (core.hpp:958-963);
* passes over s_hat in center-outward order (core.hpp:981-990; note the
  schedule never visits plane 0 when S is even — replicated);
* each pass: dense sweep on still-unclaimed confident pixels of the s_hat
  plane, selective median filter, then line painting (propagation).

Reference quirks replicated on purpose:
* the median-filtered disparities are used for PROPAGATION but are not
  written back to the stored s_hat plane (the cv::Mat header re-bind at
  core.hpp:892 does not alias the caller's vector element) — except where
  the s = s_hat leg of propagation re-paints the pixel with its filtered
  value;
* a failed sweep (max score <= raw threshold) zeroes C_e and its mask at
  that pixel (core.hpp:653-657) but leaves the claim bit set;
* propagation sources are all pixels passing the criterion — including
  pixels claimed in earlier passes (their stored r_bar at this plane is 0,
  so their radiance gate almost never passes; core.hpp:1094-1127).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DEFAULT_PARAMS, DepthParams
from ..types import DTYPE
from ..ops.edge_confidence import edge_confidence_volume
from ..ops.median import selective_median
from ..ops.normalize import normalize_volume
from ..ops.propagation import propagate
from ..ops.sweep import sweep_pile


class Depth2DState(NamedTuple):
    """All mutable per-(s, v, u) planes of the 2-D computation."""

    ce: jnp.ndarray          # [S, V, U] edge confidence (sweep-mutated)
    ce_mask: jnp.ndarray     # [S, V, U] bool
    disp_conf: jnp.ndarray   # [S, V, U]
    line_conf: jnp.ndarray   # [S, V, U] (used when score_version=="line")
    best_depth: jnp.ndarray  # [S, V, U]
    rbar: jnp.ndarray        # [S, V, U, C]
    claim: jnp.ndarray       # [S, V, U] bool (True = unclaimed)


def center_outward_schedule(dim_s: int) -> list:
    """The reference's s_hat visiting order (core.hpp:981-990)."""
    s_hat = int(np.floor(dim_s / 2.0))
    order = [s_hat]
    for off in range(1, dim_s - s_hat):
        order.append(s_hat + off)
        if s_hat - off > -1:
            order.append(s_hat - off)
    return order


def _line_confidence(ce_s_v_u, best_depth_v_u, k_best_v_s_u, mask_v_u,
                     s_hat, d_bounds):
    """Line confidence C_l = sum_s C_e K / sum_s K along the winning line.

    Mirrors the _USE_LINE_CONFIDENCE_SCORE block (core.hpp:1032-1081).
    Note the index matrix at :1058 omits par_slope_factor — replicated.

    Computed WITHOUT a per-element gather: an XLA take_along_axis over
    the [S, V, U] volume costs ~2.2 s/pass at the bench shape (~80% of
    line-mode's r4 runtime) — instead, for each s the pixels sharing
    the same integer shift floor(idx) - u read the C_e row through ONE
    dynamic slice, scanned over the (per-s, masked-depth-bounded)
    shift range exactly like ops/propagation.py.  The index arithmetic
    idx = (s_hat - s) * d + u stays the full f32 expression, so fi / t
    and therefore every interpolated value is BITWISE what the
    take_along_axis formulation produced (tests/test_variants.py
    asserts this vs the independent gather oracle).  ``d_bounds``
    (static ctor constants) sizes the pad.
    """
    S, V, U = ce_s_v_u.shape
    k = jnp.transpose(k_best_v_s_u, (1, 0, 2))      # [S, V, U]
    den = jnp.sum(k, axis=0)
    u_row = jnp.arange(U, dtype=DTYPE)[None, :]     # (1, U)

    # static pad: the largest |shift| any (s, d in bounds) can produce
    # (+1 for the ceil sample; the line index omits slope_factor)
    PADO = int(np.ceil((S - 1) * max(abs(d_bounds[0]),
                                     abs(d_bounds[1])))) + 2
    ce_pad = jnp.pad(ce_s_v_u, ((0, 0), (0, 0), (PADO, PADO)))

    # masked-depth extremes -> tight per-s shift ranges
    any_m = jnp.any(mask_v_u)
    d_mn = jnp.min(jnp.where(mask_v_u, best_depth_v_u, jnp.inf))
    d_mx = jnp.max(jnp.where(mask_v_u, best_depth_v_u, -jnp.inf))
    d_mn = jnp.where(any_m, d_mn, 0.0)
    d_mx = jnp.where(any_m, d_mx, 0.0)

    def per_s(num, s):
        ds = s_hat.astype(DTYPE) - s.astype(DTYPE)
        idx = ds * best_depth_v_u + u_row            # [V, U] f32
        fi = jnp.floor(idx)
        t = idx - fi
        valid = (fi >= 0) & (jnp.ceil(idx) <= U - 1)
        o_px = fi.astype(jnp.int32) \
            - jnp.arange(U, dtype=jnp.int32)[None, :]
        cand = jnp.stack([jnp.floor(ds * d_mn), jnp.floor(ds * d_mx)])
        o_lo = jnp.min(cand).astype(jnp.int32) - 1
        o_hi = jnp.max(cand).astype(jnp.int32) + 1
        ce_row = jax.lax.dynamic_index_in_dim(ce_pad, s, 0,
                                              keepdims=False)
        ks = jax.lax.dynamic_index_in_dim(k, s, 0, keepdims=False)

        def per_o(i, acc):
            o = o_lo + i
            a = jax.lax.dynamic_slice(
                ce_row, (jnp.int32(0), PADO + o), (V, U))
            b = jax.lax.dynamic_slice(
                ce_row, (jnp.int32(0), PADO + o + 1), (V, U))
            sel = valid & (o_px == o)
            return acc + jnp.where(sel, (1.0 - t) * a + t * b, 0.0)

        ce_i = jax.lax.fori_loop(0, o_hi - o_lo + 1, per_o,
                                 jnp.zeros((V, U), DTYPE))
        return num + ce_i * ks, 0

    num, _ = jax.lax.scan(per_s, jnp.zeros((V, U), DTYPE),
                          jnp.arange(S, dtype=jnp.int32))
    return jnp.where(mask_v_u, num / den, 0.0)


def _sweep_slabbed(run_sweep, epis, active, padded, dmin_v_u, dmax_v_u,
                   n_slabs: int, with_k: bool = False):
    """Run the (per-v independent) sweep as a scan over v-slabs.

    The axon/v5e platform defers the real backend compile of a
    dispatched program to its FIRST execution, and that one-time cost
    explodes super-linearly with the kernel plane sizes: measured, a
    540x960 pass program pays 200-320 s while the structurally
    identical 270x480 one pays ~4 s.  Slab-sizing every kernel bounds
    the whole pipeline to the cheap regime; the extra HBM slice traffic
    is ~1 ms/pass.  The last slab is position-clamped (ik = V - Vs) so
    all slices are static-shaped; its overlap rows recompute
    bit-identical values (per-v independence), exactly like the
    propagation kernel's final v-tile.
    """
    V, S, U, C = epis.shape
    Vs = -(-V // n_slabs)
    ep, pad_f, s_pad = padded

    def body(carry, k):
        bs, sm_, bd, rb, kb = carry
        ik = jnp.minimum(k * Vs, V - Vs)

        def sl(x):
            return jax.lax.dynamic_slice_in_dim(x, ik, Vs, 0)

        res = run_sweep(sl(epis), sl(active), (sl(ep), pad_f, s_pad),
                        None if dmin_v_u is None else sl(dmin_v_u),
                        None if dmax_v_u is None else sl(dmax_v_u))

        def upd(full, part):
            return jax.lax.dynamic_update_slice_in_dim(full, part, ik, 0)

        if with_k:
            kb = upd(kb, res.k_best)
        return (upd(bs, res.best_score), upd(sm_, res.score_mean),
                upd(bd, res.best_depth), upd(rb, res.rbar), kb), 0

    z = jnp.zeros((V, U), DTYPE)
    kb0 = jnp.zeros((V, S, U) if with_k else (1, 1, 1), DTYPE)
    init = (z, z, z, jnp.zeros((V, U, C), DTYPE), kb0)
    (bs, sm_, bd, rb, kb), _ = jax.lax.scan(
        body, init, jnp.arange(n_slabs, dtype=jnp.int32))
    from ..ops.sweep import SweepResult
    if not with_k:
        kb = jnp.zeros((V, S, U), DTYPE)
    return SweepResult(best_score=bs, score_mean=sm_, best_depth=bd,
                       rbar=rb, k_best=kb)


def _median_slabbed(src, frame, mask, size: int, epsilon: float,
                    n_slabs: int):
    """selective_median as a scan over v-slabs with an H-row halo.

    Interior rows of each window see their full (v, u) neighborhood;
    windows clamp at the image edges where the plain median's zero-pad
    semantics apply identically — bit-equal to the unslabbed filter.
    """
    V, U = src.shape
    h = (size - 1) // 2
    Vs = -(-V // n_slabs)
    W = min(V, Vs + 2 * h)

    def body(out, k):
        ik = jnp.minimum(k * Vs, V - Vs)
        wk = jnp.clip(ik - h, 0, V - W)

        def slw(x):
            return jax.lax.dynamic_slice_in_dim(x, wk, W, 0)

        med_w = selective_median(slw(src), slw(frame), slw(mask), size,
                                 epsilon)
        part = jax.lax.dynamic_slice_in_dim(med_w, ik - wk, Vs, 0)
        return jax.lax.dynamic_update_slice_in_dim(out, part, ik, 0), 0

    out, _ = jax.lax.scan(body, jnp.zeros((V, U), DTYPE),
                          jnp.arange(n_slabs, dtype=jnp.int32))
    return out


def _prop_slabbed(prop_fn, claim, frames, filtered, rbar, source_mask,
                  srcs, tgts, n_slabs: int):
    """Propagation as a scan over v-slabs (per-v independent, no halo).

    ``prop_fn(claim_slab, frames_slab, filtered_slab, rbar_slab,
    sm_slab, payloads_slab)`` runs the line-paint kernel on [S, Vs, U]
    blocks; claim and payload targets are carried and stitched with
    dynamic_update_slice.
    """
    S, V, U = claim.shape
    Vs = -(-V // n_slabs)

    def body(carry, k):
        claim_c, tg = carry
        ik = jnp.minimum(k * Vs, V - Vs)

        def s1(x):
            return jax.lax.dynamic_slice_in_dim(x, ik, Vs, 1)

        def s0(x):
            return jax.lax.dynamic_slice_in_dim(x, ik, Vs, 0)

        pay = tuple((s1(t), s0(s)) for t, s in zip(tg, srcs))
        cl_o, tg_o = prop_fn(s1(claim_c), s1(frames), s0(filtered),
                             s0(rbar), s0(source_mask), pay)
        claim_c = jax.lax.dynamic_update_slice_in_dim(claim_c, cl_o,
                                                      ik, 1)
        tg = tuple(jax.lax.dynamic_update_slice_in_dim(t, o, ik, 1)
                   for t, o in zip(tg, tg_o))
        return (claim_c, tg), 0

    (claim_c, tg), _ = jax.lax.scan(
        body, (claim, tuple(tgts)), jnp.arange(n_slabs, dtype=jnp.int32))
    return claim_c, tg


def _lineconf_slabbed(ce, filtered, k_best, mask, s_hat, n_slabs: int,
                      d_bounds):
    """_line_confidence as a scan over v-slabs (per-v independent —
    the C_e interpolation reads along u within each (s, v) row)."""
    S, V, U = ce.shape
    Vs = -(-V // n_slabs)

    def body(out, k):
        ik = jnp.minimum(k * Vs, V - Vs)
        lc = _line_confidence(
            jax.lax.dynamic_slice_in_dim(ce, ik, Vs, 1),
            jax.lax.dynamic_slice_in_dim(filtered, ik, Vs, 0),
            jax.lax.dynamic_slice_in_dim(k_best, ik, Vs, 0),
            jax.lax.dynamic_slice_in_dim(mask, ik, Vs, 0), s_hat,
            d_bounds)
        return jax.lax.dynamic_update_slice_in_dim(out, lc, ik, 0), 0

    out, _ = jax.lax.scan(body, jnp.zeros((V, U), DTYPE),
                          jnp.arange(n_slabs, dtype=jnp.int32))
    return out


def _pass_fn(epis, frames, dmin_s_v_u, dmax_s_v_u, epis_padded,
             state: Depth2DState,
             s_hat, *, dim_d: int, params: DepthParams,
             d_bounds: Tuple[float, float], use_pallas: bool,
             uniform_bounds: bool, pad_static=None,
             coarse_mode: str = "tile",
             median_fn=None, v_slabs: int = 1,
             sweep_fn=None, prop_fn=None) -> Depth2DState:
    """One center-outward pass (sweep + median + propagation), jittable.

    ``median_fn`` (same signature as ops.median.selective_median)
    overrides the selective median — the sharded driver passes the
    ppermute-halo variant; everything else in the pass is per-v local
    and runs unchanged inside shard_map.

    ``sweep_fn(active, dmin_v_u, dmax_v_u, s_hat) -> SweepResult`` and
    ``prop_fn(claim, frames, filtered, rbar, source_mask, s_hat,
    payloads) -> (claim, targets)`` similarly override the sweep engine
    and the propagation — the 2-D (v, u)-sharded driver injects
    variants that exchange the u-halos (parallel/sharding2d.py) while
    ALL the merge/state logic of the pass stays this one
    implementation.

    ``v_slabs`` > 1 runs the sweep / median / propagation stages as
    scans over v-slabs so every compiled kernel is slab-sized (see
    _sweep_slabbed) — only supported on the pixel-kernel route (the
    driver enables it there).
    """
    V, S, U, C = epis.shape
    s_hat = jnp.asarray(s_hat, jnp.int32)

    def plane(x):
        return jax.lax.dynamic_index_in_dim(x, s_hat, 0, keepdims=False)

    ce_p = plane(state.ce)
    mask_p = plane(state.ce_mask)
    claim_p = plane(state.claim)
    depth_p = plane(state.best_depth)
    conf_p = plane(state.disp_conf)
    rbar_p = plane(state.rbar)
    dmin_v_u = plane(dmin_s_v_u)
    dmax_v_u = plane(dmax_s_v_u)
    frame = plane(frames)

    # The reference ANDs the edge mask into the claim plane in-place
    # before collecting pixels (core.hpp:510-513).
    active = mask_p & claim_p
    claim = jax.lax.dynamic_update_index_in_dim(
        state.claim, active, s_hat, 0)

    with_k = params.score_version == "line"
    # off-TPU, pallas kernels run in interpret mode (CPU-testable paths)
    interp = jax.default_backend() != "tpu"
    padded = None
    if pad_static is not None:
        padded = (epis_padded, pad_static[0], pad_static[1])
    if sweep_fn is not None:
        res = sweep_fn(active, dmin_v_u, dmax_v_u, s_hat)
    elif (use_pallas and params.interpolation == "linear" and C in (1, 3)
            and dim_d <= 1024):
        # (the pixel kernel packs ceil(dim_d/128) candidate lane blocks
        # per pixel — the reference's [240] rows stay on the fast path;
        # beyond 1024 candidates the dense kernels below take over)
        # pixel-compacted kernel: cost scales with the ACTIVE pixel
        # count (late passes leave spread-out survivors that keep every
        # 128-lane chunk of the dense kernels alive).  Bounds-edited
        # levels pass the per-pixel grids — the reference's EXACT
        # semantics (no tile quantization).  Line mode exports k_best
        # from the same kernel (with_k_best) — it no longer forces the
        # dense-row kernel (round-4 verdict #3).
        from ..ops.sweep_pallas_pixel import sweep_pile_pallas_pixel

        def run_sweep(ep_s, act_s, pad_s, dmin_s, dmax_s):
            return sweep_pile_pallas_pixel(
                ep_s, d_bounds[0], d_bounds[1], dim_d, s_hat, params,
                active_v_u=act_s, padded=pad_s, interpret=interp,
                dmin_v_u=dmin_s, dmax_v_u=dmax_s, with_k_best=with_k)

        if v_slabs > 1:
            res = _sweep_slabbed(
                run_sweep, epis, active, padded,
                None if uniform_bounds else dmin_v_u,
                None if uniform_bounds else dmax_v_u, v_slabs,
                with_k=with_k)
        else:
            res = run_sweep(epis, active, padded,
                            None if uniform_bounds else dmin_v_u,
                            None if uniform_bounds else dmax_v_u)
    elif use_pallas and uniform_bounds and params.interpolation == "linear":
        from ..ops.sweep_pallas import sweep_pile_pallas

        def run_dense(ep_s, act_s, pad_s, _dmin_s, _dmax_s):
            Vs = act_s.shape[0]
            n_tiles = -(-U // 128)
            act_pad = jnp.pad(act_s, ((0, 0), (0, n_tiles * 128 - U)))
            flags = jnp.any(act_pad.reshape(Vs, n_tiles, 128), axis=2)
            return sweep_pile_pallas(
                ep_s, d_bounds[0], d_bounds[1], dim_d, s_hat, params,
                with_k_best=with_k, padded=pad_s, row_active=flags,
                interpret=interp)

        if v_slabs > 1:
            res = _sweep_slabbed(run_dense, epis, active, padded,
                                 None, None, v_slabs, with_k=with_k)
        else:
            res = run_dense(epis, active, padded, None, None)
    elif use_pallas and params.interpolation == "linear":
        from ..ops.sweep_pallas_perpixel import sweep_pile_pallas_perpixel
        n_tiles = -(-U // 128)
        Upad = n_tiles * 128

        def chunkflags(m):
            mp = jnp.pad(m, ((0, 0), (0, Upad - U)))
            return jnp.any(mp.reshape(V, n_tiles, 128), axis=2)

        # Tile-quantized coarse sweep: the candidate GRID bounds are
        # shared per 128-lane tile (min/max of the active pixels'
        # refined bounds), which collapses the per-pixel kernel's
        # gather-scan window to the 8-row block drift — near the
        # uniform kernel's cost.  Each pixel's RANGE restriction is
        # preserved by masking candidates outside its own
        # [dmin - step, dmax + step] from the argmax (reference
        # semantics: only candidates inside the refined range compete,
        # rslf_fine_to_coarse.hpp:202-294 — the grid STEP is the tile's,
        # <= (gmax - gmin)/(dim_d - 1), far below the 0.5 px budget).
        # Fully-unrefined tiles quantize to the ctor constants and
        # reproduce the uniform grid bit-exactly.
        inf = DTYPE(jnp.inf)

        def tile_minmax(x, reduce_min):
            xp = jnp.pad(x, ((0, 0), (0, Upad - U)),
                         constant_values=(inf if reduce_min else -inf))
            act = jnp.pad(active, ((0, 0), (0, Upad - U)))
            xt = jnp.where(act, xp, inf if reduce_min else -inf)
            xt = xt.reshape(V, n_tiles, 128)
            red = jnp.min(xt, axis=2) if reduce_min else jnp.max(xt, axis=2)
            fallback = DTYPE(d_bounds[0] if reduce_min else d_bounds[1])
            red = jnp.where(jnp.isfinite(red), red, fallback)
            return jnp.repeat(red, 128, axis=1)[:, :U]

        if coarse_mode == "tile":
            qmin = tile_minmax(dmin_v_u, True)
            qmax = tile_minmax(dmax_v_u, False)
            res = sweep_pile_pallas_perpixel(
                epis, qmin, qmax, d_bounds, dim_d, s_hat, params,
                with_k_best=with_k, padded=padded,
                tile_active=chunkflags(active), interpret=interp,
                pdmin_v_u=dmin_v_u, pdmax_v_u=dmax_v_u)
        else:  # "pixel": the reference's exact per-pixel grids
            res = sweep_pile_pallas_perpixel(
                epis, dmin_v_u, dmax_v_u, d_bounds, dim_d, s_hat, params,
                with_k_best=with_k, padded=padded,
                tile_active=chunkflags(active), interpret=interp)
    else:
        res = sweep_pile(epis, dmin_v_u, dmax_v_u, dim_d, s_hat, params,
                         with_k_best=with_k)

    ok = res.best_score > params.raw_score_threshold
    good = active & ok
    bad = active & ~ok

    ce_new = jnp.where(bad, 0.0, ce_p)
    mask_new = mask_p & ~bad
    depth_new = jnp.where(good, res.best_depth, depth_p)
    conf_new = jnp.where(
        good, ce_new * jnp.abs(res.best_score - res.score_mean), conf_p)
    rbar_new = jnp.where(good[..., None], res.rbar, rbar_p)

    st = Depth2DState(
        ce=jax.lax.dynamic_update_index_in_dim(state.ce, ce_new, s_hat, 0),
        ce_mask=jax.lax.dynamic_update_index_in_dim(
            state.ce_mask, mask_new, s_hat, 0),
        disp_conf=jax.lax.dynamic_update_index_in_dim(
            state.disp_conf, conf_new, s_hat, 0),
        line_conf=state.line_conf,
        best_depth=jax.lax.dynamic_update_index_in_dim(
            state.best_depth, depth_new, s_hat, 0),
        rbar=jax.lax.dynamic_update_index_in_dim(
            state.rbar, rbar_new, s_hat, 0),
        claim=claim,
    )

    # Selective median on the (possibly propagation-painted) s_hat plane,
    # gated by the post-sweep edge mask (core.hpp:877-892).  The filtered
    # values drive propagation but do NOT replace the stored plane.
    # On the Pallas route the VMEM median kernel replaces the XLA filter
    # (~50 ms/pass at level 0, scripts/bench_pass.py) — bitwise identical
    # (tests/test_median_pallas.py + on-chip A/B in ACCEPTANCE_TPU); its
    # 16-row grid tiles keep the compiled plane small, so it needs no
    # v-slabbing.
    if median_fn is not None:
        filtered = median_fn(depth_new, frame, mask_new,
                             params.median_filter_size,
                             params.median_filter_epsilon)
    elif use_pallas and params.median_filter_size <= 17:
        # (the kernel's ROW_PAD/lane halo caps the window at 17; the
        # reference's sizes are 5 and 11, rs_report.tex:388)
        from ..ops.median_pallas import selective_median_pallas
        filtered = selective_median_pallas(
            depth_new, frame, mask_new, params.median_filter_size,
            params.median_filter_epsilon, interpret=interp)
    elif v_slabs > 1:
        filtered = _median_slabbed(depth_new, frame, mask_new,
                                   params.median_filter_size,
                                   params.median_filter_epsilon, v_slabs)
    else:
        filtered = selective_median(depth_new, frame, mask_new,
                                    params.median_filter_size,
                                    params.median_filter_epsilon)

    payloads = [(st.best_depth, filtered), (st.disp_conf, conf_new)]
    if params.score_version == "line":
        # C_l is refreshed only at pixels successfully swept THIS pass
        # (good): the reference writes it under the edge mask but reads
        # the kernel matrix K of the winning line, which is only defined
        # for fresh sweeps (core.hpp:645-651 exports K per-u only when
        # the score passes; at unswept pixels the buffer holds stale
        # values — and the Pallas kernels' k_best is undefined on
        # claimed chunks).  Elsewhere the previous plane value (e.g. a
        # propagation-painted C_l) is retained.
        if v_slabs > 1:
            lc_raw = _lineconf_slabbed(st.ce, filtered, res.k_best,
                                       mask_new, s_hat, v_slabs,
                                       d_bounds)
        else:
            lc_raw = _line_confidence(st.ce, filtered, res.k_best,
                                      mask_new, s_hat, d_bounds)
        lc = jnp.where(good, lc_raw, plane(state.line_conf))
        lc_state = jax.lax.dynamic_update_index_in_dim(
            st.line_conf, lc, s_hat, 0)
        st = st._replace(line_conf=lc_state)
        source_mask = lc > params.line_score_threshold
        payloads.append((st.line_conf, lc))
    elif params.score_version == "disp":
        source_mask = conf_new > params.disp_score_threshold
    else:
        source_mask = mask_new

    if prop_fn is not None:
        claim_out, targets_out = prop_fn(
            st.claim, frames, filtered, rbar_new, source_mask, s_hat,
            payloads)
    elif use_pallas:
        # VMEM line-paint kernel: handles arbitrary per-pixel depth
        # values (uniform AND bounds-edited levels), bit-identical to
        # the XLA path (tests/test_propagation_pallas.py)
        from ..ops.propagation_pallas import propagate_pallas
        if v_slabs > 1:
            def prop_fn(cl, fr, fi, rb, sm_, pay):
                return propagate_pallas(
                    cl, fr, fi, rb, sm_, s_hat, d_bounds,
                    params.slope_factor, params.propagation_epsilon,
                    pay, interpret=interp)

            claim_out, targets_out = _prop_slabbed(
                prop_fn, st.claim, frames, filtered, rbar_new,
                source_mask, [s for _, s in payloads],
                [t for t, _ in payloads], v_slabs)
        else:
            claim_out, targets_out = propagate_pallas(
                st.claim, frames, filtered, rbar_new, source_mask,
                s_hat, d_bounds, params.slope_factor,
                params.propagation_epsilon, payloads, interpret=interp)
    else:
        claim_out, targets_out = propagate(
            st.claim, frames, filtered, rbar_new, source_mask, s_hat,
            d_bounds, params.slope_factor, params.propagation_epsilon,
            payloads,
            # present-offsets-only painting applies when every pixel
            # shares the level's uniform candidate grid (bounds-edited
            # levels use per-tile/per-pixel grids -> dense scan)
            dim_d=dim_d if uniform_bounds else 0)

    st = st._replace(best_depth=targets_out[0], disp_conf=targets_out[1],
                     claim=claim_out)
    if params.score_version == "line":
        st = st._replace(line_conf=targets_out[2])
    return st


def _schedule_fn(epis, frames, dmin_s_v_u, dmax_s_v_u, epis_padded,
                 state: Depth2DState, s_hats, *, axis_name=None,
                 early_stop=True, **kw):
    """Run a STATIC chunk of center-outward passes in one device call.

    A lax.scan over the pass index: one dispatch and one host sync per
    chunk (vs one per pass), which matters over a remote device tunnel.
    Early stopping is the HOST driver's job, between chunks — measured
    on the v5e (axon tunnel): wrapping this Mosaic-heavy body in
    data-dependent control flow (a lax.while_loop with a
    remaining!=0 cond, or a lax.cond-gated scan body) triggers a
    pathological 280-440 s one-time deferred compile at first execution
    of the dispatched program, dwarfing everything else in a cold run;
    the identical body under a static-trip-count scan compiles in
    seconds.  The cost of host-side stopping is at most chunk-1 no-op
    passes per level: a pass on a zero-remaining state is an exact
    no-op (the sweep merge, the confidence zeroing and the propagation
    writes are all gated on still-unclaimed active pixels), so the
    results are bit-identical to per-pass stopping.

    The tail chunk (len < pass_chunk) traces/compiles a second, shorter
    executable under the same jit wrapper (shape-keyed), so ALL full
    chunks still share one compiled program.

    With ``axis_name`` the remaining count is psum'd across the mesh
    (the sharded driver runs its chunks inside shard_map).
    """
    if jax.default_backend() != "tpu":
        # Off-TPU the deferred-compile pathology does not exist and the
        # XLA sweep computes DENSELY regardless of activity, so a
        # converged tail pass costs a FULL sweep — keep the on-device
        # early stop here (bit-identical results either way: a pass on
        # a converged state is an exact no-op).  early_stop=False (a
        # full-schedule timing semantic) disables the remaining!=0 cut.
        def cond(carry):
            i, _st, remaining = carry
            in_range = i < s_hats.shape[0]
            if not early_stop:
                return in_range
            return jnp.logical_and(in_range, remaining != 0)

        def wbody(carry):
            i, st, _ = carry
            st = _pass_fn(epis, frames, dmin_s_v_u, dmax_s_v_u,
                          epis_padded, st, s_hats[i], **kw)
            remaining = jnp.sum(
                (st.ce_mask & st.claim).astype(jnp.int32))
            if axis_name is not None:
                remaining = jax.lax.psum(remaining, axis_name)
            return i + 1, st, remaining

        n_done, state, remaining = jax.lax.while_loop(
            cond, wbody, (jnp.int32(0), state, jnp.int32(-1)))
        return state, n_done, remaining

    def body(st, s_hat):
        st = _pass_fn(epis, frames, dmin_s_v_u, dmax_s_v_u,
                      epis_padded, st, s_hat, **kw)
        return st, 0

    state, _ = jax.lax.scan(body, state, s_hats)
    remaining = jnp.sum((state.ce_mask & state.claim).astype(jnp.int32))
    if axis_name is not None:
        remaining = jax.lax.psum(remaining, axis_name)
    return state, jnp.int32(s_hats.shape[0]), remaining


# Jitted-callable caches shared across Depth2DComputer instances: a
# fresh jax.jit wrapper per run() would re-trace (seconds per pyramid
# level) and re-query the persistent compilation cache on EVERY
# pipeline run — with these, a warm in-process rerun reuses the
# already-loaded executables (bench.py's steady-state timing measures
# the engine, not the tracer).
_SCHEDULE_FWD_CACHE: dict = {}
_EDGE_JIT = None


def _get_schedule_fwd(**kw):
    key = tuple(sorted(kw.items()))
    fn = _SCHEDULE_FWD_CACHE.get(key)
    if fn is None:
        fn = jax.jit(functools.partial(_schedule_fn, **kw),
                     donate_argnums=(5,))
        _SCHEDULE_FWD_CACHE[key] = fn
    return fn


def _edge_confidence_jit(epis, params):
    global _EDGE_JIT
    if _EDGE_JIT is None:
        _EDGE_JIT = jax.jit(edge_confidence_volume, static_argnums=1)
    return _EDGE_JIT(epis, params)


class Depth2DComputer:
    """Driver mirroring Depth2DComputer's ctor/run/getters."""

    def __init__(self, epis_v_s_u_c, dmin: float, dmax: float, dim_d: int,
                 epi_scale_factor: float = -1.0,
                 params: DepthParams = DEFAULT_PARAMS,
                 verbose: bool = False,
                 use_pallas: Optional[bool] = None,
                 early_stop: bool = True,
                 pass_chunk: int = 8,
                 coarse_mode: str = "tile",
                 v_slabs: Optional[int] = None):
        epis = jnp.asarray(epis_v_s_u_c)
        if epis.ndim == 3:
            epis = epis[..., None]
        self.epis = normalize_volume(epis, epi_scale_factor)
        V, S, U, C = self.epis.shape
        self.dim_d = dim_d
        self.dmin = float(dmin)
        self.dmax = float(dmax)
        self.params = params
        self.verbose = verbose
        self.early_stop = early_stop
        self.pass_chunk = max(1, pass_chunk)
        # "tile": tile-quantized candidate grids at bounds-edited levels
        # (fast TPU path); "pixel": the reference's exact per-pixel grids
        self.coarse_mode = coarse_mode
        # None = auto (see run()); 1 disables v-slabbing
        self.v_slabs = v_slabs
        self.accept_all = False
        if use_pallas is None:
            use_pallas = jax.default_backend() == "tpu"
        self.use_pallas = use_pallas
        # Per-pixel disparity bounds, editable by the pyramid
        # (rslf_depth_computation.hpp:196-215).  Materialized LAZILY:
        # at uniform-bounds levels the Pallas path never reads them, and
        # eagerly allocating [S, V, U] x2 per pyramid level costs ~1 GB
        # of HBM residency at the RGB MansionLR shape (OOM).
        self._dmin_arr: Optional[jnp.ndarray] = None
        self._dmax_arr: Optional[jnp.ndarray] = None
        self._bounds_edited = False
        self.state: Optional[Depth2DState] = None

    @property
    def dmin_s_v_u(self):
        if self._dmin_arr is None:
            S, V, U = (self.epis.shape[1], self.epis.shape[0],
                       self.epis.shape[2])
            self._dmin_arr = jnp.full((S, V, U), self.dmin, DTYPE)
        return self._dmin_arr

    @dmin_s_v_u.setter
    def dmin_s_v_u(self, value):
        self._dmin_arr = value

    @property
    def dmax_s_v_u(self):
        if self._dmax_arr is None:
            S, V, U = (self.epis.shape[1], self.epis.shape[0],
                       self.epis.shape[2])
            self._dmax_arr = jnp.full((S, V, U), self.dmax, DTYPE)
        return self._dmax_arr

    @dmax_s_v_u.setter
    def dmax_s_v_u(self, value):
        self._dmax_arr = value

    # -- pyramid hooks (rslf_depth_computation.hpp:196-215) -------------

    def set_accept_all(self, accept_all: bool):
        self.accept_all = accept_all

    def set_bounds(self, dmin_s_v_u, dmax_s_v_u):
        self.dmin_s_v_u = dmin_s_v_u
        self.dmax_s_v_u = dmax_s_v_u
        self._bounds_edited = True

    # -------------------------------------------------------------------

    def run(self) -> Depth2DState:
        V, S, U, C = self.epis.shape
        frames = jnp.transpose(self.epis, (1, 0, 2, 3))  # [S, V, U, C]

        ce_vsu, mask_vsu = _edge_confidence_jit(self.epis, self.params)
        ce = jnp.transpose(ce_vsu, (1, 0, 2))
        ce_mask = jnp.transpose(mask_vsu, (1, 0, 2))

        # line_conf is only read/written under score_version == "line";
        # a broadcastable dummy saves an [S, V, U] plane of residency
        lc_shape = (S, V, U) if self.params.score_version == "line" \
            else (1, 1, 1)
        state = Depth2DState(
            ce=ce,
            ce_mask=ce_mask,
            disp_conf=jnp.zeros((S, V, U), DTYPE),
            line_conf=jnp.zeros(lc_shape, DTYPE),
            best_depth=jnp.zeros((S, V, U), DTYPE),
            rbar=jnp.zeros((S, V, U, C), DTYPE),
            claim=ce_mask.copy(),  # distinct buffer (donation-safe)
        )

        use_pallas_path = (self.use_pallas
                           and self.params.interpolation == "linear")
        if use_pallas_path:
            from ..ops.sweep_pallas import prepare_padded_epis
            epis_padded, pad_f, s_pad = prepare_padded_epis(
                self.epis, self.dmin, self.dmax,
                self.params.slope_factor)
            pad_static = (int(pad_f), int(s_pad))
        else:
            epis_padded = jnp.zeros((1,), DTYPE)
            pad_static = None
        # v-slabbing: bound the compiled kernel plane sizes on the
        # pixel-kernel route (see _sweep_slabbed and the probed policy
        # below — the platform's deferred first-execution compile grows
        # super-linearly with plane size, but the r5 kernel restructure
        # moved the cheap-regime boundary; each tier is measured).
        pixel_route = (use_pallas_path and C in (1, 3)
                       and self.dim_d <= 1024)
        # the dense-row kernel is slab-wired at uniform-bounds levels
        # (line mode's k_best export rides the slab scan carry; it also
        # serves dim_d > 128, which exceeds the pixel kernel's
        # candidate lane axis)
        dense_route = use_pallas_path and not self._bounds_edited
        slab_capable = pixel_route or dense_route
        if self.v_slabs is not None:
            v_slabs = max(1, int(self.v_slabs)) if slab_capable else 1
        elif slab_capable and jax.default_backend() == "tpu":
            # channel count multiplies the kernel plane bytes/work, so
            # it scales the deferred first-activation compile the same
            # way V*U does (measured at the RGB shape: 6 slabs -> 148 s
            # first chunk, 17 slabs -> 97 s, warm +5 ms/pass).
            # r5: the valid-window group clip restructure shrank the
            # kernel's compile profile enough that LR18-class planes
            # (540x960, D up to 240) now first-compile UNSLABBED in
            # ~15 s (measured 35-39 s cold level-0 incl. execution,
            # twice, vs the old 200-320 s) — and the slab scan was
            # costing ~4 s warm at level 0.  Planes beyond 600k px
            # keep the r4 slabbing (validated cold numbers at the HR
            # and RGB shapes).  pass_chunk stays 8: chunk=16 UNSLABBED
            # re-triggers the pathology (measured 208 s first chunk).
            # Line mode's k_best export makes the kernel structurally
            # bigger and re-trips the pathology unslabbed at 540x960
            # (296 s first chunk, measured) — it keeps the r4 slabbing
            # at every size.
            # 1-ch planes up to ~2.5M px: 2 slabs, probed at the HR
            # shape (1080x1920): cold 139 s / warm 99.5 s level-0 vs
            # the r4 14-slab policy's 161 / 131 (unslabbed: warm 94.8
            # but cold 209 — the pathology partially returns at this
            # plane size).  Multi-channel (RGB) and larger planes keep
            # the r4 formula (validated cold numbers there; channel
            # count multiplies the compile the same way area does).
            vuc = V * U * C
            line = self.params.score_version == "line"
            if vuc <= 600_000 and not line:
                v_slabs = 1
            elif vuc <= 2_500_000 and C == 1 and not line:
                v_slabs = 2
            else:
                v_slabs = max(1, int(np.ceil(vuc / 150_000.0)))
        else:
            v_slabs = 1
        # each slab must cover the median halo window (and stay useful)
        v_slabs = min(v_slabs, max(1, V // 16))
        kw = dict(dim_d=self.dim_d, params=self.params,
                  d_bounds=(self.dmin, self.dmax),
                  use_pallas=self.use_pallas,
                  uniform_bounds=not self._bounds_edited,
                  pad_static=pad_static,
                  coarse_mode=self.coarse_mode,
                  v_slabs=v_slabs,
                  # on TPU early stopping is host-side (between chunks);
                  # off-TPU it gates the on-device while_loop cond
                  early_stop=self.early_stop)
        schedule = center_outward_schedule(S)
        import time as _time

        # Bounded dispatches: each device call runs pass_chunk passes as
        # an on-device scan, and the host syncs the remaining count in
        # between (early stop happens HERE — on-device data-dependent
        # stopping costs a ~300 s deferred compile, see _schedule_fn).
        # One unbounded dispatch of the whole schedule also trips the
        # TPU runtime's execution watchdog at production shapes ("TPU
        # worker process crashed"), wedging the chip — the r1 bench
        # crash root cause.
        fwd = _get_schedule_fwd(**kw)
        # uniform-bounds Pallas levels never read the per-pixel bound
        # arrays: broadcastable dummies avoid 2 x [S, V, U] of HBM
        # (plane() clamps its dynamic index, and every consumer of
        # dmin_v_u is on the bounds-edited or jnp path)
        if use_pallas_path and not self._bounds_edited:
            dmin_arr = jnp.full((1, 1, 1), self.dmin, DTYPE)
            dmax_arr = jnp.full((1, 1, 1), self.dmax, DTYPE)
        else:
            dmin_arr = self.dmin_s_v_u
            dmax_arr = self.dmax_s_v_u
        chunk = self.pass_chunk
        done = 0
        executed = 0
        t_chunk = _time.time()
        while done < len(schedule):
            # full chunks share ONE compiled program; the (shorter)
            # tail chunk gets its own shape-keyed trace under the same
            # jit wrapper
            part = schedule[done:done + chunk]
            done += len(part)
            state, n_done, remaining = fwd(
                self.epis, frames, dmin_arr, dmax_arr,
                epis_padded, state, jnp.asarray(part, jnp.int32))
            remaining = int(remaining)  # host sync paces the dispatches
            executed += int(n_done)  # off-TPU early stop can cut a chunk
            if self.verbose:
                now = _time.time()
                print(f"passes {executed}/{len(schedule)} "
                      f"(+{now - t_chunk:.1f}s, "
                      f"remaining px {remaining})")
                t_chunk = now
            if self.early_stop and remaining == 0:
                if self.verbose:
                    print(f"early stop after {executed} passes")
                break
        self.state = jax.block_until_ready(state)
        return self.state

    # -- getters mirroring the reference --------------------------------

    def get_depths_s_v_u(self):
        return self.state.best_depth

    def get_valid_depths_mask_s_v_u(self):
        """Validity per score_version (rslf_depth_computation.hpp:893-915).

        Note the default branch thresholds the C_e VALUES (> edge
        threshold), not the stored boolean mask.
        """
        if self.accept_all:
            return jnp.ones_like(self.state.ce, bool)
        p = self.params
        if p.score_version == "disp":
            return self.state.disp_conf > p.disp_score_threshold
        if p.score_version == "line":
            return self.state.line_conf > p.line_score_threshold
        return self.state.ce > p.edge_score_threshold

    def get_epis(self):
        return self.epis

    def get_coloured_epi(self, v: int = -1, colormap: str = "jet"):
        """Slope-coloured EPI at row v
        (Depth2DComputer::get_coloured_epi,
        rslf_depth_computation.hpp:807-860)."""
        from ..utils.plot import coloured_epi_2d
        if v < 0:
            v = self.epis.shape[0] // 2
        return coloured_epi_2d(self.state.best_depth,
                               self._criterion_mask(), v, colormap)

    def get_disparity_map(self, s: int = -1, colormap: str = "jet"):
        """Colormapped disparity map at frame s
        (rslf_depth_computation.hpp:862-891)."""
        from ..utils.plot import disparity_map_image
        S = self.epis.shape[1]
        if s < 0:
            s = S // 2
        return disparity_map_image(
            jnp.asarray(self.state.best_depth)[s],
            jnp.asarray(self._criterion_mask())[s], colormap)

    def _criterion_mask(self):
        """The per score_version painting criterion (the #ifdef chains at
        rslf_depth_computation.hpp:836-846,865-880: edge uses the stored
        boolean mask; disp/line threshold their confidences)."""
        p = self.params
        if p.score_version == "disp":
            return self.state.disp_conf > p.disp_score_threshold
        if p.score_version == "line":
            return self.state.line_conf > p.line_score_threshold
        return self.state.ce_mask
