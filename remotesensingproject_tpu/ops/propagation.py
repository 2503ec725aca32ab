"""Temporal depth propagation along EPI lines.

TPU-native redesign of the reference's sequential propagation loop
(rslf_depth_computation_core.hpp:1083-1129): after the sweep at a pass line
s_hat, every source pixel (v, u) passing the propagation criterion paints
its disparity along its own EPI line — target u' = u + round(d * (s_hat -
s) * slope_factor) for every s — onto targets that are still unclaimed and
radiance-close to the source's dominant radiance r_bar.  Painted targets
are claimed (mask bit cleared) so later passes skip them.

The reference resolves write conflicts implicitly: per (v, s) the u loop is
sequential and first-writer-wins, so for a contested target the SMALLEST
source u wins.  The dense redesign replicates this exactly without
scatters: for each s-plane, iterate over the bounded set of integer line
offsets o (o = u' - u = round(d * ds * slope)) from LARGE to SMALL,
first-writer-wins via the claim bit — the largest o is the smallest u.
All per-o work is full-plane shifted elementwise ops, ideal for the VPU.

TPU mapping notes:
* source planes are zero/False-padded along u by the static maximum
  offset once per pass, so every per-o step is a pure
  ``lax.dynamic_slice`` (a VPU-speed windowed copy) — never a gather
  (``x[:, clip(u - o)]`` lowers to a per-element gather on TPU), and the
  out-of-range test comes free from the False padding;
* the o loop bounds are tightened per pass from the masked sources'
  actual offset extremes (two reductions), so late passes with few or
  depth-clustered sources iterate a fraction of the worst-case range.

Semantics mirrored from the reference:
* painted values come from the source pixel: the (median-filtered) sweep
  depth (:1119), the disparity confidence (:1121), and under the line-
  confidence variant also C_l (:1123) — generically, `payloads`;
* the claim bit is cleared at the target (:1120);
* round is std::round (half away from zero), :1109;
* the radiance gate uses the sqrt(3)-scaled norm (< epsilon), :1116.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..types import DTYPE, normsq, round_half_away


def candidate_offsets(d_bounds: Tuple[float, float], dim_d: int,
                      slope_factor: float):
    """The candidate grid values times slope_factor, with the exact
    device expression (and barriers) of the sweep engines, so that a
    source depth produced by the sweep matches its grid value bitwise."""
    dmin, dmax = d_bounds
    d_idx = jnp.arange(dim_d, dtype=DTYPE)
    rng_ = DTYPE(np.float32(np.float32(dmax) - np.float32(dmin)))
    num = jax.lax.optimization_barrier(d_idx * rng_)
    den = jax.lax.optimization_barrier(jnp.asarray(DTYPE(dim_d - 1)))
    dvec = DTYPE(np.float32(dmin)) + jax.lax.optimization_barrier(
        num / den)
    return dvec * DTYPE(slope_factor)


def propagate(
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
    # sequence of (target_s_v_u, source_v_u) pairs painted under the
    # propagation condition; pass the depth volume itself as one of them.
    dim_d: int = 0,
    u_origin=None,
):
    """One pass of line painting.

    When ``dim_d`` > 1 (uniform-bounds levels), the per-s offset loop
    visits only the offsets of candidate-grid values PRESENT among the
    sources (at most min(P, range) plane steps instead of the full
    [o_lo, o_hi] scan — sweep depths, their selective medians and
    painted depths all lie exactly on the candidate grid, which is
    verified on device with a bitwise membership test; if any source is
    off-grid the dense scan runs instead, bit-identically).

    ``u_origin`` (traced int32, default 0) supports u-SHARDED targets:
    the source planes (depth_f/rbar/source_mask and payload sources) may
    be WIDER than the local targets — global width U_src with the local
    target block starting at global column u_origin.  Every per-o window
    then reads sources at [u_origin - o, u_origin - o + U): targets stay
    shard-local while sources from neighboring u-shards (up to the max
    line reach PADO = ceil(max|d| * slope * (S-1)) + 1 columns — the
    u-halo of SURVEY §7 step 7 / core.hpp:534-561) paint into this
    shard.  With the default (u_origin=0, U_src == U) the math is
    unchanged bit for bit.

    Returns:
      (claim_s_v_u, tuple of updated target volumes in payload order).
    """
    S, V, U = claim_s_v_u.shape
    u_origin = jnp.int32(0) if u_origin is None else \
        jnp.asarray(u_origin, jnp.int32)
    C = frames_s_v_u_c.shape[-1]
    s_hat = jnp.asarray(s_hat, jnp.int32)
    dmin, dmax = d_bounds
    eps_sq = DTYPE(epsilon) ** 2

    offs_num_v_u = depth_f_v_u * DTYPE(slope_factor)  # offset per unit ds

    use_buckets = dim_d > 1
    if use_buckets:
        bvals = candidate_offsets(d_bounds, dim_d, slope_factor)  # [D]
        # presence + bitwise grid-membership of the masked sources
        step_b = (DTYPE(np.float32(dmax)) - DTYPE(np.float32(dmin))) \
            * DTYPE(slope_factor) / DTYPE(dim_d - 1)
        bidx = jnp.clip(jnp.round(
            (offs_num_v_u - bvals[0]) / jnp.where(step_b == 0, 1.0,
                                                  step_b)),
            0, dim_d - 1).astype(jnp.int32)
        on_grid = bvals[bidx] == offs_num_v_u
        all_on_grid = jnp.all(on_grid | ~source_mask_v_u)
        # presence per bucket via a one-hot reduce (XLA scatters are
        # slow on TPU; this fuses into one masked any-reduce)
        jidx = jnp.arange(dim_d, dtype=jnp.int32)
        present = jnp.any(
            source_mask_v_u[None] & (bidx[None] == jidx[:, None, None]),
            axis=(1, 2))                          # [D]
        # compact: present values first, ascending (bvals is monotonic)
        order = jnp.argsort(~present, stable=True)
        plist = bvals[order]                      # [D]
        n_present = jnp.sum(present.astype(jnp.int32))

    # static pad: the largest |offset| any (s, d) pair can produce
    ds_max = max(1, S - 1)
    PADO = int(np.ceil(max(abs(dmin), abs(dmax)) * slope_factor * ds_max)) + 1

    def pad_u(x, value):
        cfg = [(0, 0)] * x.ndim
        cfg[1] = (PADO, PADO)
        return jnp.pad(x, cfg, constant_values=value)

    sm_pad = pad_u(source_mask_v_u, False)
    offs_num_pad = pad_u(offs_num_v_u, 0.0)
    rbar_pad = pad_u(rbar_v_u_c, 0.0)
    sources_pad = tuple(pad_u(s, 0.0) for _, s in payloads)
    targets = tuple(t for t, _ in payloads)

    # masked offset-per-unit-ds extremes -> tight per-s o ranges
    any_src = jnp.any(source_mask_v_u)
    mn_num = jnp.min(jnp.where(source_mask_v_u, offs_num_v_u, jnp.inf))
    mx_num = jnp.max(jnp.where(source_mask_v_u, offs_num_v_u, -jnp.inf))
    mn_num = jnp.where(any_src, mn_num, 0.0)
    mx_num = jnp.where(any_src, mx_num, 0.0)

    def per_s(s, carry):
        claim, targets = carry
        ds = (s_hat - s).astype(DTYPE)
        cand = jnp.stack([round_half_away(mn_num * ds),
                          round_half_away(mx_num * ds)])
        o_lo = jnp.min(cand).astype(jnp.int32)
        o_hi = jnp.max(cand).astype(jnp.int32)

        offs_pad = round_half_away(offs_num_pad * ds)  # [V, U+2P] float
        frame = jax.lax.dynamic_index_in_dim(
            frames_s_v_u_c, s, 0, keepdims=False)
        claim_s = jax.lax.dynamic_index_in_dim(claim, s, 0, keepdims=False)
        planes = tuple(
            jax.lax.dynamic_index_in_dim(t, s, 0, keepdims=False)
            for t in targets)

        def shifted(x, o):
            """x[:, u_origin + u - o] for u in [0, U): a dynamic slice."""
            starts = [jnp.int32(0),
                      (u_origin + PADO - o).astype(jnp.int32)]
            starts += [jnp.int32(0)] * (x.ndim - 2)
            return jax.lax.dynamic_slice(x, starts, (V, U) + x.shape[2:])

        def paint_o(o_f, claim_s, planes):
            """Paint all sources whose rounded offset at this s is o."""
            o = o_f.astype(jnp.int32)
            sm = shifted(sm_pad, o)
            off_sh = shifted(offs_pad, o)
            rb_sh = shifted(rbar_pad, o)

            radiance_ok = normsq(frame - rb_sh) < eps_sq
            cond = sm & (off_sh == o_f) & claim_s & radiance_ok

            planes = tuple(
                jnp.where(cond, shifted(src, o), plane)
                for plane, src in zip(planes, sources_pad))
            claim_s = claim_s & ~cond
            return claim_s, planes

        def per_o_step(i, inner):
            # descending o: first-writer-wins == smallest source u wins,
            # the reference's sequential order.
            o = o_hi - i
            claim_s, planes = inner
            return paint_o(o.astype(DTYPE), claim_s, planes)

        def dense_scan(args):
            return jax.lax.fori_loop(0, o_hi - o_lo + 1, per_o_step, args)

        # skip planes with nothing left to claim (cheap early passes)
        any_work = jnp.any(claim_s) & any_src

        if use_buckets:
            # the DISTINCT offsets realized at this s, in descending
            # order (== the reference's smallest-source-u-first order),
            # compacted with [dim_d]-sized vector ops — the scan then
            # visits n_distinct <= min(P, o-range) offsets with no
            # per-iteration branching.
            kk = jnp.arange(dim_d)
            idxs = jnp.where(ds > 0, n_present - 1 - kk, kk)
            o_seq = round_half_away(plist[idxs] * ds)      # [D]
            in_p = kk < n_present
            new = in_p & ((kk == 0)
                          | (o_seq != jnp.roll(o_seq, 1)))
            pos = jnp.cumsum(new.astype(jnp.int32)) - 1
            # compaction without a scatter (slow on TPU): one-hot
            # [D, D] select + max-reduce — o_seq is monotonic so any
            # reduction over the matched slot is exact
            oh = new[None, :] & (pos[None, :] == kk[:, None])
            o_arr = jnp.max(
                jnp.where(oh, o_seq[None, :], -jnp.inf), axis=1)
            n_distinct = jnp.sum(new.astype(jnp.int32))

            def per_distinct(i, inner):
                claim_s, planes = inner
                return paint_o(o_arr[i], claim_s, planes)

            def bucket_scan(args):
                return jax.lax.fori_loop(0, n_distinct, per_distinct,
                                         args)

            run = lambda args: jax.lax.cond(  # noqa: E731
                all_on_grid, bucket_scan, dense_scan, args)
        else:
            run = dense_scan

        claim_s, planes = jax.lax.cond(
            any_work, run, lambda args: args, (claim_s, planes))

        claim = jax.lax.dynamic_update_index_in_dim(claim, claim_s, s, 0)
        targets = tuple(
            jax.lax.dynamic_update_index_in_dim(t, p, s, 0)
            for t, p in zip(targets, planes))
        return claim, targets

    claim_out, targets_out = jax.lax.fori_loop(
        0, S, per_s, (claim_s_v_u, targets))
    return claim_out, targets_out
