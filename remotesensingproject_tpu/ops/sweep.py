"""Dense slope sweep with mean-shift radiance scoring (XLA/jnp path).

TPU-native re-design of compute_1D_depth_epi, the reference's hot loop
(rslf_depth_computation_core.hpp:480-661).  Instead of iterating the sparse
``findNonZero`` pixel set per EPI column, the whole (v, u, d) domain is
computed densely — masked lanes are nearly free on a vector machine and XLA
wants regular shapes.  The caller merges results into state at active
pixels only.

Numerics mirrored exactly:

* candidate disparities  D[d] = dmin + d * (dmax - dmin) / (dim_d - 1)
  with per-pixel dmin/dmax (core.hpp:545-548);
* sheared sample index  I[s, d] = u + (s_hat - s) * D[d] * slope_factor
  (core.hpp:550-552);
* 1-D linear interpolation with out-of-range -> invalid (NaN in the
  reference) and the per-d valid count card_R
  (rslf_interpolation.hpp:155-193);
* ``mean_shift_max_iter`` truncated mean-shift iterations on r_bar, with
  NaN->0 handling via masks and r_bar floored at 0 (core.hpp:577-610);
* the final score uses the kernel values of the LAST iteration — i.e. the
  r_bar before its final update (core.hpp:612-625), while the reported
  r_bar has all updates applied;
* score = sum_s K / card_R, 0 where card_R == 0 (core.hpp:620-622);
* argmax over d keeps the first maximum (cv::minMaxLoc semantics);
* per-u score mean over all d slots, used for the disparity confidence
  C_d = C_e * |max - mean| (core.hpp:641).

This jnp path handles per-pixel disparity bounds (needed by the coarse
pyramid levels, rslf_fine_to_coarse.hpp:179-294).  The finest level, whose
bounds are uniform, is served by the Pallas kernel in sweep_pallas.py.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import DepthParams
from ..types import DTYPE


class SweepResult(NamedTuple):
    """Dense per-(v, u) sweep outputs (before masking/merge)."""

    best_score: jnp.ndarray  # [V, U] max_d score
    score_mean: jnp.ndarray  # [V, U] mean over all d slots
    best_depth: jnp.ndarray  # [V, U] disparity at the argmax d
    rbar: jnp.ndarray        # [V, U, C] converged dominant radiance
    k_best: jnp.ndarray      # [V, S, U] K(r - rbar) at the winning d
                             # (zeros when with_k_best=False)


def _gather_rows(epi_s_u_c, idx_s_u, U):
    """epi[s, idx[s, u], c] with idx int32 already clipped to [0, U-1]."""
    return jnp.take_along_axis(epi_s_u_c, idx_s_u[..., None], axis=1)


def _radiances_for_d(epi_s_u_c, delta_u, s_hat, slope_factor, interpolation,
                     u_valid=None):
    """Sheared radiance samples for one candidate disparity plane.

    Args:
      epi_s_u_c: ``[S, U, C]``.
      delta_u: ``[U]`` per-pixel candidate disparity for this d slot.
      s_hat: traced int32 scalar.
      slope_factor: static float.
      interpolation: "linear" | "nearest".
      u_valid: optional traced (lo, hi) — the VALID sample index window
        within the input's u axis.  Defaults to (0, U-1), the whole
        input.  A u-sharded caller passes a u-HALOED epi block whose
        columns map to global [u0 - Hu, u0 + Ul + Hu); global validity
        [0, U_global-1] then becomes the local window
        (Hu - u0, Hu - u0 + U_global - 1) — out-of-IMAGE samples must be
        excluded from card_R exactly like the unsharded operator
        (rslf_interpolation.hpp:156-193 NaN semantics), while
        out-of-BLOCK never happens (Hu covers the max shear reach).

    Returns:
      (val [S, U, C] with invalid slots zero-filled,
       valraw [S, U, C] signed values (invalid zero-filled),
       valid [S, U] bool).
    """
    S, U, C = epi_s_u_c.shape
    u_lo, u_hi = (0, U - 1) if u_valid is None else u_valid
    s_idx = jnp.arange(S, dtype=DTYPE)
    u_idx = jnp.arange(U, dtype=DTYPE)
    shift = (s_hat.astype(DTYPE) - s_idx)[:, None] * delta_u[None, :] * DTYPE(
        slope_factor
    )  # [S, U]
    idx = u_idx[None, :] + shift

    if interpolation == "nearest":
        # Intended semantics of Interpolation1DNearestNeighbour
        # (rslf_interpolation.hpp:81-131): round-half-away, valid in range.
        ri = jnp.sign(idx) * jnp.floor(jnp.abs(idx) + 0.5)
        valid = (ri >= u_lo) & (ri <= u_hi)
        ric = jnp.clip(ri, 0, U - 1).astype(jnp.int32)
        val = _gather_rows(epi_s_u_c, ric, U)
    else:
        fi = jnp.floor(idx)
        ci = jnp.ceil(idx)
        t = idx - fi
        valid = (fi >= u_lo) & (ci <= u_hi)
        fic = jnp.clip(fi, 0, U - 1).astype(jnp.int32)
        cic = jnp.clip(ci, 0, U - 1).astype(jnp.int32)
        a = _gather_rows(epi_s_u_c, fic, U)
        b = _gather_rows(epi_s_u_c, cic, U)
        tt = t[..., None]
        val = (1.0 - tt) * a + tt * b

    valid_c = valid[..., None]
    valraw = jnp.where(valid_c, val, 0.0)
    # un-nanified values additionally floor at 0 (core.hpp:580: cv::max
    # with 0 both removes NaNs and clamps negatives).
    valpos = jnp.where(valid_c, jnp.maximum(val, 0.0), 0.0)
    return valpos, valraw, valid


def _mean_shift_scores(valpos, valraw, valid, rbar0, params: DepthParams):
    """Run the truncated mean shift; return (score_num = sum_s K, rbar, K).

    ``K`` is the kernel matrix of the last iteration (used for the score
    and the line-confidence export, core.hpp:612-617).
    """
    h = params.kernel_h
    C = valraw.shape[-1]
    from ..types import chan_scale

    a = chan_scale(C) / (h * h)
    validf = valid.astype(valraw.dtype)

    def body(_, carry):
        rbar, _k = carry
        diff = valraw - rbar[None, :, :]
        ksq = a * jnp.sum(jnp.square(diff), axis=-1)
        k = jnp.maximum(1.0 - ksq, 0.0) * validf  # [S, U]
        sum_k = jnp.sum(k, axis=0)  # [U]
        sum_rk = jnp.sum(valpos * k[..., None], axis=0)  # [U, C]
        new_rbar = jnp.where(sum_k[:, None] > 0, sum_rk / sum_k[:, None], 0.0)
        return new_rbar, k

    k0 = jnp.zeros(valid.shape, valraw.dtype)
    rbar, k_last = jax.lax.fori_loop(
        0, params.mean_shift_max_iter, body, (rbar0, k0)
    )
    return jnp.sum(k_last, axis=0), rbar, k_last


def sweep_epi(epi_s_u_c, dmin_u, dmax_u, dim_d, s_hat, params: DepthParams,
              with_k_best: bool = False, u_valid=None):
    """Dense sweep of one EPI: all u, all d.

    Returns per-u arrays (best_score [U], score_mean [U], best_depth [U],
    rbar [U, C], k_best [S, U]).
    """
    S, U, C = epi_s_u_c.shape
    s_hat = jnp.asarray(s_hat, jnp.int32)
    # r_bar init: radiances at s = s_hat, which is exactly the EPI row
    # (shift is 0 there, core.hpp:577).
    rbar_init = jax.lax.dynamic_index_in_dim(epi_s_u_c, s_hat, axis=0,
                                             keepdims=False)  # [U, C]

    drange = dmax_u - dmin_u

    def per_d(carry, d):
        best_score, best_depth, score_sum, rbar_b, k_b = carry
        # float32 op order matches the reference exactly
        # (core.hpp:548: dmin + d * (dmax - dmin) / (dim_d - 1)) so that
        # half-integer propagation offsets round identically.  The
        # optimization barriers stop XLA from rewriting the division into
        # a multiply-by-reciprocal (which perturbs the last ulp and flips
        # exactly-half offsets).
        num = jax.lax.optimization_barrier(d.astype(DTYPE) * drange)
        den = jax.lax.optimization_barrier(jnp.asarray(DTYPE(dim_d - 1)))
        delta_u = dmin_u + jax.lax.optimization_barrier(num / den)
        valpos, valraw, valid = _radiances_for_d(
            epi_s_u_c, delta_u, s_hat, params.slope_factor,
            params.interpolation, u_valid=u_valid)
        card = jnp.sum(valid.astype(DTYPE), axis=0)  # [U]
        score_num, rbar, k_last = _mean_shift_scores(
            valpos, valraw, valid, rbar_init, params)
        score = jnp.where(card > 0, score_num / card, 0.0)  # [U]

        better = score > best_score
        best_score = jnp.where(better, score, best_score)
        best_depth = jnp.where(better, delta_u, best_depth)
        rbar_b = jnp.where(better[:, None], rbar, rbar_b)
        if with_k_best:
            k_b = jnp.where(better[None, :], k_last, k_b)
        score_sum = score_sum + score
        return (best_score, best_depth, score_sum, rbar_b, k_b), None

    init = (
        jnp.full((U,), -1.0, DTYPE),
        jnp.zeros((U,), DTYPE),
        jnp.zeros((U,), DTYPE),
        jnp.zeros((U, C), DTYPE),
        jnp.zeros((S, U), DTYPE),
    )
    (best_score, best_depth, score_sum, rbar_b, k_b), _ = jax.lax.scan(
        per_d, init, jnp.arange(dim_d, dtype=jnp.int32))
    return best_score, score_sum / DTYPE(dim_d), best_depth, rbar_b, k_b


def sweep_pile(epis_v_s_u_c, dmin_v_u, dmax_v_u, dim_d, s_hat,
               params: DepthParams, with_k_best: bool = False,
               v_chunk: int = 8, u_valid=None) -> SweepResult:
    """Dense sweep over all EPIs (the per-v fan-out of
    compute_1D_depth_epi_pile, core.hpp:772-875 — the reference's OpenMP
    axis becomes the vectorized/sharded axis here).

    Args:
      epis_v_s_u_c: ``[V, S, U, C]`` normalized volume.
      dmin_v_u / dmax_v_u: ``[V, U]`` per-pixel disparity bounds.
      dim_d: number of candidate disparities (static).
      s_hat: reference temporal line (traced int32).
      v_chunk: rows per lax.map step (memory knob).
    """
    V, S, U, C = epis_v_s_u_c.shape
    s_hat = jnp.asarray(s_hat, jnp.int32)

    pad_v = (-V) % v_chunk
    if pad_v:
        def pad_rows(x):
            return jnp.pad(x, [(0, pad_v)] + [(0, 0)] * (x.ndim - 1),
                           mode="edge")
        epis_p = pad_rows(epis_v_s_u_c)
        dmin_p = pad_rows(dmin_v_u)
        dmax_p = pad_rows(dmax_v_u)
    else:
        epis_p, dmin_p, dmax_p = epis_v_s_u_c, dmin_v_u, dmax_v_u
    Vp = V + pad_v

    epis_c = epis_p.reshape(Vp // v_chunk, v_chunk, S, U, C)
    dmin_c = dmin_p.reshape(Vp // v_chunk, v_chunk, U)
    dmax_c = dmax_p.reshape(Vp // v_chunk, v_chunk, U)

    def chunk_fn(args):
        epi_b, dmin_b, dmax_b = args
        return jax.vmap(
            lambda e, lo, hi: sweep_epi(e, lo, hi, dim_d, s_hat, params,
                                        with_k_best, u_valid=u_valid)
        )(epi_b, dmin_b, dmax_b)

    bs, sm, bd, rb, kb = jax.lax.map(chunk_fn, (epis_c, dmin_c, dmax_c))

    def unchunk(x):
        return x.reshape((Vp,) + x.shape[2:])[:V]

    return SweepResult(
        best_score=unchunk(bs),
        score_mean=unchunk(sm),
        best_depth=unchunk(bd),
        rbar=unchunk(rb),
        k_best=unchunk(kb),
    )
