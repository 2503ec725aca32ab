"""2-D (v, u) mesh sharding with u-halo exchange — SURVEY §7 step 7.

For VERY WIDE frames the u (column) axis is split across a second mesh
axis in addition to the v scanline blocks.  Three operators read across
the u split; each gets exactly the halo it needs, exchanged with
``lax.ppermute`` over the mesh's u ring:

* the SWEEP's shear gather (core.hpp:534-561) reads radiances up to
  Hu = ceil(max|s_hat - s| * max|d| * slope) + 2 columns outside a
  block: the (static) EPI volume is u-haloed by Hu once per pass chunk
  and the sweep runs on the haloed block with the valid-sample window
  set to the GLOBAL image bounds (ops.sweep u_valid), so out-of-image
  NaN/card_R semantics are bit-identical to the unsharded operator;
* PROPAGATION paints targets from sources up to PADO = ceil(max|d| *
  slope * (S-1)) + 1 columns away: the per-pass s_hat source planes
  (filtered depth, r_bar, source mask, payload sources) are u-haloed by
  PADO and the shard-local targets are painted via ops.propagation's
  ``u_origin`` window — first-writer-wins order is global because the
  descending-offset scan covers the GLOBAL masked offset extremes
  (computed from the haloed sources);
* the SELECTIVE MEDIAN's (v, u) window gets (size-1)/2-wide halos on
  BOTH axes; u first, then v on the u-widened block, so corner taps
  carry the diagonal shard's rows.

All merge/state logic runs models.depth2d._pass_fn — this module only
injects the three halo-aware stage functions (sweep_fn / median_fn /
prop_fn), so there is exactly ONE pass implementation.

``use_pallas=True`` runs the PIXEL-COMPACTED sweep kernel and the VMEM
median kernel per shard (round-4 verdict #6): the sweep runs on the
u-haloed block with its validity window set to the GLOBAL image bounds
(sweep_pile_pallas_pixel's ``u_valid``), so halo-resident samples
count as valid exactly like the unsharded operator; propagation stays
the XLA scatter-free scan (it is not the per-shard bottleneck — the
sweep is the 15x kernel-vs-oracle gap, ACCEPTANCE_TPU).  Halos come
from the IMMEDIATE ring neighbors, so the local block must be at least
as wide as the halo (asserted at trace time) — for narrower blocks,
shard v more and u less.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..config import DepthParams
from ..types import DTYPE
from ..ops.median import selective_median
from ..ops.propagation import propagate
from ..ops.sweep import SweepResult, sweep_pile
from .mesh import U_AXIS, V_AXIS


def exchange_halo(x, width: int, array_axis: int, axis_name: str,
                  fill_value=0):
    """Concatenate ``width`` slices from the ring neighbors along
    ``array_axis``.  Edge shards receive ``fill_value`` halos (the
    global-image-boundary semantics of the windowed operators)."""
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    size = x.shape[array_axis]
    assert width <= size, (
        f"halo width {width} exceeds the local block extent {size} on "
        f"axis {axis_name!r} — shard this axis less (halos come from "
        f"immediate ring neighbors)")
    fwd = [(i, (i + 1) % n) for i in range(n)]
    bwd = [(i, (i - 1) % n) for i in range(n)]
    last = jax.lax.slice_in_dim(x, size - width, size, axis=array_axis)
    first = jax.lax.slice_in_dim(x, 0, width, axis=array_axis)
    from_prev = jax.lax.ppermute(last, axis_name, fwd)
    from_next = jax.lax.ppermute(first, axis_name, bwd)
    fill_lo = jnp.full_like(from_prev, fill_value)
    fill_hi = jnp.full_like(from_next, fill_value)
    lo = jnp.where(idx == 0, fill_lo, from_prev)
    hi = jnp.where(idx == n - 1, fill_hi, from_next)
    return jnp.concatenate([lo, x, hi], axis=array_axis)


def _halo_widths(S: int, d_bounds, slope_factor: float):
    max_abs_d = max(abs(d_bounds[0]), abs(d_bounds[1]))
    # sweep gather reach: |shift| <= max|s_hat - s| * max|d| * slope,
    # +1 for the linear blend's ceil sample, +1 slack
    hu_sweep = int(np.ceil((S - 1) * max_abs_d * slope_factor)) + 2
    # propagation line reach (== ops.propagation's PADO)
    pado = int(np.ceil(max_abs_d * slope_factor * (S - 1))) + 1
    return hu_sweep, pado


def sharded_schedule_2d(mesh: Mesh, dim_d: int, params: DepthParams,
                        d_bounds: Tuple[float, float],
                        u_global: int,
                        uniform_bounds: bool = True,
                        coarse_mode: str = "tile",
                        use_pallas: bool = False,
                        early_stop: bool = True):
    """Build the jitted shard_map'd pass-chunk runner on a (v, u) mesh.

    Same contract as parallel.sharding.sharded_schedule; state planes
    shard over BOTH v and u.  ``u_global`` is the TRUE (unpadded) image
    width — samples beyond it are out-of-image even when the sharded
    arrays are zero-padded to a multiple of the u-mesh size.  Returns
    fn(epis, frames, dmin_s_v_u, dmax_s_v_u, epis_padded_unused, state,
    s_hats) -> (state, n_done, remaining).
    """
    from ..models.depth2d import Depth2DState, _schedule_fn

    with_k = params.score_version == "line"
    assert not with_k, "u-sharding does not support score_version='line'"

    def body(epis, frames, dmin_s_v_u, dmax_s_v_u, epis_padded, state,
             s_hats):
        Vl, S, Ul, C = epis.shape
        hu, pado = _halo_widths(S, d_bounds, params.slope_factor)
        u_idx = jax.lax.axis_index(U_AXIS)
        u0 = u_idx * Ul                    # this shard's global column 0

        # static EPI columns: haloed once per chunk, reused by every
        # pass's sweep
        epis_h = exchange_halo(epis, hu, 2, U_AXIS, 0.0)
        interp = jax.default_backend() != "tpu"
        pallas_ok = (use_pallas and params.interpolation == "linear"
                     and C in (1, 3) and dim_d <= 1024)
        if pallas_ok:
            from ..ops.sweep_pallas import prepare_padded_epis
            from ..ops.sweep_pallas_pixel import sweep_pile_pallas_pixel
            padded_h = prepare_padded_epis(epis_h, d_bounds[0],
                                           d_bounds[1],
                                           params.slope_factor)

        def crop(x, axis):
            return jax.lax.slice_in_dim(x, hu, hu + Ul, axis=axis)

        def sweep_fn(active, dmin_v_u, dmax_v_u, s_hat):
            # global image validity window in haloed-local coordinates
            lo = hu - u0
            hi = (u_global - 1) - u0 + hu
            if pallas_ok:
                # pixel-compacted kernel on the u-haloed block: only
                # the CORE columns are active; halo-resident samples
                # are admitted by the u_valid window (verdict r4 #6 —
                # the wide-frame scale-out path now rides the fast
                # engine instead of the 15x slower XLA sweep)
                act_h = jnp.pad(active, ((0, 0), (hu, hu)))
                if uniform_bounds:
                    dmin_h = dmax_h = None
                else:
                    dmin_h = exchange_halo(dmin_v_u, hu, 1, U_AXIS,
                                           DTYPE(d_bounds[0]))
                    dmax_h = exchange_halo(dmax_v_u, hu, 1, U_AXIS,
                                           DTYPE(d_bounds[1]))
                res = sweep_pile_pallas_pixel(
                    epis_h, d_bounds[0], d_bounds[1], dim_d, s_hat,
                    params, active_v_u=act_h, padded=padded_h,
                    interpret=interp, dmin_v_u=dmin_h, dmax_v_u=dmax_h,
                    with_k_best=False, u_valid=(lo, hi))
            else:
                dmin_h = exchange_halo(dmin_v_u, hu, 1, U_AXIS,
                                       DTYPE(d_bounds[0]))
                dmax_h = exchange_halo(dmax_v_u, hu, 1, U_AXIS,
                                       DTYPE(d_bounds[1]))
                res = sweep_pile(epis_h, dmin_h, dmax_h, dim_d, s_hat,
                                 params, with_k_best=False,
                                 u_valid=(lo, hi))

            return SweepResult(
                best_score=crop(res.best_score, 1),
                score_mean=crop(res.score_mean, 1),
                best_depth=crop(res.best_depth, 1),
                rbar=crop(res.rbar, 1),
                k_best=crop(res.k_best, 2))

        def median_fn(src, frame, mask, size, epsilon):
            w = (size - 1) // 2

            def widen(x, fill):
                x = exchange_halo(x, w, 1, U_AXIS, fill)   # u first
                return exchange_halo(x, w, 0, V_AXIS, fill)

            if pallas_ok and size <= 17:
                from ..ops.median_pallas import selective_median_pallas
                out = selective_median_pallas(
                    widen(src, 0.0), widen(frame, 0.0),
                    widen(mask, False), size, epsilon,
                    interpret=interp)
            else:
                out = selective_median(widen(src, 0.0),
                                       widen(frame, 0.0),
                                       widen(mask, False), size,
                                       epsilon)
            return out[w:-w, w:-w]

        def prop_fn(claim, frames_, filtered, rbar, source_mask, s_hat,
                    payloads):
            def h(x, fill):
                return exchange_halo(x, pado, 1, U_AXIS, fill)

            pay = tuple((t, h(s, 0.0)) for t, s in payloads)
            return propagate(
                claim, frames_, h(filtered, 0.0), h(rbar, 0.0),
                h(source_mask, False), s_hat, d_bounds,
                params.slope_factor, params.propagation_epsilon, pay,
                dim_d=dim_d if uniform_bounds else 0, u_origin=pado)

        return _schedule_fn(
            epis, frames, dmin_s_v_u, dmax_s_v_u, epis_padded, state,
            s_hats, dim_d=dim_d, params=params, d_bounds=d_bounds,
            use_pallas=False, uniform_bounds=uniform_bounds,
            pad_static=None,
            coarse_mode=coarse_mode, median_fn=median_fn,
            sweep_fn=sweep_fn, prop_fn=prop_fn,
            axis_name=(V_AXIS, U_AXIS), early_stop=early_stop)

    vs = P(V_AXIS, None, U_AXIS, None)        # epis [V, S, U, C]
    sv = P(None, V_AXIS, U_AXIS)              # [S, V, U]
    svc = P(None, V_AXIS, U_AXIS, None)       # [S, V, U, C]
    rep = P()
    state_spec = Depth2DState(ce=sv, ce_mask=sv, disp_conf=sv,
                              line_conf=sv, best_depth=sv, rbar=svc,
                              claim=sv)
    fn = shard_map(
        body, mesh=mesh,
        in_specs=(vs, svc, sv, sv, rep, state_spec, rep),
        out_specs=(state_spec, rep, rep),
        check_vma=False)
    return jax.jit(fn, donate_argnums=(5,))


def shard_volume_2d(epis_v_s_u_c, mesh: Mesh):
    return jax.device_put(
        epis_v_s_u_c,
        NamedSharding(mesh, P(V_AXIS, None, U_AXIS, None)))


def shard_planes_2d(planes, mesh: Mesh):
    spec = P(None, V_AXIS, U_AXIS,
             *([None] * (planes.ndim - 3)))
    return jax.device_put(planes, NamedSharding(mesh, spec))
