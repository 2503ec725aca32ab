"""shard_map pipeline stages with v-halo exchange.

TPU-native replacement for the reference's shared-memory OpenMP fan-out:
the ``[V, S, U, C]`` volume and all ``[S, V, U]`` state planes shard over
the mesh's ``v`` axis; the per-pass computation (sweep + selective median
+ propagation) runs per shard inside ``shard_map``, with:

* NO halo for the sweep itself (EPIs are independent per v — SURVEY §7);
* a (size-1)/2-row halo exchanged via ``lax.ppermute`` for the selective
  median's (v, u) window;
* claims, depths and confidences updated shard-locally (propagation never
  crosses v);
* the remaining-active count reduced with ``psum`` for early stopping.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..config import DepthParams
from ..types import DTYPE
from ..ops.edge_confidence import edge_confidence_frame
from ..ops.median import selective_median
from ..ops.propagation import propagate
from ..ops.sweep import sweep_pile
from .mesh import V_AXIS


def shard_volume(epis_v_s_u_c, mesh: Mesh):
    """Place the EPI volume with rows sharded over the mesh."""
    spec = P(V_AXIS, *([None] * (epis_v_s_u_c.ndim - 1)))
    return jax.device_put(epis_v_s_u_c, NamedSharding(mesh, spec))


def shard_planes(planes_s_v_u, mesh: Mesh):
    """Place [S, V, U, ...] state planes with v (axis 1) sharded."""
    spec = P(None, V_AXIS, *([None] * (planes_s_v_u.ndim - 2)))
    return jax.device_put(planes_s_v_u, NamedSharding(mesh, spec))


def exchange_v_halo(x_local, width: int, axis_name: str = V_AXIS):
    """Concatenate `width` rows from the previous / next shard along the
    leading (v) axis.  Edge shards receive zero halos, matching the
    global operator's clipped-window behavior when the accompanying mask
    halo is also zero.

    Returns the haloed array of leading size ``local_V + 2 * width``.
    """
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    top_edge = idx == 0
    bot_edge = idx == n - 1

    # send my top rows to the previous shard's bottom halo and my bottom
    # rows to the next shard's top halo
    fwd = [(i, (i + 1) % n) for i in range(n)]
    bwd = [(i, (i - 1) % n) for i in range(n)]
    from_prev = jax.lax.ppermute(x_local[-width:], axis_name, fwd)
    from_next = jax.lax.ppermute(x_local[:width], axis_name, bwd)
    zeros = jnp.zeros_like(x_local[:width])
    top = jnp.where(top_edge, zeros, from_prev)
    bot = jnp.where(bot_edge, zeros, from_next)
    return jnp.concatenate([top, x_local, bot], axis=0)


def selective_median_sharded(src_v_u, frame_v_u_c, mask_v_u, size: int,
                             epsilon: float, axis_name: str = V_AXIS):
    """Selective median with row-halo exchange (inside shard_map)."""
    w = (size - 1) // 2
    src_h = exchange_v_halo(src_v_u, w, axis_name)
    frame_h = exchange_v_halo(frame_v_u_c, w, axis_name)
    mask_h = exchange_v_halo(mask_v_u.astype(DTYPE), w, axis_name) > 0.5
    out = selective_median(src_h, frame_h, mask_h, size, epsilon)
    return out[w:-w]


def _sharded_pass_body(epis, frames, dmin_v_u, dmax_v_u,
                       ce_p, mask_p, claim, best_depth, disp_conf, rbar,
                       s_hat, *, dim_d: int, params: DepthParams,
                       d_bounds: Tuple[float, float],
                       use_pallas: bool = False,
                       uniform_bounds: bool = True):
    """Per-shard slice of one center-outward pass (runs inside shard_map).

    All arrays are the LOCAL v-shard: epis [Vl, S, U, C], frames
    [S, Vl, U, C], planes [Vl, U] for the s_hat plane, volumes
    [S, Vl, U].  Returns the updated local state.
    """
    s_hat = jnp.asarray(s_hat, jnp.int32)
    active = mask_p & claim_plane(claim, s_hat)
    claim = set_plane(claim, s_hat, active)

    if use_pallas and uniform_bounds and \
            params.interpolation == "linear":
        from ..ops.sweep_pallas import sweep_pile_pallas
        row_flags = jnp.any(active, axis=1)
        res = sweep_pile_pallas(epis, d_bounds[0], d_bounds[1], dim_d,
                                s_hat, params, row_active=row_flags)
    elif use_pallas and params.interpolation == "linear":
        from ..ops.sweep_pallas_perpixel import (
            sweep_pile_pallas_perpixel)
        Vl, U = active.shape
        n_tiles = -(-U // 128)
        act_pad = jnp.pad(active, ((0, 0), (0, n_tiles * 128 - U)))
        tile_flags = jnp.any(act_pad.reshape(Vl, n_tiles, 128), axis=2)
        res = sweep_pile_pallas_perpixel(
            epis, dmin_v_u, dmax_v_u, d_bounds, dim_d, s_hat, params,
            tile_active=tile_flags)
    else:
        res = sweep_pile(epis, dmin_v_u, dmax_v_u, dim_d, s_hat, params)

    ok = res.best_score > params.raw_score_threshold
    good = active & ok
    bad = active & ~ok
    ce_new = jnp.where(bad, 0.0, ce_p)
    mask_new = mask_p & ~bad

    depth_p = claim_plane(best_depth, s_hat)
    conf_p = claim_plane(disp_conf, s_hat)
    rbar_p = claim_plane(rbar, s_hat)
    depth_new = jnp.where(good, res.best_depth, depth_p)
    conf_new = jnp.where(
        good, ce_new * jnp.abs(res.best_score - res.score_mean), conf_p)
    rbar_new = jnp.where(good[..., None], res.rbar, rbar_p)

    best_depth = set_plane(best_depth, s_hat, depth_new)
    disp_conf = set_plane(disp_conf, s_hat, conf_new)
    rbar = set_plane(rbar, s_hat, rbar_new)

    frame = claim_plane(frames, s_hat)
    filtered = selective_median_sharded(
        depth_new, frame, mask_new, params.median_filter_size,
        params.median_filter_epsilon)

    claim, (best_depth, disp_conf) = propagate(
        claim, frames, filtered, rbar_new, mask_new, s_hat, d_bounds,
        params.slope_factor, params.propagation_epsilon,
        payloads=((best_depth, filtered), (disp_conf, conf_new)),
        dim_d=dim_d if uniform_bounds else 0)

    remaining = jax.lax.psum(
        jnp.sum((mask_new & claim_plane(claim, s_hat)).astype(jnp.int32)),
        V_AXIS)
    return (ce_new, mask_new, claim, best_depth, disp_conf, rbar,
            remaining)


def claim_plane(x, s_hat):
    return jax.lax.dynamic_index_in_dim(x, s_hat, 0, keepdims=False)


def set_plane(x, s_hat, plane):
    return jax.lax.dynamic_update_index_in_dim(x, plane, s_hat, 0)


def sharded_schedule(mesh: Mesh, dim_d: int, params: DepthParams,
                     d_bounds: Tuple[float, float],
                     use_pallas: bool = False,
                     uniform_bounds: bool = True,
                     early_stop: bool = True,
                     pad_static=None,
                     coarse_mode: str = "tile"):
    """Build the jitted shard_map'd FULL-SCHEDULE runner.

    Runs the single-device driver's exact pass logic
    (models.depth2d._pass_fn — sweep engine selection, line/disp score
    versions, coarse modes and all) per v-shard inside shard_map, with
    the ppermute-halo selective median and a psum'd early-stop count,
    for the whole center-outward schedule in ONE dispatch.

    Returns fn(epis, frames, dmin_s_v_u, dmax_s_v_u, epis_padded,
    state: Depth2DState, s_hats) -> (state, n_done, remaining), with the
    input state buffers donated.
    """
    import functools as _ft

    from ..models.depth2d import Depth2DState, _schedule_fn

    def median_fn(src, frame, mask, size, epsilon):
        return selective_median_sharded(src, frame, mask, size, epsilon)

    body = _ft.partial(
        _schedule_fn, dim_d=dim_d, params=params, d_bounds=d_bounds,
        use_pallas=use_pallas, uniform_bounds=uniform_bounds,
        pad_static=pad_static, coarse_mode=coarse_mode,
        early_stop=early_stop, median_fn=median_fn, axis_name=V_AXIS)

    vs = P(V_AXIS, None, None, None)          # epis [V, S, U, C]
    sv = P(None, V_AXIS, None)                # [S, V, U]
    svc = P(None, V_AXIS, None, None)         # [S, V, U, C]
    rep = P()
    state_spec = Depth2DState(ce=sv, ce_mask=sv, disp_conf=sv,
                              line_conf=sv, best_depth=sv, rbar=svc,
                              claim=sv)
    pad_spec = vs if pad_static is not None else rep

    fn = shard_map(
        body, mesh=mesh,
        in_specs=(vs, svc, sv, sv, pad_spec, state_spec, rep),
        out_specs=(state_spec, rep, rep),
        check_vma=False)
    return jax.jit(fn, donate_argnums=(5,))


def sharded_pass(mesh: Mesh, dim_d: int, params: DepthParams,
                 d_bounds: Tuple[float, float],
                 use_pallas: bool = False,
                 uniform_bounds: bool = True):
    """Build the jitted shard_map'd pass function for a mesh.

    Returns fn(epis, frames, dmin_v_u_full, dmax_v_u_full, ce_p, mask_p,
    claim, best_depth, disp_conf, rbar, s_hat) -> updated state tuple.
    Array shardings: epis [V,S,U,C] v-sharded; frames and state volumes
    [S,V,U(,C)] v-sharded on axis 1; s_hat replicated.
    """
    v = P(V_AXIS)
    vs = P(V_AXIS, None, None, None)          # epis
    sv = P(None, V_AXIS, None)                # [S, V, U]
    svc = P(None, V_AXIS, None, None)         # [S, V, U, C]
    vu = P(V_AXIS, None)                      # [V, U]
    vuc = P(V_AXIS, None, None)               # [V, U, C]
    rep = P()

    body = functools.partial(_sharded_pass_body, dim_d=dim_d,
                             params=params, d_bounds=d_bounds,
                             use_pallas=use_pallas,
                             uniform_bounds=uniform_bounds)
    fn = shard_map(
        body, mesh=mesh,
        in_specs=(vs, svc, vu, vu, vu, vu, sv, sv, sv, svc, rep),
        out_specs=(vu, vu, sv, sv, sv, svc, rep),
        check_vma=False)
    return jax.jit(fn)
