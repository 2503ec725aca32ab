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

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..config import DepthParams
from ..types import DTYPE
from ..ops.median import selective_median
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


def claim_plane(x, s_hat):
    return jax.lax.dynamic_index_in_dim(x, s_hat, 0, keepdims=False)


def set_plane(x, s_hat, plane):
    return jax.lax.dynamic_update_index_in_dim(x, plane, s_hat, 0)


def sharded_schedule(mesh: Mesh, dim_d: int, params: DepthParams,
                     d_bounds: Tuple[float, float],
                     use_pallas: bool = False,
                     uniform_bounds: bool = True,
                     pad_static=None,
                     coarse_mode: str = "tile",
                     early_stop: bool = True):
    """Build the jitted shard_map'd pass-CHUNK runner.

    Runs the single-device driver's exact pass logic
    (models.depth2d._pass_fn — sweep engine selection, line/disp score
    versions, coarse modes and all) per v-shard inside shard_map, with
    the ppermute-halo selective median and a psum'd remaining count.
    Like the single-device driver, a chunk is a STATIC lax.scan and
    early stopping is the host's job between chunks (data-dependent
    on-device control flow around the Mosaic kernels costs a ~300 s
    deferred compile on the v5e — see models.depth2d._schedule_fn).

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
        median_fn=median_fn, axis_name=V_AXIS, early_stop=early_stop)

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
                 uniform_bounds: bool = True,
                 pad_static=None,
                 coarse_mode: str = "tile"):
    """Build a jitted shard_map'd SINGLE pass for a mesh.

    Thin wrapper around models.depth2d._pass_fn — the same pass
    implementation the single-device and full-schedule sharded drivers
    run (sweep engine selection, score versions, coarse modes and all) —
    with the ppermute-halo selective median and a psum'd remaining
    count.  Used by the multi-host smoke test; ``sharded_schedule`` is
    the production driver.

    Returns fn(epis, frames, dmin_s_v_u, dmax_s_v_u, epis_padded,
    state: Depth2DState, s_hat) -> (state, remaining).
    """
    from ..models.depth2d import Depth2DState, _pass_fn

    def body(epis, frames, dmin_s_v_u, dmax_s_v_u, epis_padded, state,
             s_hat):
        st = _pass_fn(epis, frames, dmin_s_v_u, dmax_s_v_u, epis_padded,
                      state, s_hat, dim_d=dim_d, params=params,
                      d_bounds=d_bounds, use_pallas=use_pallas,
                      uniform_bounds=uniform_bounds,
                      pad_static=pad_static, coarse_mode=coarse_mode,
                      median_fn=selective_median_sharded)
        remaining = jax.lax.psum(
            jnp.sum((st.ce_mask & st.claim).astype(jnp.int32)), V_AXIS)
        return st, remaining

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
        out_specs=(state_spec, rep),
        check_vma=False)
    return jax.jit(fn)
