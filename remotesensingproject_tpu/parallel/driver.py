"""Sharded full-pipeline driver: Depth2DComputer over a device mesh.

Runs the complete 2-D propagation pipeline with every state plane
v-sharded (parallel/sharding.py) — the multi-chip / multi-host execution
of BASELINE configs 4-5.  Numerically identical to the single-device
driver (verified in tests): it runs the single-device driver's exact
pass logic (models.depth2d._pass_fn) per shard inside shard_map — so
every score version (edge/disp/line), interpolation, sweep engine and
coarse mode is supported — with the selective median exchanging row
halos and the early-stop count psum'd.  Like the single-device driver,
the whole center-outward schedule executes in ONE donated dispatch.
"""

from __future__ import annotations

import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DEFAULT_PARAMS, DepthParams
from ..types import DTYPE
from ..ops.edge_confidence import edge_confidence_volume
from ..ops.normalize import normalize_volume
from ..models.depth2d import Depth2DState, center_outward_schedule
from .mesh import make_mesh
from .sharding import shard_planes, shard_volume, sharded_schedule


class ShardedDepth2DComputer:
    """Mesh-parallel Depth2DComputer (all score versions)."""

    def __init__(self, epis_v_s_u_c, dmin: float, dmax: float,
                 dim_d: int, mesh=None, epi_scale_factor: float = -1.0,
                 params: DepthParams = DEFAULT_PARAMS,
                 verbose: bool = False, early_stop: bool = True,
                 use_pallas: Optional[bool] = None,
                 coarse_mode: str = "tile"):
        if mesh is None:
            mesh = make_mesh()
        self.mesh = mesh
        epis = jnp.asarray(epis_v_s_u_c)
        if epis.ndim == 3:
            epis = epis[..., None]
        epis = normalize_volume(epis, epi_scale_factor)
        # pad V to a multiple of the mesh size with ZERO rows: zero
        # radiance falls below the shadow cut, so padded rows get empty
        # edge masks and never contribute (median/propagation are
        # mask-gated); getters slice them off.
        n_dev = int(np.prod(mesh.devices.shape))
        self._orig_v = epis.shape[0]
        pad_v = (-epis.shape[0]) % n_dev
        if pad_v:
            epis = jnp.pad(epis, ((0, pad_v), (0, 0), (0, 0), (0, 0)))
        self.epis = shard_volume(epis, mesh)
        self.dim_d = dim_d
        self.dmin = float(dmin)
        self.dmax = float(dmax)
        self.params = params
        self.verbose = verbose
        self.early_stop = early_stop
        self.coarse_mode = coarse_mode
        if use_pallas is None:
            use_pallas = jax.default_backend() == "tpu"
        self.use_pallas = use_pallas
        self.accept_all = False
        V, S, U, C = self.epis.shape
        self.dmin_s_v_u = shard_planes(
            jnp.full((S, V, U), self.dmin, DTYPE), mesh)
        self.dmax_s_v_u = shard_planes(
            jnp.full((S, V, U), self.dmax, DTYPE), mesh)
        self._bounds_edited = False
        self.state: Optional[Depth2DState] = None

    def set_accept_all(self, accept_all: bool):
        self.accept_all = accept_all

    def rebuild_bounds(self):
        """Reset the eager per-shard bound arrays to the ctor scalars
        (used when a scalar-bounds checkpoint is loaded into a computer
        whose bounds were previously edited)."""
        V, S, U, C = self.epis.shape
        self.dmin_s_v_u = shard_planes(
            jnp.full((S, V, U), self.dmin, DTYPE), self.mesh)
        self.dmax_s_v_u = shard_planes(
            jnp.full((S, V, U), self.dmax, DTYPE), self.mesh)
        self._bounds_edited = False

    def set_bounds(self, dmin_s_v_u, dmax_s_v_u):
        pad_v = self.epis.shape[0] - dmin_s_v_u.shape[1]
        if pad_v:
            cfg = ((0, 0), (0, pad_v), (0, 0))
            dmin_s_v_u = jnp.pad(dmin_s_v_u, cfg,
                                 constant_values=self.dmin)
            dmax_s_v_u = jnp.pad(dmax_s_v_u, cfg,
                                 constant_values=self.dmax)
        self.dmin_s_v_u = shard_planes(dmin_s_v_u, self.mesh)
        self.dmax_s_v_u = shard_planes(dmax_s_v_u, self.mesh)
        self._bounds_edited = True

    def run(self) -> Depth2DState:
        V, S, U, C = self.epis.shape
        mesh = self.mesh
        frames = shard_planes(jnp.transpose(self.epis, (1, 0, 2, 3)),
                              mesh)
        ce_vsu, mask_vsu = jax.jit(
            edge_confidence_volume, static_argnums=1)(
            self.epis, self.params)
        ce = shard_planes(jnp.transpose(ce_vsu, (1, 0, 2)), mesh)
        ce_mask = shard_planes(jnp.transpose(mask_vsu, (1, 0, 2)), mesh)

        state = Depth2DState(
            ce=ce,
            ce_mask=ce_mask,
            disp_conf=shard_planes(jnp.zeros((S, V, U), DTYPE), mesh),
            line_conf=shard_planes(jnp.zeros((S, V, U), DTYPE), mesh),
            best_depth=shard_planes(jnp.zeros((S, V, U), DTYPE), mesh),
            rbar=shard_planes(jnp.zeros((S, V, U, C), DTYPE), mesh),
            claim=shard_planes(ce_mask.copy(), mesh),
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

        fwd = sharded_schedule(
            mesh, self.dim_d, self.params, (self.dmin, self.dmax),
            use_pallas=self.use_pallas,
            uniform_bounds=not self._bounds_edited,
            pad_static=pad_static,
            coarse_mode=self.coarse_mode,
            early_stop=self.early_stop)

        schedule = center_outward_schedule(S)
        t0 = time.time()
        # off-TPU the whole schedule runs as ONE dispatch with the
        # on-device early stop (models.depth2d._schedule_fn's non-TPU
        # branch) — per-chunk dispatch + host sync on the virtual CPU
        # mesh costs seconds across a level; on TPU, chunked dispatches
        # avoid both the deferred-compile pathology and the runtime's
        # execution watchdog
        chunk = 8 if jax.default_backend() == "tpu" \
            else len(schedule)
        done = 0
        remaining = -1
        while done < len(schedule):
            part = schedule[done:done + chunk]
            done += len(part)
            state, _n_done, remaining = fwd(
                self.epis, frames, self.dmin_s_v_u, self.dmax_s_v_u,
                epis_padded, state, jnp.asarray(part, jnp.int32))
            remaining = int(remaining)
            if self.early_stop and remaining == 0:
                break
        self.state = jax.block_until_ready(state)
        if self.verbose:
            print(f"sharded schedule: {done}/{len(schedule)} "
                  f"passes, remaining px {remaining} "
                  f"({time.time() - t0:.1f}s)")
        return self.state

    # -- getters mirroring the single-device driver ---------------------

    def get_depths_s_v_u(self):
        return self.state.best_depth[:, :self._orig_v]

    def get_valid_depths_mask_s_v_u(self):
        if self.accept_all:
            return jnp.ones(self.state.ce.shape, bool)[:, :self._orig_v]
        p = self.params
        if p.score_version == "disp":
            return (self.state.disp_conf
                    > p.disp_score_threshold)[:, :self._orig_v]
        if p.score_version == "line":
            return (self.state.line_conf
                    > p.line_score_threshold)[:, :self._orig_v]
        return (self.state.ce
                > p.edge_score_threshold)[:, :self._orig_v]

    def get_epis(self):
        return self.epis[:self._orig_v]
