"""Sharded full-pipeline driver: Depth2DComputer over a device mesh.

Runs the complete 2-D propagation pipeline with every state plane
v-sharded (parallel/sharding.py) — the multi-chip / multi-host execution
of BASELINE configs 4-5.  Numerically identical to the single-device
driver (verified in tests): the sweep and propagation are shard-local,
the selective median exchanges row halos, the early-stop count is a
psum.

The default score version ("edge") is supported; line/disp variants run
on the single-device driver.
"""

from __future__ import annotations

import functools
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
from .sharding import shard_planes, shard_volume, sharded_pass


class ShardedDepth2DComputer:
    """Mesh-parallel Depth2DComputer (edge score version)."""

    def __init__(self, epis_v_s_u_c, dmin: float, dmax: float,
                 dim_d: int, mesh=None, epi_scale_factor: float = -1.0,
                 params: DepthParams = DEFAULT_PARAMS,
                 verbose: bool = False, early_stop: bool = True,
                 use_pallas: Optional[bool] = None):
        if params.score_version != "edge":
            raise NotImplementedError(
                "sharded driver supports the default edge score version")
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

        claim = shard_planes(ce_mask.copy(), mesh)
        best_depth = shard_planes(jnp.zeros((S, V, U), DTYPE), mesh)
        disp_conf = shard_planes(jnp.zeros((S, V, U), DTYPE), mesh)
        rbar = shard_planes(jnp.zeros((S, V, U, C), DTYPE), mesh)

        pass_fn = sharded_pass(mesh, self.dim_d, self.params,
                               (self.dmin, self.dmax),
                               use_pallas=self.use_pallas,
                               uniform_bounds=not self._bounds_edited)

        def plane(x, s):
            return jax.lax.dynamic_index_in_dim(x, s, 0, keepdims=False)

        for i, s_hat in enumerate(center_outward_schedule(S)):
            sh = jnp.int32(s_hat)
            (ce_new, mask_new, claim, best_depth, disp_conf, rbar,
             remaining) = pass_fn(
                self.epis, frames, plane(self.dmin_s_v_u, sh),
                plane(self.dmax_s_v_u, sh),
                plane(ce, sh), plane(ce_mask, sh), claim, best_depth,
                disp_conf, rbar, sh)
            ce = jax.lax.dynamic_update_index_in_dim(ce, ce_new, sh, 0)
            ce_mask = jax.lax.dynamic_update_index_in_dim(
                ce_mask, mask_new, sh, 0)
            if self.verbose:
                print(f"pass {i + 1}: s_hat={s_hat}")
            if self.early_stop and int(remaining) == 0:
                break

        self.state = Depth2DState(
            ce=ce, ce_mask=ce_mask, disp_conf=disp_conf,
            line_conf=jnp.zeros((S, V, U), DTYPE),
            best_depth=best_depth, rbar=rbar, claim=claim)
        return self.state

    def get_depths_s_v_u(self):
        return self.state.best_depth[:, :self._orig_v]

    def get_valid_depths_mask_s_v_u(self):
        if self.accept_all:
            return jnp.ones(self.state.ce.shape, bool)[:, :self._orig_v]
        return (self.state.ce
                > self.params.edge_score_threshold)[:, :self._orig_v]

    def get_epis(self):
        return self.epis[:self._orig_v]
