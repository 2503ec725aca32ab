"""Single-EPI depth computation (one v, one s_hat).

TPU-native analog of Depth1DComputer (rslf_depth_computation.hpp:256-416):
edge confidence + dense slope sweep on one EPI.  Unlike the pile driver it
applies NO selective median filter (Depth1DComputer::run at :325-371 calls
only compute_1D_edge_confidence and compute_1D_depth_epi).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..config import DEFAULT_PARAMS, DepthParams
from ..types import DTYPE
from ..ops.edge_confidence import edge_confidence_frame
from ..ops.normalize import normalize_volume
from ..ops.sweep import sweep_epi


class Depth1DResult(NamedTuple):
    edge_confidence: jnp.ndarray  # [U]
    edge_mask: jnp.ndarray        # [U] bool
    best_depth: jnp.ndarray       # [U]
    disp_confidence: jnp.ndarray  # [U]
    rbar: jnp.ndarray             # [U, C]


def _depth1d_forward(epi, dmin_u, dmax_u, s_hat, dim_d,
                     params: DepthParams):
    S, U, C = epi.shape
    s_hat = jnp.asarray(s_hat, jnp.int32)
    row = jax.lax.dynamic_index_in_dim(epi, s_hat, 0, keepdims=False)
    ce, mask = edge_confidence_frame(row[None, :, :], params)
    ce, mask = ce[0], mask[0]

    best_score, score_mean, best_depth, rbar, _ = sweep_epi(
        epi, dmin_u, dmax_u, dim_d, s_hat, params)

    ok = best_score > params.raw_score_threshold
    ce_out = jnp.where(mask & ~ok, 0.0, ce)
    mask_out = mask & ok
    depth = jnp.where(mask_out, best_depth, 0.0)
    conf = jnp.where(mask_out, ce * jnp.abs(best_score - score_mean), 0.0)
    rbar = jnp.where(mask_out[:, None], rbar, 0.0)
    return Depth1DResult(ce_out, mask_out, depth, conf, rbar)


class Depth1DComputer:
    """Driver mirroring Depth1DComputer's ctor/run/getters."""

    def __init__(self, epi_s_u_c, dmin: float, dmax: float, dim_d: int,
                 s_hat: int = -1, epi_scale_factor: float = -1.0,
                 params: DepthParams = DEFAULT_PARAMS):
        epi = jnp.asarray(epi_s_u_c)
        if epi.ndim == 2:
            epi = epi[..., None]
        self.epi = normalize_volume(epi, epi_scale_factor)
        S = self.epi.shape[0]
        self.s_hat = s_hat if 0 <= s_hat < S else int(S // 2)
        self.dim_d = dim_d
        self.dmin = float(dmin)
        self.dmax = float(dmax)
        self.params = params
        self.result: Optional[Depth1DResult] = None

    def run(self) -> Depth1DResult:
        S, U, C = self.epi.shape
        dmin_u = jnp.full((U,), self.dmin, DTYPE)
        dmax_u = jnp.full((U,), self.dmax, DTYPE)
        fwd = jax.jit(functools.partial(
            _depth1d_forward, dim_d=self.dim_d, params=self.params))
        self.result = jax.block_until_ready(
            fwd(self.epi, dmin_u, dmax_u, jnp.int32(self.s_hat)))
        return self.result

    def get_coloured_epi(self, colormap: str = "jet"):
        """EPI with disparity-coloured line overlays
        (rslf_depth_computation.hpp:373-416)."""
        from ..utils.plot import coloured_epi_lines
        return coloured_epi_lines(self.epi, self.result, self.s_hat,
                                  self.params, colormap)
