"""Single-pass depth over all EPI rows (one s_hat, all v).

TPU-native analog of Depth1DComputer_pile
(rslf_depth_computation.hpp:425-641): normalize, edge confidence at s_hat,
dense slope sweep over every (v, u), selective median filter.  This is the
minimal end-to-end slice of the pipeline (reference call stack §3.3) and
the unit the Pallas kernel accelerates.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..config import DEFAULT_PARAMS, DepthParams
from ..types import DTYPE
from ..ops.edge_confidence import edge_confidence_frame
from ..ops.median import selective_median
from ..ops.normalize import normalize_volume
from ..ops.sweep import sweep_pile


class PileResult(NamedTuple):
    edge_confidence: jnp.ndarray   # [V, U] (post-sweep zeroing)
    edge_mask: jnp.ndarray         # [V, U] bool
    best_depth: jnp.ndarray        # [V, U] median-filtered disparities
    best_depth_raw: jnp.ndarray    # [V, U] pre-filter sweep disparities
    disp_confidence: jnp.ndarray   # [V, U]
    rbar: jnp.ndarray              # [V, U, C]


def _pile_forward(epis, dmin_v_u, dmax_v_u, s_hat, dim_d,
                  params: DepthParams, use_pallas: bool,
                  d_bounds=None):
    """Jittable single-pass pile computation.

    Args:
      epis: ``[V, S, U, C]`` normalized volume.
      d_bounds: static (dmin, dmax) floats; when given and use_pallas,
        the uniform-bounds Pallas kernel serves the sweep.
    """
    V, S, U, C = epis.shape
    s_hat = jnp.asarray(s_hat, jnp.int32)

    frame = jax.lax.dynamic_index_in_dim(
        jnp.transpose(epis, (1, 0, 2, 3)), s_hat, 0, keepdims=False)
    ce, mask = edge_confidence_frame(frame, params)

    if use_pallas and d_bounds is not None and \
            params.interpolation == "linear":
        from ..ops.sweep_pallas import sweep_pile_pallas
        res = sweep_pile_pallas(epis, d_bounds[0], d_bounds[1], dim_d,
                                s_hat, params)
    else:
        res = sweep_pile(epis, dmin_v_u, dmax_v_u, dim_d, s_hat, params)

    # Sub-threshold max scores zero the confidence and mask
    # (core.hpp:653-657); computed only on masked pixels.
    ok = res.best_score > params.raw_score_threshold
    ce_out = jnp.where(mask & ~ok, 0.0, ce)
    mask_out = mask & ok

    best_raw = jnp.where(mask_out, res.best_depth, 0.0)
    disp_conf = jnp.where(
        mask_out, ce * jnp.abs(res.best_score - res.score_mean), 0.0)
    rbar = jnp.where(mask_out[..., None], res.rbar, 0.0)

    # Selective median over the (v, u) disparity slice (core.hpp:877-892),
    # gated by the post-sweep edge mask and the s_hat frame radiances.
    filtered = selective_median(best_raw, frame, mask_out,
                                params.median_filter_size,
                                params.median_filter_epsilon)
    return PileResult(ce_out, mask_out, filtered, best_raw, disp_conf, rbar)


class Depth1DComputerPile:
    """Driver object mirroring Depth1DComputer_pile's ctor/run/getters."""

    def __init__(self, epis_v_s_u_c, dmin: float, dmax: float, dim_d: int,
                 s_hat: int = -1, epi_scale_factor: float = -1.0,
                 params: DepthParams = DEFAULT_PARAMS,
                 use_pallas: Optional[bool] = None):
        epis = jnp.asarray(epis_v_s_u_c)
        if epis.ndim == 3:
            epis = epis[..., None]
        self.epis = normalize_volume(epis, epi_scale_factor)
        V, S, U, C = self.epis.shape
        # default s_hat: floor(S / 2) (rslf_depth_computation.hpp:305)
        self.s_hat = s_hat if 0 <= s_hat < S else int(S // 2)
        self.dim_d = dim_d
        self.dmin = float(dmin)
        self.dmax = float(dmax)
        self.params = params
        if use_pallas is None:
            use_pallas = jax.default_backend() == "tpu"
        self.use_pallas = use_pallas
        self.result: Optional[PileResult] = None

    def run(self) -> PileResult:
        V, S, U, C = self.epis.shape
        dmin_v_u = jnp.full((V, U), self.dmin, DTYPE)
        dmax_v_u = jnp.full((V, U), self.dmax, DTYPE)
        fwd = jax.jit(functools.partial(
            _pile_forward, dim_d=self.dim_d, params=self.params,
            use_pallas=self.use_pallas,
            d_bounds=(self.dmin, self.dmax)))
        self.result = jax.block_until_ready(
            fwd(self.epis, dmin_v_u, dmax_v_u, jnp.int32(self.s_hat)))
        return self.result

    # -- getters mirroring the reference's render API -------------------

    def get_depths(self):
        return self.result.best_depth

    def get_coloured_epi(self, v: int = -1, colormap: str = "jet"):
        """Colour EPI at row v (rslf_depth_computation.hpp:567-618)."""
        from ..utils.plot import coloured_epi_from_pile
        V = self.epis.shape[0]
        if v < 0:
            v = V // 2
        return coloured_epi_from_pile(self, v, colormap)

    def get_disparity_map(self, colormap: str = "jet"):
        """Colormapped disparity map, masked by edge confidence
        (rslf_depth_computation.hpp:620-641)."""
        from ..utils.plot import disparity_map_image
        return disparity_map_image(self.result.best_depth,
                                   self.result.edge_mask, colormap)
