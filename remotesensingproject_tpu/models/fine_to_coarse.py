"""Fine-to-coarse pyramid driver.

TPU-native analog of FineToCoarse (rslf_fine_to_coarse.hpp:26-322):
build a chain of Depth2DComputers on progressively 2x-downsampled (v, u)
light fields (s untouched) until either spatial dim would drop to
min_spatial_dim, rescaling par_slope_factor to dim_u / start_dim_u per
level (:139); run fine-to-coarse, deriving per-pixel disparity bounds for
each coarser level from the nearest confident parents (:171-299); the last
level accepts all disparity measures (:156-158); finally fuse coarse-to-
fine (src/rslf_fine_to_coarse_core.cpp:69-135).

Note each level's Depth2DComputer normalizes ITS OWN input volume (the
reference downsamples the raw input and each computer picks its own global
max when epi_scale_factor < 0) — replicated.  uint8 inputs stay in the
rounded uint8 domain through the pyramid (OpenCV blurs/resizes CV_8U data
with saturate_cast rounding) — replicated via round-and-clamp per level.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DEFAULT_PARAMS, DEFAULT_PYRAMID, DepthParams, \
    PyramidParams
from ..ops.pyramid import bounds_from_parent, downsample_epis, fuse_disp_maps
from .depth2d import Depth2DComputer

# Module-level jitted wrappers: shared across FineToCoarse instances so
# repeat pipeline runs don't re-trace (see models.depth2d's caches).
_DS_JIT = jax.jit(downsample_epis)
_BOUNDS_JIT = jax.jit(bounds_from_parent)
_FUSE_JIT = jax.jit(fuse_disp_maps, static_argnums=2)


class FineToCoarse:
    def __init__(self, epis_v_s_u_c, dmin: float, dmax: float, dim_d: int,
                 epi_scale_factor: float = -1.0,
                 params: DepthParams = DEFAULT_PARAMS,
                 pyramid: PyramidParams = DEFAULT_PYRAMID,
                 use_pallas: Optional[bool] = None,
                 early_stop: bool = True,
                 verbose: bool = False,
                 pass_progress: Optional[bool] = None,
                 pass_chunk: int = 8,
                 mesh=None,
                 coarse_mode: str = "tile"):
        # verbose prints per-level lines; pass_progress additionally
        # prints per-pass-chunk progress INSIDE each level, which forces
        # the computers onto the chunked-dispatch path (the default
        # single-dispatch while_loop cannot report progress).
        if pass_progress is None:
            pass_progress = verbose
        epis = jnp.asarray(epis_v_s_u_c)
        if epis.ndim == 3:
            epis = epis[..., None]
        self.is_uint8 = epis.dtype == jnp.uint8
        raw = epis.astype(jnp.float32)

        self.params = params
        self.pyramid = pyramid
        self.verbose = verbose
        self.computers: List[Depth2DComputer] = []
        self.level_params: List[DepthParams] = []

        start_dim_u = raw.shape[2]
        max_depth = pyramid.max_pyr_depth
        if max_depth < 1:
            max_depth = np.iinfo(np.int32).max

        level = raw
        while (level.shape[0] > pyramid.min_spatial_dim
               and level.shape[2] > pyramid.min_spatial_dim
               and len(self.computers) < max_depth):
            lvl_params = params.with_slope_factor(
                level.shape[2] / start_dim_u)
            if verbose:
                print(f"level {len(self.computers)}: "
                      f"(v={level.shape[0]}, u={level.shape[2]}) "
                      f"slope_factor={lvl_params.slope_factor:.4f}")
            lvl_input = (level.astype(jnp.uint8) if self.is_uint8
                         else level)
            if mesh is not None:
                from ..parallel.driver import ShardedDepth2DComputer
                self.computers.append(ShardedDepth2DComputer(
                    lvl_input, dmin, dmax, dim_d, mesh=mesh,
                    epi_scale_factor=epi_scale_factor, params=lvl_params,
                    verbose=verbose, use_pallas=use_pallas,
                    early_stop=early_stop, coarse_mode=coarse_mode))
            else:
                self.computers.append(Depth2DComputer(
                    lvl_input, dmin, dmax, dim_d, epi_scale_factor,
                    lvl_params, verbose=pass_progress,
                    use_pallas=use_pallas,
                    early_stop=early_stop, pass_chunk=pass_chunk,
                    coarse_mode=coarse_mode))
            self.level_params.append(lvl_params)
            level = _DS_JIT(level)
            if self.is_uint8:
                # saturate_cast<uchar> rounding of the CV_8U pipeline
                level = jnp.clip(jnp.round(level), 0, 255)

        if pyramid.accept_all_last_scale:
            self.computers[-1].set_accept_all(True)

    def run(self, ckpt_dir: Optional[str] = None):
        """Run all levels fine-to-coarse, deriving per-pixel bounds.

        Args:
          ckpt_dir: when given, each completed level is checkpointed and
            previously saved levels are restored instead of recomputed
            (utils.checkpoint).
        """
        if ckpt_dir:
            from ..utils.checkpoint import run_with_checkpoints
            run_with_checkpoints(self, ckpt_dir)
            return
        import time as _time

        for p, computer in enumerate(self.computers):
            t0 = _time.time()
            computer.run()
            if self.verbose:
                print(f"level {p} done in {_time.time() - t0:.1f}s")
            if p < len(self.computers) - 1:
                nxt = self.computers[p + 1]
                dmin_new, dmax_new = _BOUNDS_JIT(
                    computer.get_depths_s_v_u(),
                    computer.get_valid_depths_mask_s_v_u(),
                    nxt.dmin_s_v_u, nxt.dmax_s_v_u)
                nxt.set_bounds(dmin_new, dmax_new)
            # r_bar is only read while the level's own passes paint;
            # dropping it frees [S, V, U, C] of HBM per level (~1.3 GB
            # across the RGB MansionLR pyramid) before fusion / the
            # next level's peak
            computer.state = computer.state._replace(
                rbar=jnp.zeros((1, 1, 1, 1), computer.state.rbar.dtype))

    def get_results(self) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Fused disparity maps + validity at the finest scale
        (rslf_fine_to_coarse.hpp:302-322)."""
        disp_pyr = [c.get_depths_s_v_u() for c in self.computers]
        validity_pyr = [c.get_valid_depths_mask_s_v_u()
                        for c in self.computers]
        return _FUSE_JIT(
            disp_pyr, validity_pyr,
            self.pyramid.final_median_filter_size)

    def get_coloured_depth_maps(self, colormap: str = "jet",
                                saturate: bool = True):
        """Colormapped fused maps (rslf_fine_to_coarse.hpp:324-377)."""
        from ..utils.plot import coloured_depth_maps
        fused, validity = self.get_results()
        return coloured_depth_maps(
            fused, validity, self.computers[0].get_epis(),
            self.params, colormap, saturate)

    def get_coloured_depth_maps_and_imgs(self, colormap: str = "jet",
                                         saturate: bool = True):
        """Depth maps juxtaposed with the input frames
        (rslf_fine_to_coarse.hpp:380-429)."""
        import numpy as np

        from ..utils.plot import ImageConverterUint8, side_by_side
        maps = self.get_coloured_depth_maps(colormap, saturate)
        epis = np.asarray(self.computers[0].get_epis())
        conv = ImageConverterUint8().fit(epis[:, 0], saturate=False)
        out = []
        for s in range(maps.shape[0]):
            frame = conv.copy_and_scale(epis[:, s])
            if frame.shape[-1] == 1:
                frame = frame[..., 0]
            out.append(side_by_side(frame, maps[s]))
        return out

    def get_coloured_epi_pyr(self, v: int = -1, colormap: str = "jet",
                             saturate: bool = True):
        """Per-level slope-coloured EPI at (scaled) row v
        (rslf_fine_to_coarse.hpp:431-487)."""
        import numpy as np

        from ..utils.plot import depth_pyramid_images
        V0 = self.computers[0].epis.shape[0]
        if v < 0:
            v = int(round(V0 / 2.0))
        slices, masks = [], []
        for c in self.computers:
            Vp = c.epis.shape[0]
            vs = int(round(v * Vp / V0))
            d = np.asarray(c.get_depths_s_v_u())[:, vs, :]
            m = np.asarray(c.get_valid_depths_mask_s_v_u())[:, vs, :]
            slices.append(np.where(m, d, 0.0))
            masks.append(m)
        return depth_pyramid_images(slices, masks, saturate, colormap)

    def get_coloured_depth_pyr(self, s: int = -1, colormap: str = "jet",
                               saturate: bool = True):
        """Per-level colormapped disparity maps at frame s
        (rslf_fine_to_coarse.hpp:490-518)."""
        import numpy as np

        from ..utils.plot import depth_pyramid_images
        S = self.computers[0].epis.shape[1]
        if s < 0:
            s = int(round(S / 2.0))
        slices = [np.asarray(c.get_depths_s_v_u())[s]
                  for c in self.computers]
        masks = [np.asarray(c.get_valid_depths_mask_s_v_u())[s]
                 for c in self.computers]
        return depth_pyramid_images(slices, masks, saturate, colormap)
