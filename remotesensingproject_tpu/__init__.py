"""remotesensingproject_tpu — TPU-native light-field depth engine.

A from-scratch JAX/XLA/Pallas implementation of the Kim et al. 2013
"Scene Reconstruction from High Spatio-Angular Resolution Light Fields"
depth-from-light-field pipeline, with the capabilities of the reference
RSLightFields C++/OpenCV/OpenMP library (reference layout documented in
include/rslf.hpp) re-designed for TPU:

* the light field is one dense ``[V, S, U, C]`` device array;
* the slope sweep is a dense vectorized computation (Pallas kernel on the
  hot path, XLA fallback for per-pixel disparity bounds);
* scaling is via ``jax.sharding`` meshes over the v (scanline) axis.

This module is the umbrella API (the analog of ``#include <rslf.hpp>``).
"""

from . import utils  # noqa: F401
from .config import DEFAULT_PARAMS, DEFAULT_PYRAMID, DepthParams, PyramidParams
from .types import DTYPE, SQRT3, norm, normsq
from .ops.normalize import normalize_volume
from .ops.edge_confidence import edge_confidence_volume
from .ops.sweep import sweep_epi, sweep_pile
from .models.depth1d import Depth1DComputer
from .models.pile import Depth1DComputerPile
from .models.depth2d import Depth2DComputer
from .models.fine_to_coarse import FineToCoarse

__version__ = "0.1.0"

__all__ = [
    "DEFAULT_PARAMS",
    "DEFAULT_PYRAMID",
    "DepthParams",
    "PyramidParams",
    "DTYPE",
    "SQRT3",
    "norm",
    "normsq",
    "normalize_volume",
    "edge_confidence_volume",
    "sweep_epi",
    "sweep_pile",
    "Depth1DComputer",
    "Depth1DComputerPile",
    "Depth2DComputer",
    "FineToCoarse",
]
