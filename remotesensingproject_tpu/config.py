"""Algorithm configuration.

One dataclass replaces the reference's three config tiers: the compile-time
``#define`` defaults (rslf_depth_computation_core.hpp:15-37), the runtime
``Depth1DParameters`` struct (core.hpp:63-142) and the ``#ifdef`` feature
flags ``_USE_DISP_CONFIDENCE_SCORE`` / ``_USE_LINE_CONFIDENCE_SCORE``
(core.hpp:35-37), which become the runtime ``score_version`` field.
"""

from __future__ import annotations

import dataclasses
from typing import Literal

from .types import SHADOW_NORMALIZED_LEVEL


@dataclasses.dataclass(frozen=True)
class DepthParams:
    """All scalar parameters of the Kim'13 depth pipeline.

    Defaults mirror the reference exactly
    (rslf_depth_computation_core.hpp:15-37 and the ctor at :74-99).
    """

    # Strategy selection (core.hpp:76-78: linear interpolation + bandwidth
    # kernel are the defaults; nearest-neighbour kept as an option).
    interpolation: Literal["linear", "nearest"] = "linear"

    # _BANDWIDTH_KERNEL_PARAMETER (core.hpp:26)
    kernel_h: float = 0.2

    # _EDGE_SCORE_THRESHOLD (core.hpp:20)
    edge_score_threshold: float = 0.02
    # _LINE_SCORE_THRESHOLD (core.hpp:21)
    line_score_threshold: float = 0.02
    # _DISP_SCORE_THRESHOLD (core.hpp:22)
    disp_score_threshold: float = 0.01
    # _RAW_SCORE_THRESHOLD (core.hpp:23)
    raw_score_threshold: float = 0.0

    # _MEAN_SHIFT_MAX_ITER (core.hpp:16)
    mean_shift_max_iter: int = 10

    # _EDGE_CONFIDENCE_FILTER_SIZE (core.hpp:17)
    edge_confidence_filter_size: int = 9
    # _EDGE_CONFIDENCE_OPENING_SIZE (core.hpp:29); opening applied only
    # when > 1 (core.hpp:759-769), and the default of 1 disables it.
    edge_confidence_opening_size: int = 1

    # _MEDIAN_FILTER_SIZE (core.hpp:18)
    median_filter_size: int = 5
    # _MEDIAN_FILTER_EPSILON (core.hpp:19)
    median_filter_epsilon: float = 0.1
    # _PROPAGATION_EPSILON (core.hpp:24)
    propagation_epsilon: float = 0.1

    # par_slope_factor (core.hpp:95); rescaled per pyramid level to
    # dim_u / start_dim_u (rslf_fine_to_coarse.hpp:139).
    slope_factor: float = 1.0

    # par_cut_shadows / par_shadow_level (core.hpp:97-98, :31)
    cut_shadows: bool = True
    shadow_level: float = SHADOW_NORMALIZED_LEVEL

    # Propagation / validity criterion.  "edge" is the reference's
    # compiled-in default (neither _USE_DISP_CONFIDENCE_SCORE nor
    # _USE_LINE_CONFIDENCE_SCORE defined, core.hpp:35-37).
    score_version: Literal["edge", "disp", "line"] = "edge"

    # Fast mode: cap the truncated mean shift of the PIXEL Pallas sweep
    # at 5 iterations instead of the reference's 10 (core.hpp:16;
    # convergence typically lands at ~6).  Not bit-exact vs the
    # reference — gated instead by the REF_ANCHOR quality margin in
    # bench.py and the fast-vs-exact A/B in scripts/tpu_acceptance.py
    # (measured: 1.2x kernel speedup, 99.6% of argmax picks unchanged).
    # No effect on the XLA (oracle) path or the dense-row kernel.
    # (A bfloat16 mean-shift fast path was implemented and measured
    # SLOWER on the v5e — no native bf16 elementwise rate; docs/PERF.md.)
    fast: bool = False

    def with_slope_factor(self, slope_factor: float) -> "DepthParams":
        return dataclasses.replace(self, slope_factor=slope_factor)


@dataclasses.dataclass(frozen=True)
class PyramidParams:
    """Fine-to-coarse pyramid constants.

    Defaults mirror rslf_fine_to_coarse.hpp:8 and
    src/rslf_fine_to_coarse_core.cpp:4-5.
    """

    # _MIN_SPATIAL_DIM (rslf_fine_to_coarse.hpp:8)
    min_spatial_dim: int = 10
    # _GAUSSIAN_KSIZE (rslf_fine_to_coarse_core.cpp:4)
    gaussian_ksize: int = 7
    # _FINAL_MEDIAN_FILTER_SIZE (rslf_fine_to_coarse_core.cpp:5)
    final_median_filter_size: int = 3
    # max_pyr_depth ctor arg (rslf_fine_to_coarse.hpp:38); <1 means no limit
    max_pyr_depth: int = -1
    # accept_all_last_scale ctor arg (rslf_fine_to_coarse.hpp:39)
    accept_all_last_scale: bool = True


DEFAULT_PARAMS = DepthParams()
DEFAULT_PYRAMID = PyramidParams()
