"""Dtype conventions, norm conventions and small numeric helpers.

TPU-native re-design of the reference's type toolbox
(reference: include/rslf_types.hpp, src/rslf_types.cpp).

Conventions adopted from the reference (kept for bit-parity of thresholds):

* All compute is float32 (the reference normalizes every input to CV_32F,
  rslf_depth_computation.hpp:269-289).
* The light field is one dense array.  Canonical layouts:
    - EPI volume   : ``[V, S, U, C]``  (V EPIs of shape S x U, C channels)
    - frame volume : ``[S, V, U, C]``  (S frames of shape V x U)
  with  s = temporal/angular index, v = image row, u = image column.
* 1-channel norms are scaled by sqrt(3) so that 1-ch and 3-ch data share
  the same thresholds (reference: src/rslf_types.cpp:80-91 and
  src/rslf_kernels.cpp:12,21; rationale in report/rs_report.tex:357-361).
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

DTYPE = jnp.float32

#: sqrt(3) constant used by the reference for 1-channel norm scaling
#: (src/rslf_types.cpp:84 uses the literal 1.73205080757).
SQRT3 = 1.73205080757


def chan_scale(num_channels: int) -> float:
    """Scale applied to sums of squared per-channel values.

    The reference multiplies squared 1-ch values by 3 so that thresholds
    tuned for 3-channel (RGB) data apply unchanged
    (src/rslf_kernels.cpp:12,21).  For 3-channel data no extra scale is
    applied (the channel sum itself provides the factor).
    """
    return 3.0 if num_channels == 1 else 1.0


def normsq(x, axis: int = -1):
    """Squared norm over the channel axis with the reference's scaling.

    ``normsq(x) == norm(x)**2`` where ``norm`` matches
    rslf::norm<float> (|x| * sqrt(3)) for 1 channel and
    rslf::norm<cv::Vec3f> (L2) for 3 channels (src/rslf_types.cpp:80-91).
    """
    c = x.shape[axis]
    return chan_scale(c) * jnp.sum(jnp.square(x), axis=axis)


def norm(x, axis: int = -1):
    """Channel norm matching rslf::norm (src/rslf_types.cpp:80-91)."""
    return jnp.sqrt(normsq(x, axis=axis))


def round_half_away(x):
    """Round half away from zero, matching C++ std::round.

    ``jnp.round`` rounds half-to-even; the reference's propagation step
    uses std::round (rslf_depth_computation_core.hpp:1109), which rounds
    half away from zero.
    """
    return jnp.sign(x) * jnp.floor(jnp.abs(x) + 0.5)


def round_half_away_np(x):
    """NumPy version of :func:`round_half_away`."""
    return np.sign(x) * np.floor(np.abs(x) + 0.5)


def cv_round(x: float) -> int:
    """Round-half-to-even to int, matching OpenCV's cvRound.

    Used where the reference relies on cvRound via cv::resize size
    computation (src/rslf_fine_to_coarse_core.cpp:41).
    """
    return int(np.rint(x))


def ensure_channel_axis(a):
    """Append a trailing channel axis to an array lacking one (C in {1,3})."""
    if a.ndim == 0:
        raise ValueError("scalar input")
    if a.shape[-1] in (1, 3) and a.ndim >= 3:
        return a
    return a[..., None]


SHADOW_NORMALIZED_LEVEL = 0.05 * SQRT3
"""Shadow cut-off on the per-pixel norm (core.hpp:31)."""
