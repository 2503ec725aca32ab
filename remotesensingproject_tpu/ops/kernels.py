"""Radiance-consistency score kernel.

TPU-native equivalent of rslf::BandwidthKernel
(include/rslf_kernels.hpp + src/rslf_kernels.cpp): the truncated parabolic
kernel K(x) = max(0, 1 - ||x/h||^2), with the 1-channel squared norm scaled
by 3 for threshold parity with RGB (src/rslf_kernels.cpp:12,21) and
NaN inputs mapped to 0 (the reference gets this via cv::max with 0,
src/rslf_kernels.cpp:25,53 — jnp.maximum propagates NaN, so we mask
explicitly).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..types import chan_scale


def bandwidth_kernel(diff, h: float, axis: int = -1):
    """Evaluate K(diff) reducing over the channel axis.

    Args:
      diff: ``[..., C]`` radiance differences (may contain NaN).
      h: bandwidth (par kernel h, default 0.2, core.hpp:26).
      axis: channel axis.

    Returns:
      ``[...]`` kernel values in [0, 1]; NaN slots give 0.
    """
    c = diff.shape[axis]
    scaled_sq = (chan_scale(c) / (h * h)) * jnp.sum(jnp.square(diff), axis=axis)
    k = 1.0 - scaled_sq
    # NaN in diff makes scaled_sq NaN; both clamping branches must yield 0.
    return jnp.where(jnp.isnan(k), 0.0, jnp.maximum(k, 0.0))


def bandwidth_kernel_masked(diff, valid, h: float, axis: int = -1):
    """NaN-free variant: `valid` marks real samples, invalid slots give 0.

    Equivalent to :func:`bandwidth_kernel` when ``diff`` has had NaNs
    replaced by arbitrary finite values and ``valid`` is the non-NaN mask.
    Preferred inside Pallas kernels where NaN propagation is a footgun.
    """
    c = diff.shape[axis]
    scaled_sq = (chan_scale(c) / (h * h)) * jnp.sum(jnp.square(diff), axis=axis)
    return jnp.where(valid, jnp.maximum(1.0 - scaled_sq, 0.0), 0.0)
