"""Input normalization to float32 in ~[0, 1].

Mirrors the Depth*Computer constructors (rslf_depth_computation.hpp:269-289
for the single-EPI case, :669-704 for the 2-D case): uint8 inputs are
scaled by 1/255; other dtypes are scaled by 1/global-max over the whole
volume and all channels, unless an explicit positive scale factor is given.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..types import DTYPE


def volume_scale_factor(volume) -> jnp.ndarray:
    """Global max over the volume, the reference's auto scale factor.

    The reference takes max over every EPI and channel
    (rslf_depth_computation.hpp:669-687 — note it calls minMaxLoc on the
    full multi-channel EPI, so the max is over all channels).
    """
    return jnp.max(volume).astype(DTYPE)


def normalize_volume(volume, scale_factor: float = -1.0) -> jnp.ndarray:
    """Normalize an input light-field volume to float32.

    Args:
      volume: any-shape array; uint8 or float.
      scale_factor: if > 0, divide by it; otherwise use the global max
        (ignored for uint8, which always uses 255).
    """
    if volume.dtype == jnp.uint8:
        return volume.astype(DTYPE) / 255.0
    v = volume.astype(DTYPE)
    if scale_factor is not None and scale_factor > 0:
        return v / DTYPE(scale_factor)
    return v / volume_scale_factor(v)
