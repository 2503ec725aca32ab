"""Device mesh construction."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


V_AXIS = "v"


def make_mesh(n_devices: Optional[int] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    """1-D mesh over the scanline (v) axis.

    The light field's v axis is the natural data-parallel axis (each EPI
    is independent through the sweep and propagation); a 1-D mesh
    suffices up to hundreds of chips since V is typically 500-2000.
    """
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (V_AXIS,))
