"""Device mesh construction."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


V_AXIS = "v"
U_AXIS = "u"


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


def make_mesh_2d(shape=(2, 4), devices=None) -> Mesh:
    """2-D (v, u) mesh for VERY WIDE frames (SURVEY §7 step 7).

    v stays the primary data-parallel axis; the u axis additionally
    splits image columns, with the shear gather / propagation reading
    across the split through a u-halo of ceil(max|s_hat-s| * d_max *
    slope) + 1 columns (parallel/sharding2d.py).
    """
    if devices is None:
        devices = jax.devices()
    n = int(np.prod(shape))
    return Mesh(np.asarray(devices[:n]).reshape(shape), (V_AXIS, U_AXIS))
