"""Multi-host initialization and host-sharded ingest.

The reference is single-process (OpenMP only; SURVEY §2).  For pod-slice
runs, ``initialize()`` wires jax.distributed and the process-local slice
of the v axis; arrays are assembled with
``jax.make_array_from_process_local_data`` so each host only loads its
own scanline block from disk.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import V_AXIS


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """jax.distributed.initialize passthrough (env-var driven when args
    are None)."""
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def global_mesh() -> Mesh:
    """1-D global mesh over all devices of all hosts."""
    return Mesh(np.asarray(jax.devices()), (V_AXIS,))


def local_v_range(total_v: int, mesh: Mesh) -> Tuple[int, int]:
    """The [lo, hi) slice of the v axis this process should load.

    v is block-partitioned over the global device order; a host owns the
    union of its devices' blocks (contiguous for the standard ordering).
    """
    devices = list(mesh.devices.ravel())
    n = len(devices)
    block = -(-total_v // n)
    mine = [i for i, d in enumerate(devices)
            if d.process_index == jax.process_index()]
    lo = min(mine) * block
    hi = min(total_v, (max(mine) + 1) * block)
    return lo, hi


def volume_from_local(local_epis_v_s_u_c, total_v: int, mesh: Mesh):
    """Assemble the global v-sharded volume from this host's block."""
    shape = (total_v,) + tuple(local_epis_v_s_u_c.shape[1:])
    sharding = NamedSharding(mesh, P(V_AXIS, None, None, None))
    return jax.make_array_from_process_local_data(
        sharding, np.asarray(local_epis_v_s_u_c), shape)


def planes_from_local(local_s_v_u, total_v: int, mesh: Mesh):
    """Assemble global [S, V, U(, C)] state planes (v on axis 1) from
    this host's [S, local_V, U(, C)] block."""
    shape = (local_s_v_u.shape[0], total_v) + tuple(
        local_s_v_u.shape[2:])
    spec = P(None, V_AXIS, *([None] * (local_s_v_u.ndim - 2)))
    return jax.make_array_from_process_local_data(
        NamedSharding(mesh, spec), np.asarray(local_s_v_u), shape)
