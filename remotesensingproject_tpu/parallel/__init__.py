"""Multi-chip / multi-host scaling.

The reference's only parallelism is an OpenMP ``parallel for`` over v —
the EPI-row axis (rslf_depth_computation_core.hpp:799).  Here v becomes
the sharded axis of a ``jax.sharding.Mesh``: every stage of the pipeline
is v-independent except the (v, u)-windowed ops (selective median,
Gaussian pyramid blur), which exchange row halos over ICI via ppermute,
and the global reductions (normalization max, remaining-pixel counts,
pyramid fusion), which are psum/pmax collectives.
"""

from .mesh import make_mesh
from .sharding import shard_volume, sharded_pass, exchange_v_halo

__all__ = ["make_mesh", "shard_volume", "sharded_pass",
           "exchange_v_halo"]
