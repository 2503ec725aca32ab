"""Worker for the 2-process jax.distributed smoke test.

Launched by tests/test_multihost.py as
``python multihost_worker.py <pid> <nprocs> <port> <outdir>``.
Each process owns 2 virtual CPU devices (4-device global mesh), loads
only ITS scanline block, assembles the global arrays with
parallel.distributed, runs one sharded pass, and compares the
all-gathered result against the same pass computed single-device on the
full volume.  Writes "<outdir>/ok_<pid>" on success.
"""

import os
import sys

pid = int(sys.argv[1])
nprocs = int(sys.argv[2])
port = sys.argv[3]
outdir = sys.argv[4]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2")
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# multi-process CPU collectives ride the coordination service via gloo
jax.config.update("jax_cpu_collectives_implementation", "gloo")
jax.distributed.initialize(f"127.0.0.1:{port}", num_processes=nprocs,
                           process_id=pid)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import multihost_utils  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import oracle  # noqa: E402

from remotesensingproject_tpu.config import DepthParams  # noqa: E402
from remotesensingproject_tpu.ops.edge_confidence import (  # noqa: E402
    edge_confidence_volume)
from remotesensingproject_tpu.ops.normalize import (  # noqa: E402
    normalize_volume)
from remotesensingproject_tpu.parallel import distributed as dist  # noqa: E402
from remotesensingproject_tpu.parallel.sharding import (  # noqa: E402
    sharded_pass)

assert jax.process_count() == nprocs, jax.process_count()
assert len(jax.devices()) == 2 * nprocs, jax.devices()

S, V, U, C = 5, 8, 32, 1
dmin, dmax, dim_d = -1.0, 1.5, 5
params = DepthParams()
s_hat = 2

vol, _ = oracle.make_synthetic_lf(S=S, V=V, U=U, C=C, n_objects=3,
                                  seed=0, dmin=dmin, dmax=dmax)
epis_full = np.asarray(vol, np.float32) / np.asarray(vol).max()

mesh = dist.global_mesh()
lo, hi = dist.local_v_range(V, mesh)
# each process feeds ONLY its own scanline block
epis = dist.volume_from_local(epis_full[lo:hi], V, mesh)

frames_local = np.transpose(epis_full[lo:hi], (1, 0, 2, 3))
frames = dist.planes_from_local(frames_local, V, mesh)

ce_vsu, mask_vsu = jax.jit(edge_confidence_volume, static_argnums=1)(
    epis, params)
ce = jnp.transpose(ce_vsu, (1, 0, 2))
ce_mask = jnp.transpose(mask_vsu, (1, 0, 2))

from remotesensingproject_tpu.models.depth2d import (  # noqa: E402
    Depth2DState)

state = Depth2DState(
    ce=ce, ce_mask=ce_mask,
    disp_conf=jnp.zeros_like(ce),
    line_conf=jnp.zeros_like(ce),
    best_depth=jnp.zeros_like(ce),
    rbar=jnp.zeros(ce.shape + (C,), jnp.float32),
    claim=ce_mask.copy())
sharding_sv = ce.sharding
dmin_svu = jax.device_put(jnp.full((S, V, U), np.float32(dmin)),
                          sharding_sv)
dmax_svu = jax.device_put(jnp.full((S, V, U), np.float32(dmax)),
                          sharding_sv)

pass_fn = sharded_pass(mesh, dim_d, params, (dmin, dmax),
                       use_pallas=False)
got, remaining = pass_fn(epis, frames, dmin_svu, dmax_svu,
                         jnp.zeros((1,), jnp.float32), state,
                         jnp.int32(s_hat))

got_depth = multihost_utils.process_allgather(got.best_depth,
                                              tiled=True)
got_claim = multihost_utils.process_allgather(got.claim, tiled=True)
rem = int(remaining)

# single-device reference: the same pass on the full volume, unsharded
from remotesensingproject_tpu.models.depth2d import (  # noqa: E402
    Depth2DState, _pass_fn)

with jax.default_device(jax.local_devices()[0]):
    epis_l = jnp.asarray(epis_full)
    frames_l = jnp.transpose(epis_l, (1, 0, 2, 3))
    ce_l, mask_l = edge_confidence_volume(epis_l, params)
    ce_l = jnp.transpose(ce_l, (1, 0, 2))
    mask_l = jnp.transpose(mask_l, (1, 0, 2))
    state = Depth2DState(
        ce=ce_l, ce_mask=mask_l,
        disp_conf=jnp.zeros_like(ce_l),
        line_conf=jnp.zeros_like(ce_l),
        best_depth=jnp.zeros_like(ce_l),
        rbar=jnp.zeros(ce_l.shape + (C,), jnp.float32),
        claim=mask_l.copy())
    full_min = jnp.full((S, V, U), np.float32(dmin))
    full_max = jnp.full((S, V, U), np.float32(dmax))
    state = _pass_fn(epis_l, frames_l, full_min, full_max,
                     jnp.zeros((1,), jnp.float32), state,
                     jnp.int32(s_hat), dim_d=dim_d, params=params,
                     d_bounds=(dmin, dmax), use_pallas=False,
                     uniform_bounds=True)
    want_depth = np.asarray(state.best_depth)
    want_claim = np.asarray(state.claim)
    # full-volume remaining count (the schedule's early-stop metric)
    want_rem = int(np.sum(np.asarray(state.ce_mask) & want_claim))

assert np.array_equal(np.asarray(got_depth), want_depth), \
    "sharded multihost depth != single-device depth"
assert np.array_equal(np.asarray(got_claim), want_claim), \
    "sharded multihost claim != single-device claim"
assert rem == want_rem, (rem, want_rem)

with open(os.path.join(outdir, f"ok_{pid}"), "w") as f:
    f.write("ok\n")
print(f"process {pid}: parity ok (remaining={rem})")
