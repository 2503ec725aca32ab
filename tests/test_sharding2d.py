"""2-D (v, u) mesh sharding with u-halo exchange: exactness vs the
single-device driver and vs the 1-D v-mesh (SURVEY §7 step 7)."""

import numpy as np
import pytest

import oracle

import jax
import jax.numpy as jnp

from remotesensingproject_tpu.config import DepthParams
from remotesensingproject_tpu.models.depth2d import (
    Depth2DComputer, Depth2DState, center_outward_schedule)
from remotesensingproject_tpu.ops.edge_confidence import (
    edge_confidence_volume)
from remotesensingproject_tpu.parallel.mesh import make_mesh_2d
from remotesensingproject_tpu.parallel.sharding2d import (
    shard_planes_2d, shard_volume_2d, sharded_schedule_2d)

S, V, U, C = 6, 16, 64, 1
DMIN, DMAX, DIM_D = -1.0, 1.5, 5


def _run_2d(vol, mesh_shape=(2, 4), use_pallas=False):
    params = DepthParams()
    epis = jnp.asarray(vol) / jnp.max(jnp.asarray(vol))
    frames = jnp.transpose(epis, (1, 0, 2, 3))
    ce_vsu, mask_vsu = edge_confidence_volume(epis, params)
    ce = jnp.transpose(ce_vsu, (1, 0, 2))
    mask = jnp.transpose(mask_vsu, (1, 0, 2))

    mesh = make_mesh_2d(mesh_shape)
    epis_sh = shard_volume_2d(epis, mesh)
    frames_sh = shard_planes_2d(frames, mesh)

    def sp(x):
        return shard_planes_2d(x, mesh)

    state = Depth2DState(
        ce=sp(ce), ce_mask=sp(mask),
        disp_conf=sp(jnp.zeros((S, V, U))),
        line_conf=sp(jnp.zeros((S, V, U))),
        best_depth=sp(jnp.zeros((S, V, U))),
        rbar=sp(jnp.zeros((S, V, U, C))),
        claim=sp(mask.copy()))
    dmin_sh = sp(jnp.full((S, V, U), DMIN, jnp.float32))
    dmax_sh = sp(jnp.full((S, V, U), DMAX, jnp.float32))

    fwd = sharded_schedule_2d(mesh, DIM_D, params, (DMIN, DMAX),
                              u_global=U, use_pallas=use_pallas)
    schedule = center_outward_schedule(S)
    done = 0
    while done < len(schedule):
        part = schedule[done:done + 4]
        done += len(part)
        state, _n, remaining = fwd(
            epis_sh, frames_sh, dmin_sh, dmax_sh,
            jnp.zeros((1,), jnp.float32), state,
            jnp.asarray(part, jnp.int32))
    return state, int(remaining)


def test_2d_mesh_matches_single_device():
    vol, _ = oracle.make_synthetic_lf(S=S, V=V, U=U, C=C, n_objects=3,
                                      seed=9, dmin=DMIN, dmax=DMAX)
    single = Depth2DComputer(jnp.asarray(vol), DMIN, DMAX, DIM_D,
                             use_pallas=False, early_stop=False,
                             pass_chunk=4)
    ss = single.run()
    got, remaining = _run_2d(vol)

    assert (np.asarray(got.claim) == np.asarray(ss.claim)).all()
    assert (np.asarray(got.ce_mask) == np.asarray(ss.ce_mask)).all()
    assert np.allclose(np.asarray(got.ce), np.asarray(ss.ce), atol=1e-6)
    assert np.allclose(np.asarray(got.best_depth),
                       np.asarray(ss.best_depth), atol=1e-6)
    assert np.allclose(np.asarray(got.disp_conf),
                       np.asarray(ss.disp_conf), atol=1e-5)
    assert remaining == int(jnp.sum(
        (ss.ce_mask & ss.claim).astype(jnp.int32)))


def test_2d_mesh_matches_1d_mesh():
    """(2, 4) mesh == (8,) v-mesh bit for bit (the u split with halo
    exchange is exact, not approximate)."""
    from remotesensingproject_tpu.parallel.driver import (
        ShardedDepth2DComputer)

    vol, _ = oracle.make_synthetic_lf(S=S, V=V, U=U, C=C, n_objects=3,
                                      seed=13, dmin=DMIN, dmax=DMAX)
    oned = ShardedDepth2DComputer(jnp.asarray(vol), DMIN, DMAX, DIM_D,
                                  use_pallas=False, early_stop=False)
    sd = oned.run()
    got, _ = _run_2d(vol)
    assert (np.asarray(got.claim) == np.asarray(sd.claim)).all()
    assert np.allclose(np.asarray(got.best_depth),
                       np.asarray(sd.best_depth), atol=1e-6)
    assert np.allclose(np.asarray(got.disp_conf),
                       np.asarray(sd.disp_conf), atol=1e-5)


@pytest.mark.parametrize("mesh_shape", [(4, 2), (1, 4)])
def test_2d_mesh_shapes(mesh_shape):
    """Other mesh factorizations agree too (u-only split included).
    (1, 8) would give 8-column shards, narrower than the 10-column
    sweep halo — exchange_halo rejects that at trace time by design."""
    vol, _ = oracle.make_synthetic_lf(S=S, V=V, U=U, C=C, n_objects=3,
                                      seed=21, dmin=DMIN, dmax=DMAX)
    single = Depth2DComputer(jnp.asarray(vol), DMIN, DMAX, DIM_D,
                             use_pallas=False, early_stop=False,
                             pass_chunk=4)
    ss = single.run()
    got, _ = _run_2d(vol, mesh_shape)
    assert (np.asarray(got.claim) == np.asarray(ss.claim)).all()
    assert np.allclose(np.asarray(got.best_depth),
                       np.asarray(ss.best_depth), atol=1e-6)


def test_2d_mesh_pallas_route_matches_single_device():
    """use_pallas=True runs the PIXEL kernel on u-haloed blocks
    (round-4 verdict #6): interpret-mode parity vs the single-device
    Pallas pipeline — the u_valid window must reproduce the unsharded
    operator's out-of-image semantics exactly."""
    vol, _ = oracle.make_synthetic_lf(S=S, V=V, U=U, C=C, n_objects=3,
                                      seed=9, dmin=DMIN, dmax=DMAX)
    single = Depth2DComputer(jnp.asarray(vol), DMIN, DMAX, DIM_D,
                             use_pallas=True, early_stop=False,
                             pass_chunk=4)
    ss = single.run()
    got, _ = _run_2d(vol, use_pallas=True)
    assert (np.asarray(got.claim) == np.asarray(ss.claim)).all()
    assert np.allclose(np.asarray(got.best_depth),
                       np.asarray(ss.best_depth), atol=1e-6)
    assert np.allclose(np.asarray(got.disp_conf),
                       np.asarray(ss.disp_conf), atol=1e-5)


def test_2d_mesh_pallas_u_only_split():
    """(1, 4) u-only mesh on the Pallas route: every pixel's sweep
    reads across shard borders through the halo."""
    vol, _ = oracle.make_synthetic_lf(S=S, V=V, U=U, C=C, n_objects=3,
                                      seed=21, dmin=DMIN, dmax=DMAX)
    single = Depth2DComputer(jnp.asarray(vol), DMIN, DMAX, DIM_D,
                             use_pallas=True, early_stop=False,
                             pass_chunk=4)
    ss = single.run()
    got, _ = _run_2d(vol, (1, 4), use_pallas=True)
    assert (np.asarray(got.claim) == np.asarray(ss.claim)).all()
    assert np.allclose(np.asarray(got.best_depth),
                       np.asarray(ss.best_depth), atol=1e-6)
