"""Fine-to-coarse pipeline: structure + ground-truth recovery."""

import numpy as np
import pytest

import oracle

import jax.numpy as jnp

from remotesensingproject_tpu.config import DepthParams, PyramidParams
from remotesensingproject_tpu.models.fine_to_coarse import FineToCoarse


def test_fine_to_coarse_levels_and_shapes():
    vol, _ = oracle.make_synthetic_lf(S=6, V=24, U=44, C=1, n_objects=3,
                                      seed=1)
    ftc = FineToCoarse(jnp.asarray(vol), -1.0, 1.5, 5,
                       pyramid=PyramidParams(min_spatial_dim=10),
                       use_pallas=False)
    # 24x44 -> 12x22 -> 6x11 : levels created while dims > 10
    assert len(ftc.computers) == 2
    assert ftc.computers[0].epis.shape[:3] == (24, 6, 44)
    assert ftc.computers[1].epis.shape[:3] == (12, 6, 22)
    assert np.isclose(ftc.level_params[0].slope_factor, 1.0)
    assert np.isclose(ftc.level_params[1].slope_factor, 22 / 44)
    assert ftc.computers[-1].accept_all


def test_fine_to_coarse_runs_and_recovers_disparity():
    vol, gt = oracle.make_synthetic_lf(S=8, V=24, U=40, C=1, n_objects=3,
                                       seed=4, dmin=-1.0, dmax=1.5)
    ftc = FineToCoarse(jnp.asarray(vol), -1.0, 1.5, 21,
                       pyramid=PyramidParams(min_spatial_dim=10),
                       use_pallas=False)
    ftc.run()
    fused, validity = ftc.get_results()
    fused = np.asarray(fused)
    validity = np.asarray(validity)
    S = vol.shape[1]
    s_hat = S // 2
    # coarse level has accept_all -> full coverage after fusion
    assert validity[s_hat].mean() > 0.99
    err = np.abs(fused[s_hat] - gt)
    # the fused map should be close to ground truth on most pixels
    assert np.median(err) < 0.15, np.median(err)

    # bounds of level 1 must have been edited from level 0 parents
    c1 = ftc.computers[1]
    assert c1._bounds_edited
    assert float(jnp.min(c1.dmin_s_v_u)) >= -1.0
    assert float(jnp.max(c1.dmax_s_v_u)) <= 1.5


def test_fine_to_coarse_coloured_maps():
    vol, _ = oracle.make_synthetic_lf(S=6, V=16, U=24, C=1, n_objects=2,
                                      seed=5)
    ftc = FineToCoarse(jnp.asarray(vol), -1.0, 1.5, 7,
                       pyramid=PyramidParams(min_spatial_dim=10),
                       use_pallas=False)
    ftc.run()
    maps = ftc.get_coloured_depth_maps()
    assert maps.shape == (6, 16, 24, 3)
    assert maps.dtype == np.uint8


def test_render_variants():
    vol, _ = oracle.make_synthetic_lf(S=6, V=16, U=24, C=1, n_objects=2,
                                      seed=5)
    ftc = FineToCoarse(jnp.asarray(vol), -1.0, 1.5, 7,
                       pyramid=PyramidParams(min_spatial_dim=10),
                       use_pallas=False)
    ftc.run()
    pair = ftc.get_coloured_depth_maps_and_imgs()
    assert len(pair) == 6 and pair[0].dtype == np.uint8
    epi_pyr = ftc.get_coloured_epi_pyr()
    assert len(epi_pyr) == len(ftc.computers)
    assert epi_pyr[0].shape == (6, 24, 3)
    depth_pyr = ftc.get_coloured_depth_pyr()
    assert depth_pyr[0].shape == (16, 24, 3)

    c0 = ftc.computers[0]
    assert c0.get_coloured_epi().shape == (6, 24, 3)
    assert c0.get_disparity_map().shape == (16, 24, 3)
