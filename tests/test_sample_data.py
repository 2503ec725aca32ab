"""Bundled sample dataset (data/strips16) end-to-end smoke test.

The analog of the reference's `./test_read_tiff 1` + depth smoke runs
on its bundled data/000.tif (README.md:29-41, C19) — but with a real
assertion: the recovered disparities must match the known layer
disparities of the committed scene.
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from remotesensingproject_tpu.models.pile import Depth1DComputerPile
from remotesensingproject_tpu.utils.io import (
    build_epis_from_imgs, read_imgs_from_folder)

DATA = os.path.join(os.path.dirname(__file__), "..", "data", "strips16")


@pytest.mark.skipif(not os.path.isdir(DATA), reason="sample data absent")
def test_sample_dataset_pile_recovers_layer_disparities():
    frames = read_imgs_from_folder(DATA, "png")
    assert len(frames) == 16
    assert frames[0].shape[:2] == (48, 96)
    epis = build_epis_from_imgs(frames)          # [V, S, U, C]
    gt = np.load(os.path.join(DATA, "ground_truth.npz"))
    layers = gt["layer_disparities"]

    comp = Depth1DComputerPile(jnp.asarray(epis), dmin=-1.0, dmax=1.5,
                               dim_d=24, use_pallas=False)
    comp.run()
    depth = np.asarray(comp.get_depths())
    mask = np.asarray(comp.result.edge_mask)
    assert mask.mean() > 0.3                     # textured scene
    err = np.min(np.abs(depth[mask][:, None] - layers[None]), axis=1)
    assert np.median(err) < 0.1
    assert np.sqrt((err ** 2).mean()) < 0.3
