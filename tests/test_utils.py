"""Utils: fft translate (vs reference semantics), checkpoint, plot."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_fft_htranslate_shifts():
    from remotesensingproject_tpu.ops.fft import fft_htranslate
    n = 64
    x = np.sin(2 * np.pi * np.arange(n) / n * 3).astype(np.float32)
    out = np.asarray(fft_htranslate(jnp.asarray(x), 2.0))
    want = np.roll(x, 2)
    assert np.allclose(out, want, atol=1e-4)

def test_fft_htranslate_fractional_roundtrip():
    # a fractional shift followed by its inverse restores the signal
    # (band-limited): the Shannon-interpolation semantic the reference's
    # commented-out sketch intended (core.hpp:518-524).
    from remotesensingproject_tpu.ops.fft import fft_htranslate
    n = 64
    x = (np.sin(2 * np.pi * np.arange(n) / n * 3)
         + 0.5 * np.cos(2 * np.pi * np.arange(n) / n * 7)).astype(
        np.float32)
    once = fft_htranslate(jnp.asarray(x), 0.4)
    back = np.asarray(fft_htranslate(once, -0.4))
    assert np.allclose(back, x, atol=1e-4)

def test_checkpoint_roundtrip(tmp_path):
    import sys
    sys.path.insert(0, "tests")
    import oracle
    from remotesensingproject_tpu.models.depth2d import Depth2DComputer
    from remotesensingproject_tpu.utils import checkpoint

    vol, _ = oracle.make_synthetic_lf(S=6, V=4, U=20, C=1, n_objects=2,
                                      seed=3)
    c = Depth2DComputer(jnp.asarray(vol), -1.0, 1.5, 5, use_pallas=False)
    c.run()
    checkpoint.save_level(str(tmp_path), 0, c)

    c2 = Depth2DComputer(jnp.asarray(vol), -1.0, 1.5, 5, use_pallas=False)
    assert checkpoint.load_level(str(tmp_path), 0, c2)
    assert np.array_equal(np.asarray(c.state.best_depth),
                          np.asarray(c2.state.best_depth))
    assert not checkpoint.load_level(str(tmp_path), 7, c2)

def test_jet_colormap_vs_cv2():
    cv2 = pytest.importorskip("cv2")
    from remotesensingproject_tpu.utils.plot import apply_colormap
    g = np.arange(256, dtype=np.uint8).reshape(16, 16)
    want_bgr = cv2.applyColorMap(g, cv2.COLORMAP_JET)
    want_rgb = want_bgr[..., ::-1]
    got = apply_colormap(g)
    diff = np.abs(got.astype(int) - want_rgb.astype(int))
    assert diff.max() <= 1, diff.max()

def test_image_converter_quantiles():
    from remotesensingproject_tpu.utils.plot import ImageConverterUint8
    rng = np.random.default_rng(0)
    img = rng.normal(0, 1, (50, 60, 1)).astype(np.float32)
    conv = ImageConverterUint8().fit(img, saturate=True)
    flat = np.sort(img[..., 0].ravel())
    n = flat.size
    assert conv.min == flat[int(np.floor(0.02 * n))]
    assert conv.max == flat[int(np.floor(0.98 * n))]
    out = conv.copy_and_scale(img)
    assert out.dtype == np.uint8


def test_fine_to_coarse_checkpoint_resume(tmp_path):
    import sys
    sys.path.insert(0, "tests")
    import oracle
    from remotesensingproject_tpu.config import PyramidParams
    from remotesensingproject_tpu.models.fine_to_coarse import FineToCoarse

    vol, _ = oracle.make_synthetic_lf(S=5, V=24, U=32, C=1, n_objects=2,
                                      seed=9)
    pyr = PyramidParams(min_spatial_dim=10)
    a = FineToCoarse(jnp.asarray(vol), -1.0, 1.5, 5, pyramid=pyr,
                     use_pallas=False)
    a.run(ckpt_dir=str(tmp_path))
    fa, va = a.get_results()
    # resume: all levels restored from disk, no recompute
    b = FineToCoarse(jnp.asarray(vol), -1.0, 1.5, 5, pyramid=pyr,
                     use_pallas=False)
    b.run(ckpt_dir=str(tmp_path))
    fb, vb = b.get_results()
    assert np.array_equal(np.asarray(fa), np.asarray(fb))
    assert np.array_equal(np.asarray(va), np.asarray(vb))
