"""I/O: folder reading, EPI construction, YML interop, native loader."""

import os

import numpy as np
import pytest

from remotesensingproject_tpu.utils import io


@pytest.fixture
def tif_folder(tmp_path):
    from PIL import Image
    rng = np.random.default_rng(0)
    for s in range(3):
        a = rng.uniform(0, 200, (15, 21)).astype(np.float32)
        Image.fromarray(a).save(tmp_path / f"{s:03d}.tif")
    return str(tmp_path)

def test_read_folder_and_epis(tif_folder):
    stack = io.read_imgs_from_folder(tif_folder, "tif")
    assert stack.shape == (3, 15, 21, 1)
    epis = io.build_epis_from_imgs(stack)
    assert epis.shape == (15, 3, 21, 1)
    assert (epis[4, 1] == stack[1, 4]).all()
    row = io.build_row_epi_from_path(tif_folder, "tif", 4)
    assert np.array_equal(row, epis[4])

def test_list_images_sorted(tmp_path):
    for n in ["b.tif", "a.tif", "c.png", "10.tif", "2.tif"]:
        (tmp_path / n).write_bytes(b"x")
    # lexicographic (std::sort of strings): "10" < "2" < "a" < "b"
    assert io.list_images(str(tmp_path), "tif") == ["10", "2", "a", "b"]

def test_yml_roundtrip(tmp_path):
    a = np.random.default_rng(1).uniform(-3, 3, (4, 5)).astype(np.float32)
    io.write_mat_to_yml(a, str(tmp_path), "m")
    b = io.read_mat_from_yml(str(tmp_path), "m")
    assert np.array_equal(a, b)

def test_yml_readable_by_opencv(tmp_path):
    cv2 = pytest.importorskip("cv2")
    a = np.random.default_rng(1).uniform(-3, 3, (4, 5)).astype(np.float32)
    path = io.write_mat_to_yml(a, str(tmp_path), "m")
    fs = cv2.FileStorage(path, cv2.FILE_STORAGE_READ)
    b = fs.getNode("img").mat()
    assert np.allclose(a, b)

def test_native_loader_matches_pil(tif_folder):
    from remotesensingproject_tpu.native import loader
    if loader._load() is None:
        pytest.skip("native loader not built")
    names = io.list_images(tif_folder, "tif")
    native = loader.read_stack(tif_folder, names, "tif")
    assert native is not None
    pil = np.stack([io.read_img_from_file(tif_folder, n, "tif")
                    for n in names])[..., None]
    assert native.dtype == pil.dtype
    assert np.array_equal(native, pil)

def test_native_loader_reference_lzw_tiff():
    from remotesensingproject_tpu.native import loader
    if loader._load() is None:
        pytest.skip("native loader not built")
    if not os.path.exists("/root/reference/data/000.tif"):
        pytest.skip("reference data not mounted")
    import shutil, tempfile
    from PIL import Image
    with tempfile.TemporaryDirectory() as d:
        shutil.copy("/root/reference/data/000.tif", f"{d}/000.tif")
        out = loader.read_stack(d, ["000"], "tif")
        assert out is not None and out.dtype == np.float32
        ref = np.array(Image.open(f"{d}/000.tif"))
        assert np.array_equal(out[0, ..., 0], ref)


def test_native_loader_jpeg_matches_pil(tmp_path):
    """JPEG ingest (the Mansion RGB format,
    tests/test_build_row_epi_mansion_resized.cpp:24) decodes natively;
    both paths wrap libjpeg, so the decoded pixels are identical."""
    from PIL import Image

    from remotesensingproject_tpu.native import loader
    if loader._load() is None:
        pytest.skip("native loader not built")
    rng = np.random.default_rng(3)
    base = rng.integers(0, 255, (24, 32, 3), dtype=np.uint8)
    for s in range(4):
        Image.fromarray(np.roll(base, s, axis=1), "RGB").save(
            tmp_path / f"f{s:02d}.jpg", quality=92)
    names = io.list_images(str(tmp_path), "jpg")
    assert len(names) == 4
    native = loader.read_stack(str(tmp_path), names, "jpg")
    assert native is not None and native.dtype == np.uint8
    pil = np.stack([io.read_img_from_file(str(tmp_path), n, "jpg")
                    for n in names])
    assert native.shape == pil.shape == (4, 24, 32, 3)
    assert np.array_equal(native, pil)


def test_native_loader_jpeg_grayscale(tmp_path):
    from PIL import Image

    from remotesensingproject_tpu.native import loader
    if loader._load() is None:
        pytest.skip("native loader not built")
    rng = np.random.default_rng(4)
    a = rng.integers(0, 255, (16, 20), dtype=np.uint8)
    Image.fromarray(a, "L").save(tmp_path / "g00.jpg", quality=95)
    out = loader.read_stack(str(tmp_path), ["g00"], "jpg")
    assert out is not None and out.shape == (1, 16, 20, 1)
    pil = np.array(Image.open(tmp_path / "g00.jpg"))
    assert np.array_equal(out[0, ..., 0], pil)


def test_pil_fallback_warns_loudly(tmp_path, monkeypatch):
    """A broken native loader must degrade LOUDLY (round-4 verdict #8)."""
    import warnings as _w

    from PIL import Image

    from remotesensingproject_tpu.native import loader as nl
    Image.fromarray(np.zeros((8, 8), np.uint8), "L").save(
        tmp_path / "a.png")
    monkeypatch.setattr(nl, "read_stack",
                        lambda *a, **k: (_ for _ in ()).throw(
                            OSError("simulated broken .so")))
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        stack = io.read_imgs_from_folder(str(tmp_path), "png")
    assert stack.shape == (1, 8, 8, 1)
    assert any("falling back to single-threaded PIL" in str(w.message)
               for w in rec), [str(w.message) for w in rec]
