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
