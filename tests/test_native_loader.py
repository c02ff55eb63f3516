"""Native C++ image loader gates: builds with g++ on first use, decodes
PNG+JPEG on threads, and is numerically parity with the PIL/cv2 path at
the integer downscale ratios the dataset configs use."""

import os
import os.path as osp
import time

import numpy as np
import pytest

from nefes_tpu.native import available, load_images_native

pytestmark = pytest.mark.skipif(not available(),
                                reason="native loader did not build")


def _write_images(tmp, n=6, hw=(64, 96)):
    from PIL import Image
    rng = np.random.default_rng(0)
    paths = []
    for i in range(n):
        arr = rng.integers(0, 255, (*hw, 3), dtype=np.uint8)
        ext = "png" if i % 2 == 0 else "jpg"
        p = osp.join(tmp, f"im{i:03d}.{ext}")
        Image.fromarray(arr).save(p, quality=95)
        paths.append(p)
    return paths


def test_native_matches_pil_at_full_size(tmp_path):
    from PIL import Image
    paths = _write_images(str(tmp_path))
    out = load_images_native(paths, 64, 96)
    assert out.shape == (6, 64, 96, 3)
    for i, p in enumerate(paths):
        want = np.asarray(Image.open(p), np.float32)[..., :3] / 255.0
        tol = 0.0 if p.endswith("png") else 0.05  # jpeg decoders differ
        err = np.abs(out[i] - want).max()
        assert err <= tol + 1e-6, (p, err)


def test_native_box_downsample_matches_cv2_inter_area(tmp_path):
    import cv2
    from PIL import Image
    paths = [p for p in _write_images(str(tmp_path)) if p.endswith("png")]
    out = load_images_native(paths, 32, 48)     # integer ratio 2x2
    for i, p in enumerate(paths):
        img = np.asarray(Image.open(p), np.float32)[..., :3] / 255.0
        want = cv2.resize(img, (48, 32), interpolation=cv2.INTER_AREA)
        np.testing.assert_allclose(out[i], want, atol=2e-6)


def test_native_failure_reporting(tmp_path):
    p = str(tmp_path / "missing.png")
    with pytest.raises(RuntimeError, match="failed on 1/1"):
        load_images_native([p], 8, 8)


def test_loader_wiring_env_off(tmp_path, monkeypatch):
    """NEFES_NATIVE_LOADER=0 forces the PIL path; default uses native —
    both produce the same arrays for the fixture scene."""
    from tests.fixture_datasets import make_7scenes_fixture
    from nefes_tpu.data import load_7scenes_dslam
    paths = make_7scenes_fixture(str(tmp_path))
    root = osp.dirname(paths["datadir"])

    monkeypatch.setenv("NEFES_NATIVE_LOADER", "0")
    pil = load_7scenes_dslam("chess", root, paths["data_root"], df=8.0)
    monkeypatch.setenv("NEFES_NATIVE_LOADER", "1")
    nat = load_7scenes_dslam("chess", root, paths["data_root"], df=8.0)
    np.testing.assert_allclose(nat.images, pil.images, atol=2e-6)
