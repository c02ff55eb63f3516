"""ColorJitter torchvision-semantics parity + Cambridge dpt depth loading
(SURVEY row 4 tail)."""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from nefes_tpu.data.augment import _blend, _grayscale, color_jitter  # noqa


def test_blend_ops_match_torchvision_functional_formulas():
    rng = np.random.default_rng(0)
    img = rng.uniform(size=(6, 8, 3)).astype(np.float32)
    t = torch.tensor(img).permute(2, 0, 1)

    # brightness: torchvision F.adjust_brightness = clamp(img * b)
    b = 1.17
    want = torch.clamp(t * b, 0, 1).permute(1, 2, 0).numpy()
    got = _blend(img, np.zeros_like(img), b)
    np.testing.assert_allclose(got, want, atol=1e-6)

    # saturation: blend with per-pixel grayscale
    s = 1.8
    gray = (0.2989 * t[0] + 0.587 * t[1] + 0.114 * t[2])[None]
    want = torch.clamp(s * t + (1 - s) * gray, 0, 1).permute(1, 2, 0).numpy()
    got = _blend(img, _grayscale(img), s)
    np.testing.assert_allclose(got, want, atol=1e-5)

    # contrast: blend with the mean of the grayscale image
    c = 0.85
    want = torch.clamp(c * t + (1 - c) * gray.mean(), 0, 1) \
        .permute(1, 2, 0).numpy()
    got = _blend(img, _grayscale(img).mean((-3, -2, -1), keepdims=True), c)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_color_jitter_changes_image_deterministically():
    rng1 = np.random.default_rng(7)
    rng2 = np.random.default_rng(7)
    img = np.full((4, 4, 3), 0.5, np.float32)
    out1 = color_jitter(img, rng1)
    out2 = color_jitter(img, rng2)
    np.testing.assert_array_equal(out1, out2)
    assert out1.shape == img.shape
    assert np.abs(out1 - img).max() > 1e-4
    assert out1.min() >= 0.0 and out1.max() <= 1.0


def test_cambridge_dpt_depth_loading(tmp_path):
    from PIL import Image
    from nefes_tpu.data.cambridge import load_dpt_depth
    d = (np.arange(20 * 30).reshape(20, 30) * 7 % 60000).astype(np.uint16)
    p = str(tmp_path / "d.png")
    Image.fromarray(d).save(p)
    out = load_dpt_depth(p, 10, 15)
    assert out.shape == (10, 15)
    assert out.dtype == np.float32
    assert out.max() > 0
