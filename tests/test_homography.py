"""Homography warp suite parity vs torch grid_sample (SURVEY row 39)."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from nefes_tpu.utils.homography import (  # noqa: E402
    compute_valid_mask, create_warped_img, four_point_homography,
    grid_sample, inv_warp_image_batch, sample_homography_np, warp_points,
)


def test_warp_points_identity_and_batch():
    pts = jnp.asarray([[0.0, 0.0], [1.0, 2.0], [-0.5, 0.25]])
    eye = jnp.eye(3)
    np.testing.assert_allclose(np.asarray(warp_points(pts, eye)),
                               np.asarray(pts), atol=1e-6)
    hb = jnp.stack([jnp.eye(3), 2.0 * jnp.eye(3)])  # scale of H is moot
    out = warp_points(pts, hb)
    assert out.shape == (2, 3, 2)
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(pts),
                               atol=1e-6)  # projective scale invariance


def test_grid_sample_matches_torch():
    rng = np.random.default_rng(0)
    img = rng.uniform(size=(2, 9, 11, 3)).astype(np.float32)
    coords = rng.uniform(-1.3, 1.3, size=(2, 5, 7, 2)).astype(np.float32)
    for mode in ("bilinear", "nearest"):
        want = F.grid_sample(
            torch.tensor(img).permute(0, 3, 1, 2), torch.tensor(coords),
            mode=mode, align_corners=True, padding_mode="zeros")
        want = want.permute(0, 2, 3, 1).numpy()
        got = np.asarray(grid_sample(jnp.asarray(img), jnp.asarray(coords),
                                     mode=mode))
        # nearest ties may round differently at exact .5 boundaries —
        # random coords don't land there
        np.testing.assert_allclose(got, want, atol=1e-5, err_msg=mode)


def test_inv_warp_identity():
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.uniform(size=(1, 8, 10, 2)).astype(np.float32))
    out = inv_warp_image_batch(img, jnp.eye(3))
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)


def test_four_point_homography_matches_dlt_properties():
    rng = np.random.default_rng(2)
    pts1 = np.array([[0, 0], [0, 1], [1, 1], [1, 0]], np.float64)
    pts2 = pts1 + rng.uniform(-0.2, 0.2, (4, 2))
    H = four_point_homography(pts1, pts2)
    warped = np.asarray(warp_points(jnp.asarray(pts1, jnp.float32),
                                    jnp.asarray(H, jnp.float32)))
    np.testing.assert_allclose(warped, pts2, atol=1e-4)


def test_sample_homography_maps_into_unit_square():
    rng = np.random.default_rng(3)
    for _ in range(5):
        H = sample_homography_np(np.array([1, 1]), patch_ratio=0.7,
                                 max_angle=math.pi / 6, rng=rng)
        corners = jnp.asarray([[0.0, 0.0], [0.0, 1.0], [1.0, 1.0],
                               [1.0, 0.0]])
        out = np.asarray(warp_points(corners, jnp.asarray(H, jnp.float32)))
        assert (out >= -1e-6).all() and (out <= 1 + 1e-6).all()


def test_valid_mask_and_create_warped():
    rng = np.random.default_rng(4)
    img = jnp.asarray(rng.uniform(size=(2, 16, 20, 3)).astype(np.float32))
    warped, homos = create_warped_img(img, 2, rng=rng)
    assert warped.shape == img.shape
    mask = compute_valid_mask((16, 20), homos)
    assert mask.shape == (2, 16, 20)
    frac = float(mask.mean())
    # artifact-free sampling keeps every source lookup in-bounds
    assert frac == pytest.approx(1.0)
    # a homography that reads outside the image leaves border zeros
    shift = jnp.asarray(np.array([[1.0, 0, 1.5], [0, 1, 0], [0, 0, 1]],
                                 np.float32))
    m2 = compute_valid_mask((16, 20), shift)
    assert 0.0 < float(m2.mean()) < 1.0
