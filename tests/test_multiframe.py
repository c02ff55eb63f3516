"""Multi-frame sampling + 7-Scenes depth loading gates (reference
SevenScenesMF, seven_scenes.py:367-432; load_depth_image :144-150)."""

import os.path as osp

import numpy as np
import pytest

from nefes_tpu.data.multiframe import (
    multiframe_batch, multiframe_indices, relative_pose,
)
from nefes_tpu.data.synthetic import make_synthetic_scene


def test_multiframe_indices_clamped_queue():
    idx = multiframe_indices(5, steps=2)
    np.testing.assert_array_equal(
        idx, [[0, 0], [0, 1], [1, 2], [2, 3], [3, 4]])
    idx3 = multiframe_indices(4, steps=3)
    np.testing.assert_array_equal(
        idx3, [[0, 0, 0], [0, 0, 1], [0, 1, 2], [1, 2, 3]])


def test_multiframe_batch_shapes():
    scene = make_synthetic_scene(n_views=6, H=8, W=8)
    item = multiframe_batch(scene, 3, steps=2)
    assert item["images"].shape == (2, 8, 8, 3)
    assert item["poses"].shape == (3, 3, 4)       # prev-1, prev, cur
    np.testing.assert_array_equal(item["images"][1], scene.images[3])
    np.testing.assert_array_equal(item["poses"][2], scene.poses[3])

    batch = multiframe_batch(scene, np.array([0, 4]), steps=2)
    assert batch["images"].shape == (2, 2, 8, 8, 3)


def test_relative_pose_roundtrip():
    scene = make_synthetic_scene(n_views=4, H=8, W=8)
    a, b = scene.poses[0], scene.poses[2]
    rel = relative_pose(a, b)
    # composing a with rel must give b: R_b = R_a @ R_rel, t_b = R_a t_rel + t_a
    Rb = a[:3, :3] @ rel[:3, :3]
    tb = a[:3, :3] @ rel[:3, 3] + a[:3, 3]
    np.testing.assert_allclose(Rb, b[:3, :3], atol=1e-5)
    np.testing.assert_allclose(tb, b[:3, 3], atol=1e-5)
    # identity for same pose
    rel0 = relative_pose(a, a)
    np.testing.assert_allclose(rel0[:3, :3], np.eye(3), atol=1e-6)
    np.testing.assert_allclose(rel0[:3, 3], 0.0, atol=1e-6)


def test_7scenes_depth_loading(tmp_path):
    from PIL import Image
    from tests.fixture_datasets import make_7scenes_fixture
    from nefes_tpu.data import load_7scenes_dslam

    paths = make_7scenes_fixture(str(tmp_path))
    # write paired depth pngs (uint16 mm, some invalid)
    for seq in ("seq-01", "seq-02"):
        for i in range(4):
            d = np.full((60, 80), 1500, np.uint16)
            d[0, 0] = 65535  # invalid sentinel
            Image.fromarray(d).save(osp.join(
                paths["datadir"], seq, f"frame-{i:06d}.depth.png"))

    sc = load_7scenes_dslam("chess", osp.dirname(paths["datadir"]),
                            paths["data_root"], train=True, df=8.0,
                            load_depth=True)
    assert sc.depths is not None and sc.depths.shape == (4, 60, 80)
    assert abs(float(sc.depths[0, 5, 5]) - 1.5) < 1e-6   # mm -> m
    assert float(sc.depths[0, 0, 0]) == 0.0              # invalid -> 0
