"""LLFF / Blender loader gates on synthetic fixtures (the legacy
PoseNet-experiment data path, reference dm/prepare_data.py)."""

import json
import os
import os.path as osp

import numpy as np
import pytest


def _write_blender(root, n=3, hw=40):
    from PIL import Image
    rng = np.random.default_rng(0)
    for split in ("train", "val", "test"):
        frames = []
        os.makedirs(osp.join(root, split), exist_ok=True)
        for i in range(n):
            name = f"{split}/r_{i}"
            img = rng.integers(0, 255, (hw, hw, 4), dtype=np.uint8)
            img[..., 3] = 255 if i % 2 else 128
            Image.fromarray(img, "RGBA").save(osp.join(root, name + ".png"))
            m = np.eye(4)
            m[:3, 3] = [0.1 * i, 0, 4.0]
            frames.append({"file_path": name,
                           "transform_matrix": m.tolist()})
        json.dump({"camera_angle_x": 0.69, "frames": frames},
                  open(osp.join(root, f"transforms_{split}.json"), "w"))


def test_blender_loader(tmp_path):
    from nefes_tpu.data.llff_blender import load_blender_data, load_dataset
    _write_blender(str(tmp_path))
    imgs, poses, hwf, i_split = load_blender_data(str(tmp_path),
                                                  half_res=False)
    assert imgs.shape == (9, 40, 40, 3)
    assert poses.shape == (9, 4, 4)
    want_f = 0.5 * 40 / np.tan(0.5 * 0.69)
    assert abs(hwf[2] - want_f) < 1e-3
    assert [len(s) for s in i_split] == [3, 3, 3]

    # white background composes alpha
    w = load_blender_data(str(tmp_path), white_bkgd=True)[0]
    assert w.max() <= 1.0 and w.shape[-1] == 3

    d = load_dataset("blender", str(tmp_path), white_bkgd=True)
    assert d["near"] == 2.0 and d["far"] == 6.0
    assert d["poses12"].shape == (9, 12)
    assert d["hwf"][0] == 20  # half_res in load_dataset
    assert d["hists"].shape == (9, 10)


def _write_llff(root, n=6, hw=(30, 40)):
    from PIL import Image
    rng = np.random.default_rng(1)
    os.makedirs(osp.join(root, "images"), exist_ok=True)
    arr = np.zeros((n, 17), np.float64)
    for i in range(n):
        Image.fromarray(rng.integers(0, 255, (*hw, 3), dtype=np.uint8)) \
            .save(osp.join(root, "images", f"im{i:03d}.png"))
        pose = np.zeros((3, 5))
        pose[:3, :3] = np.eye(3)[:, [1, 0, 2]] * np.array([1, -1, 1])
        pose[:3, 3] = [0.2 * i, 0.0, 1.0]
        pose[:, 4] = [hw[0], hw[1], 50.0]
        arr[i, :15] = pose.reshape(-1)
        arr[i, 15:] = [1.0 + 0.1 * i, 8.0]
    np.save(osp.join(root, "poses_bounds.npy"), arr)


def test_llff_loader(tmp_path):
    from nefes_tpu.data.llff_blender import load_dataset, load_llff_data
    _write_llff(str(tmp_path))
    imgs, poses, bds, i_test = load_llff_data(str(tmp_path), factor=None,
                                              bd_factor=0.75)
    assert imgs.shape[0] == 6 and poses.shape == (6, 3, 5)
    # bounds rescaled so bds.min()*0.75 == 1
    np.testing.assert_allclose(bds.min() * 0.75, 1.0, rtol=1e-6)
    # recentred: average camera position ~origin
    assert np.linalg.norm(poses[:, :3, 3].mean(0)) < 1e-5

    d = load_dataset("llff", str(tmp_path), factor=2, llffhold=3)
    assert d["images"].shape[1:] == (15, 20, 3)
    assert len(d["i_split"][2]) == 2          # every 3rd held out
    assert set(d["i_split"][0]).isdisjoint(d["i_split"][2])
    assert d["near"] == 0.0 and d["far"] == 1.0  # NDC bounds


def test_llff_spherify_unsupported(tmp_path):
    from nefes_tpu.data.llff_blender import load_llff_data
    _write_llff(str(tmp_path))
    with pytest.raises(NotImplementedError):
        load_llff_data(str(tmp_path), spherify=True)
