"""Tiny on-disk dataset fixtures in the exact layouts the loaders (and the
reference's setup scripts, data/setup_7scenes.py) produce. Used to drive
the real CLIs end-to-end in tests without the multi-GB downloads."""

from __future__ import annotations

import json
import os
import os.path as osp

import numpy as np


def _rot_z(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float64)


def _write_png(path, rng, h=60, w=80):
    from PIL import Image
    # smooth-ish random image so histograms/features are non-degenerate
    small = rng.uniform(0, 255, (6, 8, 3))
    img = np.kron(small, np.ones((h // 6, w // 8, 1)))[:h, :w]
    Image.fromarray(img.astype(np.uint8)).save(path)


def _rotmat2qvec(R):
    w = np.sqrt(max(0.0, 1.0 + R[0, 0] + R[1, 1] + R[2, 2])) / 2.0
    x = (R[2, 1] - R[1, 2]) / (4 * w)
    y = (R[0, 2] - R[2, 0]) / (4 * w)
    z = (R[1, 0] - R[0, 1]) / (4 * w)
    return np.array([w, x, y, z])


def make_7scenes_fixture(root: str, scene: str = "chess",
                         frames_per_seq: int = 4, img_hw=(60, 80),
                         focal: float = 525.0) -> dict:
    """Create <root>/deepslam_data/7Scenes/<scene> (seqs, splits, pose txts,
    colmap pGT tables) + <root>/data/7Scenes/<scene> world files.

    Returns paths dict: {datadir, data_root}.
    """
    rng = np.random.default_rng(0)
    base = osp.join(root, "deepslam_data", "7Scenes", scene)
    data = osp.join(root, "data", "7Scenes", scene)
    os.makedirs(data, exist_ok=True)

    os.makedirs(base, exist_ok=True)
    with open(osp.join(base, "TrainSplit.txt"), "w") as f:
        f.write("sequence1\n")
    with open(osp.join(base, "TestSplit.txt"), "w") as f:
        f.write("sequence2\n")

    colmap_rows = {"train": [], "test": []}
    for seq, split in ((1, "train"), (2, "test")):
        seq_dir = osp.join(base, f"seq-{seq:02d}")
        os.makedirs(seq_dir, exist_ok=True)
        for i in range(frames_per_seq):
            _write_png(osp.join(seq_dir, f"frame-{i:06d}.color.png"), rng,
                       *img_hw)
            c2w = np.eye(4)
            c2w[:3, :3] = _rot_z(0.05 * i + 0.3 * seq)
            c2w[:3, 3] = [0.1 * i, 0.05 * seq, 1.0 + 0.02 * i]
            np.savetxt(osp.join(seq_dir, f"frame-{i:06d}.pose.txt"), c2w)
            w2c_R = c2w[:3, :3].T
            w2c_t = -w2c_R @ c2w[:3, 3]
            q = _rotmat2qvec(w2c_R)
            colmap_rows[split].append(
                f"seq-{seq:02d}/frame-{i:06d}.color.png "
                + " ".join(f"{v:.9f}" for v in [*q, *w2c_t, focal]))

    for split, rows in colmap_rows.items():
        with open(osp.join(base, f"{scene}_{split}.txt"), "w") as f:
            f.write("\n".join(rows) + "\n")

    with open(osp.join(data, "world_setup.json"), "w") as f:
        json.dump({"near": 0.3, "far": 4.0, "pose_scale": 1.0,
                   "pose_scale2": 1.0,
                   "move_all_cam_vec": [0.0, 0.0, 0.0]}, f)
    np.savetxt(osp.join(data, "pose_avg_stats.txt"), np.eye(4)[:3])
    np.savetxt(osp.join(data, "pose_avg_stats_colmap.txt"), np.eye(4)[:3])

    return {"datadir": base, "data_root": osp.join(root, "data")}
