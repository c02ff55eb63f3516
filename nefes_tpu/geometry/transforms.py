"""World/camera coordinate alignment — the canonical transform module.

The reference scatters these across three dataset loaders (``fix_coord`` at
dataset_loaders/load_7Scenes.py:284-360, load_Cambridge.py:250-315,
load_7Scenes_colmap.py:140-205) and ``fix_coord_supp`` at
script/dm/direct_pose_model.py:210-232. Here they live in one numpy module —
these run once at dataset-build time on host, so numpy (not jnp) is the right
tool; everything downstream is static jnp arrays.

Conventions: poses are camera-to-world (c2w) unless noted; OpenGL camera
(x right, y up, z backward / -z forward), the NeRF standard.
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from pathlib import Path

import numpy as np


@dataclass(frozen=True)
class WorldSetup:
    """Per-scene world alignment constants (data/<scene>/world_setup.json)."""

    near: float
    far: float
    pose_scale: float
    pose_scale2: float
    move_all_cam_vec: tuple[float, float, float]

    @classmethod
    def from_json(cls, path: str | Path) -> "WorldSetup":
        with open(path) as f:
            d = json.load(f)
        return cls(
            near=float(d["near"]),
            far=float(d["far"]),
            pose_scale=float(d["pose_scale"]),
            pose_scale2=float(d["pose_scale2"]),
            move_all_cam_vec=tuple(float(x) for x in d["move_all_cam_vec"]),
        )


def to_hom(poses: np.ndarray) -> np.ndarray:
    """(N, 3, 4) -> (N, 4, 4)."""
    last = np.tile(np.array([0.0, 0.0, 0.0, 1.0]), (len(poses), 1, 1))
    return np.concatenate([poses, last], axis=1)


def average_pose(poses: np.ndarray) -> np.ndarray:
    """LLFF-style average pose of (N, 3, 4) c2w poses -> (3, 4).

    Matches ``average_poses`` (reference load_7Scenes.py:130-163): center =
    mean translation, z = mean forward, x = normalize(y_mean × z), y = z × x.
    """
    center = poses[..., 3].mean(0)
    z = poses[..., 2].mean(0)
    z = z / np.linalg.norm(z)
    y_ = poses[..., 1].mean(0)
    x = np.cross(y_, z)
    x = x / np.linalg.norm(x)
    y = np.cross(z, x)
    return np.stack([x, y, z, center], axis=1)


def center_poses(poses: np.ndarray, pose_avg: np.ndarray | None = None):
    """Express (N, 3, 4) poses in the average-pose frame.

    Matches ``center_poses`` (reference load_7Scenes.py:164-194). Returns
    (poses_centered (N,3,4), pose_avg (3,4)).
    """
    if pose_avg is None:
        pose_avg = average_pose(poses)
    pose_avg_homo = np.eye(4)
    pose_avg_homo[:3] = pose_avg
    centered = np.linalg.inv(pose_avg_homo) @ to_hom(poses)
    return centered[:, :3], pose_avg


# Mirror matrix flipping y & z: takes dSLAM "up-left-forward" to OpenGL
# "up-right-backward" (reference load_7Scenes.py:320-336).
_FLIP_YZ = np.diag([1.0, -1.0, -1.0, 1.0])


def dslam_to_opengl(poses_centered: np.ndarray) -> np.ndarray:
    """7-Scenes dSLAM c2w (already centered) -> OpenGL/NeRF convention.

    Reproduces the exact product used by the reference — ``M @ (P @ M)``
    (load_7Scenes.py:336; note the comment there acknowledging the bracket
    placement, which is baked into the shipped pose_avg_stats and therefore
    must be preserved for parity).
    """
    hom = to_hom(poses_centered)
    out = _FLIP_YZ[None] @ (hom @ _FLIP_YZ[None])
    return out[:, :3, :4]


def colmap_to_opengl_c2w(w2c: np.ndarray) -> np.ndarray:
    """COLMAP (OpenCV) world-to-camera (N, 3, 4) -> OpenGL c2w (N, 3, 4).

    Matches load_7Scenes_colmap.py:150-159: negate rows 1 and 2 (switch
    [r, -u, t] -> [r, u, -t]) then invert w2c -> c2w.
    """
    hom = to_hom(w2c)
    hom = np.concatenate([hom[:, 0:1], -hom[:, 1:2], -hom[:, 2:3], hom[:, 3:4]], axis=1)
    c2w = np.linalg.inv(hom)
    return c2w[:, :3, :4]


def _rot_x(phi: float) -> np.ndarray:
    c, s = np.cos(phi), np.sin(phi)
    return np.array([
        [1, 0, 0, 0],
        [0, c, -s, 0],
        [0, s, c, 0],
        [0, 0, 0, 1.0],
    ])


def cambridge_to_opengl(poses_centered: np.ndarray) -> np.ndarray:
    """Cambridge NVM-derived c2w (centered) -> OpenGL convention.

    Matches load_Cambridge.py:285-297: 180° x-rotation of the whole pose,
    rotation negated, then columns mirrored at the x axis.
    """
    hom = _rot_x(np.pi)[None] @ to_hom(poses_centered)
    hom[:, :3, :3] = -hom[:, :3, :3]
    hom[:, :3, :3] = hom[:, :3, :3] @ np.diag([-1.0, 1.0, 1.0])
    return hom[:, :3, :4]


def rescale_translations(poses: np.ndarray, ws: WorldSetup) -> np.ndarray:
    """Apply the world-setup translation rescale (fix_coord 'rescale_coord'
    block, load_7Scenes.py:342-353): t = (t·scale + move_vec)·scale2."""
    out = poses.copy()
    out[:, :3, 3] *= ws.pose_scale
    out[:, :3, 3] += np.asarray(ws.move_all_cam_vec)
    out[:, :3, 3] *= ws.pose_scale2
    return out


def fix_coord_7scenes(poses: np.ndarray, pose_avg: np.ndarray,
                      ws: WorldSetup, rescale: bool = True) -> np.ndarray:
    """Full 7-Scenes dSLAM pipeline: center -> flip -> rescale.

    (reference load_7Scenes.py:284-360 with load_pose_avg_stats=True)
    """
    centered, _ = center_poses(poses.reshape(-1, 3, 4), pose_avg)
    gl = dslam_to_opengl(centered)
    return rescale_translations(gl, ws) if rescale else gl


def fix_coord_7scenes_colmap(w2c: np.ndarray, pose_avg: np.ndarray,
                             ws: WorldSetup, rescale: bool = True) -> np.ndarray:
    """7-Scenes COLMAP pGT pipeline: OpenCV w2c -> OpenGL c2w -> center ->
    rescale (reference load_7Scenes_colmap.py:140-205). Note the convention
    flip happens BEFORE centering here, unlike the dSLAM path."""
    c2w = colmap_to_opengl_c2w(w2c.reshape(-1, 3, 4))
    centered, _ = center_poses(c2w, pose_avg)
    return rescale_translations(centered, ws) if rescale else centered


def fix_coord_cambridge(poses: np.ndarray, pose_avg: np.ndarray,
                        ws: WorldSetup, rescale: bool = True) -> np.ndarray:
    """Cambridge pipeline: center -> 180°x + mirror -> rescale
    (reference load_Cambridge.py:250-315)."""
    centered, _ = center_poses(poses.reshape(-1, 3, 4), pose_avg)
    gl = cambridge_to_opengl(centered)
    return rescale_translations(gl, ws) if rescale else gl


def fix_coord_supp(pose: np.ndarray, ws: WorldSetup) -> np.ndarray:
    """Rescale an APR-predicted pose into the field's world frame at
    refinement time (reference script/dm/direct_pose_model.py:210-232).
    Works on np or jnp arrays of shape (..., 3, 4) without mutation."""
    t = pose[..., :3, 3]
    t = (t * ws.pose_scale + np.asarray(ws.move_all_cam_vec, dtype=pose.dtype)) * ws.pose_scale2
    if hasattr(pose, "at"):  # jnp path
        return pose.at[..., :3, 3].set(t)
    out = np.array(pose)
    out[..., :3, 3] = t
    return out
