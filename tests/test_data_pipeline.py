"""Data-layer golden tests against the reference's shipped pose data.

The strongest available gate: the GT pose txts in paper_result/ ARE the
output of the reference's COLMAP fix_coord pipeline on the shipped
7Scenes_colmap_poses files — our pipeline must reproduce them bit-exactly
(f32 eps). No images required."""

import numpy as np
import pytest

from nefes_tpu.data.seven_scenes import quat_poses_to_w2c
from nefes_tpu.data.histograms import luminance_histogram
from nefes_tpu.geometry.transforms import (
    WorldSetup, fix_coord_7scenes_colmap,
)


@pytest.mark.parametrize("scene", ["chess", "fire", "heads", "office",
                                   "pumpkin", "redkitchen", "stairs"])
def test_colmap_pose_pipeline_reproduces_gt(reference_root, scene):
    base = (f"{reference_root}/paper_result/DFNet_NeFeS50_7Scenes_colmap/"
            f"{scene}")
    manifest = [l.strip() for l in
                open(f"{base}/{scene}_test_gt_filename.txt")]
    keys = ["/".join(f.split("/")[-2:]) for f in manifest]
    table = np.loadtxt(
        f"{reference_root}/data/7Scenes_colmap_poses/{scene}/{scene}_test.txt",
        dtype=str)
    lookup = {r[0]: r[1:].astype(np.float64) for r in table}
    qtf = np.stack([lookup[k] for k in keys])

    w2c = quat_poses_to_w2c(qtf[:, :7])
    ws = WorldSetup.from_json(
        f"{reference_root}/data/7Scenes/{scene}/world_setup.json")
    pose_avg = np.loadtxt(
        f"{reference_root}/data/7Scenes/{scene}/pose_avg_stats_colmap.txt")
    poses = fix_coord_7scenes_colmap(w2c, pose_avg, ws, rescale=False)

    gt = np.loadtxt(f"{base}/{scene}_test_gt.txt").reshape(-1, 3, 4)
    np.testing.assert_allclose(poses, gt, atol=2e-6)


def test_world_setup_parsing(reference_root):
    ws = WorldSetup.from_json(
        f"{reference_root}/data/7Scenes/chess/world_setup.json")
    assert ws.near == 0 and ws.far == 2
    assert ws.pose_scale == 0.5
    assert ws.move_all_cam_vec == (0.0, 0.0, 1.0)


def test_luminance_histogram_semantics():
    img = np.zeros((10, 10, 3), np.float32)
    img[:5] = 1.0  # half bright white (Y=1), half black (Y=0)
    h = luminance_histogram(img, bins=10)
    assert h.shape == (10,)
    assert h[0] == 50.0 and h[-1] == 50.0  # Y==1 lands in the LAST bin
    assert h.sum() == 100.0


def test_histogram_jnp_matches_np():
    import jax.numpy as jnp
    from nefes_tpu.data.histograms import luminance_histogram_jnp
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (16, 16, 3)).astype(np.float32)
    a = luminance_histogram(img)
    b = np.asarray(luminance_histogram_jnp(jnp.asarray(img)))
    np.testing.assert_allclose(a, b, atol=1.0)  # bin-edge ties may differ
