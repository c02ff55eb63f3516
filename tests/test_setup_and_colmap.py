"""Setup-script + COLMAP IO gates (VERDICT r1 item 7):

  * setup_7scenes unpack path produces exactly the layout
    load_7scenes_dslam consumes, from a tiny synthetic scene zip
  * setup_cambridge NVM conversion produces the train|test layout
    load_cambridge consumes, with poses round-tripping the NVM cameras
  * COLMAP text AND binary models round-trip bit-exactly
"""

import json
import os
import os.path as osp
import zipfile

import numpy as np
import pytest


# ----------------------------------------------------------------------
# 7-Scenes
# ----------------------------------------------------------------------

def _make_7scenes_zip(tmp, scene="chess", frames=3):
    """Zip mirroring the MS download: <scene>/{TrainSplit,TestSplit}.txt +
    seq-NN.zip inner archives."""
    from tests.fixture_datasets import make_7scenes_fixture
    fix = make_7scenes_fixture(osp.join(tmp, "flat"), scene,
                               frames_per_seq=frames)
    src = fix["datadir"]
    zpath = osp.join(tmp, f"{scene}.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        for split in ("TrainSplit.txt", "TestSplit.txt"):
            z.write(osp.join(src, split), f"{scene}/{split}")
        for seq in ("seq-01", "seq-02"):
            inner = osp.join(tmp, f"{seq}.zip")
            with zipfile.ZipFile(inner, "w") as zi:
                for f in os.listdir(osp.join(src, seq)):
                    zi.write(osp.join(src, seq, f), f"{seq}/{f}")
            z.write(inner, f"{scene}/{seq}.zip")
    # colmap pose tables dir (reference data/7Scenes_colmap_poses layout)
    cp = osp.join(tmp, "colmap_poses", scene)
    os.makedirs(cp, exist_ok=True)
    for split in ("train", "test"):
        os.rename(osp.join(src, f"{scene}_{split}.txt"),
                  osp.join(cp, f"{scene}_{split}.txt"))
    return zpath, osp.join(tmp, "colmap_poses"), fix["data_root"]


def test_setup_7scenes_produces_loader_layout(tmp_path):
    from nefes_tpu.data.setup_7scenes import setup_7scenes
    from nefes_tpu.data import load_7scenes_dslam, load_7scenes_colmap

    zpath, colmap_dir, data_root = _make_7scenes_zip(str(tmp_path))
    out = setup_7scenes(str(tmp_path / "out"), scenes=("chess",),
                        source=str(tmp_path), download=False,
                        colmap_poses_dir=colmap_dir)
    assert len(out) == 1
    root = str(tmp_path / "out" / "deepslam_data" / "7Scenes")
    sc = load_7scenes_dslam("chess", root, data_root, train=True, df=8.0)
    assert sc.poses.shape[0] == 3
    sc2 = load_7scenes_colmap("chess", root, data_root, train=False, df=8.0)
    assert sc2.poses.shape[0] == 3
    assert np.all(np.isfinite(sc2.poses))


# ----------------------------------------------------------------------
# Cambridge NVM conversion
# ----------------------------------------------------------------------

def _make_nvm_scene(tmp, n_cams=4, n_pts=30):
    """Synthetic extracted Cambridge scene: reconstruction.nvm +
    dataset_{train,test}.txt + jpg images."""
    from PIL import Image
    rng = np.random.default_rng(0)
    os.makedirs(osp.join(tmp, "seq1"), exist_ok=True)
    cams = []
    for i in range(n_cams):
        # NVM rows name .jpg; the shipped dataset (and the reference's
        # io.imread) use the .png twin on disk (setup_cambridge.py:107)
        name = f"seq1/frame{i:05d}.jpg"
        Image.fromarray(rng.integers(0, 255, (120, 214, 3),
                                     dtype=np.uint8)).save(
            osp.join(tmp, name[:-3] + "png"))
        q = np.array([1.0, 0.02 * i, 0.01 * i, 0.0])
        q /= np.linalg.norm(q)
        c = np.array([i * 0.5, 0.1, 2.0])
        cams.append((name, 500.0 + i, q, c))

    lines = ["NVM_V3", "", str(n_cams)]
    for name, f, q, c in cams:
        lines.append(f"{name}\t{f} " + " ".join(map(str, q)) + " "
                     + " ".join(map(str, c)) + " 0 0")
    lines += ["", str(n_pts)]
    for p in range(n_pts):
        xyz = rng.normal(0, 1, 3) + [0, 0, -3]
        views = rng.choice(n_cams, size=2, replace=False)
        row = " ".join(map(str, xyz)) + " 128 128 128 2 "
        row += " ".join(f"{v} {p} 0.0 0.0" for v in views)
        lines.append(row)
    with open(osp.join(tmp, "reconstruction.nvm"), "w") as f:
        f.write("\n".join(lines) + "\n")

    for mode, sel in (("train", range(0, n_cams, 2)),
                      ("test", range(1, n_cams, 2))):
        with open(osp.join(tmp, f"dataset_{mode}.txt"), "w") as f:
            f.write("header\nheader\nheader\n")
            for i in sel:
                f.write(cams[i][0][:-3] + "png 0 0 0 1 0 0 0\n")
    return cams


def test_convert_cambridge_scene(tmp_path):
    from nefes_tpu.data.setup_cambridge import (
        camera_w2c, convert_scene, parse_nvm,
    )
    src = str(tmp_path / "src")
    os.makedirs(src)
    cams = _make_nvm_scene(src)
    out = str(tmp_path / "out" / "KingsCollege")
    n = convert_scene(src, out)
    assert n == 4

    # layout + H=480 rescale + focal scaling
    rgbs = sorted(os.listdir(osp.join(out, "train", "rgb")))
    assert len(rgbs) == 2
    from PIL import Image
    img = Image.open(osp.join(out, "train", "rgb", rgbs[0]))
    assert img.size[1] == 480           # landscape -> height = 480
    cal = float(open(osp.join(
        out, "train", "calibration", rgbs[0][:-3] + "txt")).read())
    scale = img.size[0] / 214
    assert abs(cal - cams[0][1] * scale) < 1e-3 * cal

    # pose txt = inverse of the NVM w2c
    pose = np.loadtxt(osp.join(out, "train", "poses", rgbs[0][:-3] + "txt"))
    lines = open(osp.join(src, "reconstruction.nvm")).read().splitlines()
    cameras, _ = parse_nvm(lines)
    want = np.linalg.inv(camera_w2c(cameras[0]))
    np.testing.assert_allclose(pose, want, atol=1e-6)

    # init targets exist and contain some projected points
    init = np.load(osp.join(out, "train", "init", rgbs[0][:-4] + ".npy"))
    assert init.shape[0] == 3

    # the loader consumes the produced layout
    ws_dir = str(tmp_path / "out" / "KingsCollege")
    with open(osp.join(ws_dir, "world_setup.json"), "w") as f:
        json.dump({"near": 0.1, "far": 10.0, "pose_scale": 1.0,
                   "pose_scale2": 1.0,
                   "move_all_cam_vec": [0.0, 0.0, 0.0]}, f)
    np.savetxt(osp.join(ws_dir, "pose_avg_stats.txt"), np.eye(4)[:3])
    from nefes_tpu.data import load_cambridge
    sc = load_cambridge("KingsCollege", str(tmp_path / "out"), df=4.0)
    assert sc.poses.shape == (2, 3, 4)
    assert np.all(np.isfinite(sc.poses))


# ----------------------------------------------------------------------
# COLMAP IO
# ----------------------------------------------------------------------

def _tiny_model():
    from nefes_tpu.utils.colmap import Camera, Image, Point3D
    rng = np.random.default_rng(1)
    cams = {1: Camera(1, "PINHOLE", 640, 480,
                      np.array([525.0, 525.0, 320.0, 240.0]))}
    imgs = {}
    for i in (1, 2):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        imgs[i] = Image(i, q, rng.normal(size=3), 1, f"frame{i}.png",
                        rng.uniform(0, 640, (3, 2)),
                        np.array([7, -1, 9], np.int64))
    pts = {7: Point3D(7, rng.normal(size=3), np.array([10, 200, 30]),
                      0.5, np.array([1, 2]), np.array([0, 2])),
           9: Point3D(9, rng.normal(size=3), np.array([1, 2, 3]),
                      1.25, np.array([1]), np.array([2]))}
    return cams, imgs, pts


@pytest.mark.parametrize("ext", [".txt", ".bin"])
def test_colmap_model_roundtrip(tmp_path, ext):
    from nefes_tpu.utils.colmap import read_model, write_model
    cams, imgs, pts = _tiny_model()
    write_model(cams, imgs, pts, str(tmp_path), ext=ext)
    c2, i2, p2 = read_model(str(tmp_path), ext=ext)
    assert c2[1].model == "PINHOLE" and c2[1].width == 640
    np.testing.assert_allclose(c2[1].params, cams[1].params)
    for i in (1, 2):
        np.testing.assert_allclose(i2[i].qvec, imgs[i].qvec)
        np.testing.assert_allclose(i2[i].tvec, imgs[i].tvec)
        np.testing.assert_allclose(i2[i].xys, imgs[i].xys)
        np.testing.assert_array_equal(i2[i].point3D_ids,
                                      imgs[i].point3D_ids)
        assert i2[i].name == imgs[i].name
    for k in (7, 9):
        np.testing.assert_allclose(p2[k].xyz, pts[k].xyz)
        np.testing.assert_array_equal(p2[k].image_ids, pts[k].image_ids)
        assert p2[k].error == pts[k].error


def test_colmap_cross_format(tmp_path):
    """txt-written model re-written as bin reads back identical."""
    from nefes_tpu.utils.colmap import read_model, write_model
    cams, imgs, pts = _tiny_model()
    write_model(cams, imgs, pts, str(tmp_path / "t"), ext=".txt")
    c, i, p = read_model(str(tmp_path / "t"))
    write_model(c, i, p, str(tmp_path / "b"), ext=".bin")
    c2, i2, p2 = read_model(str(tmp_path / "b"))
    np.testing.assert_allclose(i2[1].qvec, imgs[1].qvec)
    np.testing.assert_allclose(p2[7].xyz, pts[7].xyz)


def test_qvec_rotmat_roundtrip():
    from nefes_tpu.utils.colmap import qvec2rotmat, rotmat2qvec
    rng = np.random.default_rng(2)
    for _ in range(20):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        if q[0] < 0:
            q = -q
        R = qvec2rotmat(q)
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-12)
        np.testing.assert_allclose(rotmat2qvec(R), q, atol=1e-8)
