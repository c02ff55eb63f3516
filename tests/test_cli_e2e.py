"""End-to-end CLI tests on a tiny on-disk 7-Scenes fixture: the real
train entry (both schedule stages, ft_path resume semantics, periodic
validation, render_test mode) driven exactly as a user would."""

import os

import numpy as np
import pytest

from tests.fixture_datasets import make_7scenes_fixture


@pytest.fixture(scope="module")
def fx(tmp_path_factory):
    root = tmp_path_factory.mktemp("sevenscenes")
    return make_7scenes_fixture(str(root)), str(root)


def _args(paths, root, **kw):
    base = {
        "dataset_type": "7Scenes", "datadir": paths["datadir"],
        "data_root": paths["data_root"], "basedir": os.path.join(root, "logs"),
        "df": "8", "netdepth": "2", "netwidth": "32", "feature_dim": "8",
        "multires": "4", "multires_views": "2",
        "N_samples": "4", "N_importance": "4", "N_rand": "32",
        "batch_size": "2", "i_weights": "1", "i_print": "1",
        "i_testset": "0", "val_views": "1", "tinyscale": "4",
    }
    base.update({k: str(v) for k, v in kw.items()})
    argv = []
    for k, v in base.items():
        argv += [f"--{k}", v]
    return argv


def test_stage1_then_stage2_resume_resets_epoch(fx):
    paths, root = fx
    from nefes_tpu.cli.train import main

    s1 = main(_args(paths, root, expname="stage1", epochs=2,
                    new_schedule=1))
    assert int(s1.epoch) == 3  # trained epochs 0..2
    ckpts = os.listdir(os.path.join(root, "logs", "stage1", "ckpts"))
    assert ckpts, "stage-1 checkpoint missing"
    ckpt = os.path.join(root, "logs", "stage1", "ckpts", sorted(ckpts)[-1])

    # stage-2 fine-tune from the stage-1 ckpt: the epoch counter MUST be
    # reset (reference run_nefes.py:323-326) or the run trains 0 epochs
    s2 = main(_args(paths, root, expname="stage2", epochs=1,
                    new_schedule=2, ft_path=ckpt, no_reload=True))
    assert int(s2.epoch) == 2, "stage-2 resume did not reset the epoch"


def test_periodic_validation_writes_artifacts(fx):
    paths, root = fx
    from nefes_tpu.cli.train import main
    main(_args(paths, root, expname="valrun", epochs=1, new_schedule=1,
               i_testset=1, color_feat_loss=True))
    exp = os.path.join(root, "logs", "valrun")
    dirs = [d for d in os.listdir(exp) if d.startswith("evaluate_")]
    assert dirs, f"no evaluate_* dirs in {os.listdir(exp)}"
    files = os.listdir(os.path.join(exp, dirs[0]))
    assert any(f.endswith(".png") for f in files)


def test_render_test_mode_exits_after_eval(fx):
    paths, root = fx
    from nefes_tpu.cli.train import main
    ckpt_dir = os.path.join(root, "logs", "stage1", "ckpts")
    ckpt = os.path.join(ckpt_dir, sorted(os.listdir(ckpt_dir))[-1])
    s = main(_args(paths, root, expname="rt", epochs=50, new_schedule=1,
                   render_test=True, ft_path=ckpt))
    # render_test returns without training
    exp = os.path.join(root, "logs", "rt")
    assert any(d.startswith("evaluate_") for d in os.listdir(exp))


def test_colmap_loader_reads_fixture(fx):
    paths, root = fx
    from nefes_tpu.data import load_7scenes_colmap
    sc = load_7scenes_colmap("chess",
                             os.path.dirname(paths["datadir"]),
                             paths["data_root"], train=False, df=8.0)
    assert sc.poses.shape == (4, 3, 4)
    assert sc.images.shape[1:] == (60, 80, 3)
    assert np.all(np.isfinite(sc.poses))


def test_refine_cli_mode2_end_to_end(fx):
    """Mode-2 (APR-weight) refinement through the CLI: host-side target
    precompute, batched refinement, verification fail-safe, txt output."""
    paths, root = fx
    from nefes_tpu.cli.refine import main
    cwd = os.getcwd()
    os.chdir(root)
    try:
        s = main(["--dataset_type", "7Scenes", "--datadir",
                  paths["datadir"], "--data_root", paths["data_root"],
                  "--df", "8", "--netdepth", "2", "--netwidth", "32",
                  "--feature_dim", "8", "--multires", "4",
                  "--multires_views", "2", "--N_samples", "4",
                  "--N_importance", "4", "--pose_only", "2",
                  "--opt_iter", "1", "--tinyscale", "4",
                  "--refine_batch", "2"])
    finally:
        os.chdir(cwd)
    assert s["n_frames"] == 4
    assert np.isfinite(s["median_t_m"])
    out = os.path.join(root, "tmp", "DFNet_NeFeS1_7Scenes", "chess",
                       "DFNet_chess_NeFeS1_APR_pose_results.txt")
    assert os.path.exists(out)
    assert np.loadtxt(out).shape == (4, 12)


def test_video_artifacts_written(fx):
    """render_video_train/test + spiral mp4s (reference options.py:19,23-24
    via run_nefes.py:360-364,407-411) come out of the CLI as real videos."""
    paths, root = fx
    from nefes_tpu.cli.train import main
    from nefes_tpu.utils.video import read_mp4

    main(_args(paths, root, expname="vid", epochs=1, new_schedule=1,
               i_testset=1, render_video_train=True,
               render_video_test=True))
    exp = os.path.join(root, "logs", "vid")
    mp4s = sorted(f for f in os.listdir(exp) if f.endswith(".mp4"))
    assert any("trainset" in f and "rgb" in f for f in mp4s), mp4s
    assert any("trainset" in f and "disp" in f for f in mp4s), mp4s
    assert any("valset" in f and "rgb" in f for f in mp4s), mp4s
    frames = read_mp4(os.path.join(exp, mp4s[0]))
    assert frames.ndim == 4 and frames.shape[0] >= 1
    assert frames.shape[3] == 3

    # spiral entry renders a path video and exits without training
    ckpt_dir = os.path.join(root, "logs", "stage1", "ckpts")
    ckpt = os.path.join(ckpt_dir, sorted(os.listdir(ckpt_dir))[-1])
    main(_args(paths, root, expname="spiral", epochs=50, new_schedule=1,
               render_pose_only=True, spiral_views=3, ft_path=ckpt))
    spath = os.path.join(root, "logs", "spiral", "spiral_spiral.mp4")
    assert os.path.exists(spath)
    sframes = read_mp4(spath)
    assert sframes.shape[0] == 3
