"""Fixture gate for the one-command paper-parity drive
(`runtime/probe.py golden`, VERDICT r3 item 4).

Synthesizes every real artifact the command consumes — a reference-layout
NeFeS ``.tar``, a DFNet ``.pt`` with the reference's state_dict keys, a
7-Scenes scene directory, and a ``paper_result/`` tree in the recorded txt
format — then runs the full convert -> refine (mode 2) -> evaluate-vs-
paper pipeline and checks both the PASS and FAIL verdicts. The day the
released checkpoints (reference README.md:62-68) are on disk, parity is
this one invocation against the real ``/root/reference``.

The drive runs as a SUBPROCESS with the remote-TPU ("axon") plugin off
the import path: with the plugin registered, CPU compilation of the
full-size mode-2 scan funnels through the busy remote-compile relay and
takes tens of minutes; the identical program compiles locally in ~10 s.
"""

import json
import os
import os.path as osp
import subprocess
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests.fixture_datasets import make_7scenes_fixture  # noqa: E402
from tests.test_dfnet_convert import build_torch_dfnet_replica  # noqa: E402
from tests.test_nefes_tar import build_reference_tar  # noqa: E402

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))


@pytest.fixture(scope="module")
def artifacts(tmp_path_factory):
    root = tmp_path_factory.mktemp("golden")
    tar = str(root / "nefes_600.tar")
    build_reference_tar(tar, np.random.default_rng(0))
    apr = str(root / "dfnet_chess.pt")
    torch.manual_seed(0)
    torch.save(build_torch_dfnet_replica().state_dict(), apr)
    paths = make_7scenes_fixture(str(root), frames_per_seq=2,
                                 img_hw=(64, 80))

    # paper_result tree: recorded "paper" poses = the fixture's GT test
    # poses (in the colmap-aligned frame the loader produces), so the
    # paper medians evaluate to ~0 and the synthetic run must rely on
    # the tolerance — exercising the real accept/reject logic
    from nefes_tpu.cli.options import options_from_cli
    from nefes_tpu.cli.train import build_scene
    from nefes_tpu.evaluation import save_pose_txt
    opts = options_from_cli([
        "--dataset_type", "7Scenes_colmap", "--datadir", paths["datadir"],
        "--data_root", paths["data_root"], "--df", "8"])
    test_scene = build_scene(opts, train=False)
    gt = np.asarray(test_scene.poses)

    ref_root = root / "refsim"
    scene_dir = ref_root / "paper_result" / "DFNet_NeFeS50_7Scenes_colmap" \
        / "chess"
    os.makedirs(scene_dir)
    save_pose_txt(scene_dir / "chess_test_gt.txt", gt)
    save_pose_txt(scene_dir / "DFNet_chess_NeFeS50_APR_pose_results.txt", gt)
    jitter = gt.copy()
    jitter[:, :3, 3] += 0.05
    save_pose_txt(scene_dir / "DFNet_chess_results.txt", jitter)

    return {"tar": tar, "apr": apr, "ref": str(ref_root), **paths}


def _run_golden(artifacts, workdir, out, tol_t, tol_r):
    env = {k: v for k, v in os.environ.items()
           if k not in ("PYTHONPATH", "JAX_PLATFORMS", "XLA_FLAGS",
                        "PALLAS_AXON_POOL_IPS")}
    env["PYTHONPATH"] = REPO
    env["JAX_PLATFORMS"] = "cpu"
    # own compilation cache: /tmp/jax_cache_tpu (probe.py's default) can
    # hold CPU executables AOT-compiled by the remote relay for a
    # DIFFERENT host (SIGILL-class wedge when loaded locally)
    env["JAX_COMPILATION_CACHE_DIR"] = osp.join(workdir, "jaxcache")
    cmd = [sys.executable, osp.join(REPO, "runtime", "probe.py"), "golden",
           "--tar", artifacts["tar"], "--apr", artifacts["apr"],
           "--scene", "chess", "--datadir", artifacts["datadir"],
           "--data_root", artifacts["data_root"],
           "--dataset_type", "7Scenes_colmap", "--ref", artifacts["ref"],
           "--df", "8", "--opt_iter", "2",
           "--apr_compute_dtype", "float32",
           "--tol_t", str(tol_t), "--tol_r", str(tol_r), "--out", out,
           "--extra_args", "--N_samples", "8", "--N_importance", "8",
           "--tinyscale", "2"]
    try:
        return subprocess.run(cmd, cwd=workdir, env=env, capture_output=True,
                              text=True, timeout=1200)
    except subprocess.TimeoutExpired:
        pytest.skip("golden drive subprocess exceeded its compile budget "
                    "on this host (single-core XLA:CPU compile of the "
                    "full-size mode-2 scan)")


def test_golden_drive_pass_and_fail(artifacts, tmp_path):
    out = str(tmp_path / "GOLDEN.json")
    r = _run_golden(artifacts, str(tmp_path), out, tol_t=1e9, tol_r=1e9)
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-3000:]
    v = json.load(open(out))
    assert v["pass"] is True
    # the paper txts equal GT, so their medians must evaluate to ~0
    assert v["paper_median_t_m"] < 1e-6
    assert v["paper_apr_median_t_m"] == pytest.approx(0.05 * np.sqrt(3),
                                                      rel=1e-3)
    assert np.isfinite(v["ours_median_t_m"])
    # delta bookkeeping is ours - paper
    assert v["delta_t_m"] == pytest.approx(
        v["ours_median_t_m"] - v["paper_median_t_m"], abs=1e-4)

    # tight tolerance vs the zero-error paper poses -> must FAIL
    # (the synthetic random field cannot hit GT)
    r2 = _run_golden(artifacts, str(tmp_path), out, tol_t=-1.0, tol_r=-1.0)
    assert r2.returncode != 0
    v2 = json.load(open(out))
    assert v2["pass"] is False
