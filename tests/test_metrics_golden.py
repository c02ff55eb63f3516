"""Golden-file acceptance test: reproduce the reference's paper-table medians
bit-for-bit (to 3 decimals, the precision of SURVEY.md §6 / BASELINE.md) from
the recorded pose txts in /root/reference/paper_result. This mirrors the
reference's own `eval.sh` acceptance flow (script/eval.py)."""

import numpy as np
import pytest

from nefes_tpu.evaluation import (
    evaluate_scene, paper_result_dir, pose_errors, summarize,
)

# (scene, frames, DFNet median (m, deg), +NeFeS50 median (m, deg)) — §6 table
SEVEN_SCENES_EXPECTED = [
    ("chess", 2000, (0.033, 1.12), (0.017, 0.57)),
    ("fire", 2000, (0.058, 2.29), (0.020, 0.74)),
    ("heads", 1000, (0.042, 2.24), (0.020, 1.28)),
    ("office", 4000, (0.059, 1.54), (0.019, 0.56)),
    ("pumpkin", 2000, (0.067, 1.89), (0.020, 0.55)),
    ("redkitchen", 5000, (0.066, 1.72), (0.020, 0.57)),
    ("stairs", 1000, (0.120, 2.63), (0.046, 1.28)),
]

CAMBRIDGE_EXPECTED = [
    ("KingsCollege", 343, (0.732, 2.37), (0.366, 0.54)),
    ("OldHospital", 182, (1.995, 2.98), (0.522, 0.88)),
    ("ShopFacade", 103, (0.674, 2.20), (0.149, 0.53)),
    ("StMarysChurch", 530, (1.371, 4.03), (0.372, 1.14)),
]


def _check(base, scene, frames, apr_median, nefes_median):
    for refined, (t_exp, r_exp) in ((False, apr_median), (True, nefes_median)):
        s = evaluate_scene(base / scene, scene, refined=refined)
        assert s["n_frames"] == frames
        assert s["median_t_m"] == pytest.approx(t_exp, abs=5e-4), (scene, refined)
        assert s["median_r_deg"] == pytest.approx(r_exp, abs=5e-3), (scene, refined)


@pytest.mark.parametrize("scene,frames,apr,nefes", SEVEN_SCENES_EXPECTED)
def test_seven_scenes_colmap_golden(reference_root, scene, frames, apr, nefes):
    base = paper_result_dir(reference_root, "7Scenes_colmap")
    _check(base, scene, frames, apr, nefes)


@pytest.mark.parametrize("scene,frames,apr,nefes", CAMBRIDGE_EXPECTED)
def test_cambridge_golden(reference_root, scene, frames, apr, nefes):
    base = paper_result_dir(reference_root, "Cambridge")
    _check(base, scene, frames, apr, nefes)


def test_accuracy_buckets_5cm5deg(reference_root):
    """5cm/5° bucket after NeFeS50 matches BASELINE.md row (91.8% on chess)."""
    base = paper_result_dir(reference_root, "7Scenes_colmap")
    s = evaluate_scene(base / "chess", "chess", refined=True)
    assert s["accuracy"]["5cm/5deg"] == pytest.approx(91.8, abs=0.1)


def test_pose_errors_identity():
    poses = np.random.default_rng(0).standard_normal((10, 3, 4))
    err = pose_errors(poses, poses)
    np.testing.assert_allclose(err, 0.0, atol=1e-5)


def test_summarize_keys():
    err = np.array([[0.01, 0.5], [0.3, 3.0]])
    s = summarize(err)
    assert s["median_t_m"] == pytest.approx(0.155)
    assert s["accuracy"]["50cm/5deg"] == pytest.approx(100.0)
    assert s["accuracy"]["1cm/1deg"] == pytest.approx(0.0)
