"""Golden-file harness against the reference's recorded paper results.

The reference's de-facto acceptance test is ``eval.sh``: recompute the paper
table medians from the pose txts in ``paper_result/`` (SURVEY.md §4). This
module reproduces that end-to-end from the txt files alone — no images or
GPU required — and is used both by the test suite and the `nefes-eval` CLI.
"""

from __future__ import annotations

from pathlib import Path

from nefes_tpu.evaluation.metrics import load_pose_txt, pose_errors, summarize

# Scene name -> dataset folder inside paper_result/
SEVEN_SCENES = ("chess", "fire", "heads", "office", "pumpkin", "redkitchen", "stairs")
CAMBRIDGE_SCENES = ("KingsCollege", "OldHospital", "ShopFacade", "StMarysChurch")


def paper_result_dir(reference_root: str | Path, dataset: str) -> Path:
    root = Path(reference_root) / "paper_result"
    if dataset == "7Scenes_colmap":
        return root / "DFNet_NeFeS50_7Scenes_colmap"
    if dataset == "Cambridge":
        return root / "DFNet_NeFeS50_Cambridge"
    raise ValueError(f"unknown dataset {dataset!r}")


def evaluate_scene(scene_dir: str | Path, scene: str, refined: bool = True) -> dict:
    """Compute error summary for one scene from recorded result txts.

    scene_dir: e.g. <ref>/paper_result/DFNet_NeFeS50_7Scenes_colmap/chess
    refined: True -> DFNet+NeFeS50 poses; False -> initial DFNet poses.
    """
    scene_dir = Path(scene_dir)
    suffix = "_NeFeS50_APR_pose_results.txt" if refined else "_results.txt"
    pred = load_pose_txt(scene_dir / f"DFNet_{scene}{suffix}")
    gt = load_pose_txt(scene_dir / f"{scene}_test_gt.txt")
    assert pred.shape == gt.shape, (pred.shape, gt.shape)
    return summarize(pose_errors(pred, gt))


def evaluate_all(reference_root: str | Path) -> dict:
    """Every scene of both datasets, refined and unrefined — the full §6
    baseline table."""
    out = {}
    for dataset, scenes in (("7Scenes_colmap", SEVEN_SCENES),
                            ("Cambridge", CAMBRIDGE_SCENES)):
        base = paper_result_dir(reference_root, dataset)
        for scene in scenes:
            for refined in (False, True):
                key = f"{dataset}/{scene}/" + ("NeFeS50" if refined else "APR")
                out[key] = evaluate_scene(base / scene, scene, refined)
    return out
