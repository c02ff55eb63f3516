"""Pose-error metrics — the reference's acceptance layer, re-implemented.

Error definitions match reference script/eval.py:34-51:
  * translation error = ||t_pred − t_gt||  (meters)
  * rotation error    = ||Rodrigues(R_pred @ R_gtᵀ)|| in degrees
    (the geodesic angle — computed here via trace, identical value)
and the accuracy buckets match eval.py:53-90.

Host-side numpy: these run once per evaluation over a few thousand poses;
keeping them off-device avoids polluting the jit cache with tiny kernels.
A jnp twin (`pose_errors_jnp`) exists for in-graph use inside refinement
scans.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

# (name, t_threshold_m, r_threshold_deg) — order matches eval.py printout
ACCURACY_BUCKETS = (
    ("500cm/10deg", 5.0, 10.0),
    ("50cm/5deg", 0.5, 5.0),
    ("25cm/2deg", 0.25, 2.0),
    ("10cm/5deg", 0.1, 5.0),
    ("5cm/5deg", 0.05, 5.0),
    ("2cm/2deg", 0.02, 2.0),
    ("1cm/1deg", 0.01, 1.0),
)


def rotation_angle_np(R: np.ndarray, degrees: bool = True) -> np.ndarray:
    """Geodesic angle of (..., 3, 3) matrices that are approximately
    rotations.

    APR networks regress 9 rotation entries directly, so recorded poses are
    not exactly orthonormal; ``cv2.Rodrigues`` (used by reference
    eval.py:49-50) projects to the nearest SO(3) element before extracting
    the angle. We reproduce that with an SVD projection — without it the
    7-Scenes chess APR median comes out 1.247° instead of the paper's 1.12°.
    """
    u, _, vt = np.linalg.svd(R)
    Rp = u @ vt
    tr = np.trace(Rp, axis1=-2, axis2=-1)
    ang = np.arccos(np.clip((tr - 1.0) * 0.5, -1.0, 1.0))
    return np.degrees(ang) if degrees else ang


def pose_errors(pred: np.ndarray, gt: np.ndarray) -> np.ndarray:
    """Per-frame SE(3) errors.

    pred, gt: (N, 3, 4) or (N, 4, 4) or (N, 12) pose arrays.
    Returns (N, 2): [translation error (m), rotation error (deg)].
    """
    pred = np.asarray(pred, dtype=np.float64).reshape(-1, pred.shape[-1] if pred.ndim > 2 else 12)
    pred = pred.reshape(len(pred), -1)[:, :12].reshape(-1, 3, 4)
    gt = np.asarray(gt, dtype=np.float64)
    gt = gt.reshape(len(gt), -1)[:, :12].reshape(-1, 3, 4)
    t_err = np.linalg.norm(pred[:, :3, 3] - gt[:, :3, 3], axis=-1)
    r_rel = pred[:, :3, :3] @ np.transpose(gt[:, :3, :3], (0, 2, 1))
    r_err = rotation_angle_np(r_rel)
    return np.stack([t_err, r_err], axis=-1)


def pose_errors_jnp(pred: jnp.ndarray, gt: jnp.ndarray):
    """jit-safe twin of :func:`pose_errors` for (..., 3, 4) arrays.
    Returns (t_err, r_err_deg)."""
    t_err = jnp.linalg.norm(pred[..., :3, 3] - gt[..., :3, 3], axis=-1)
    r_rel = pred[..., :3, :3] @ jnp.swapaxes(gt[..., :3, :3], -1, -2)
    tr = r_rel[..., 0, 0] + r_rel[..., 1, 1] + r_rel[..., 2, 2]
    r_err = jnp.degrees(jnp.arccos(jnp.clip((tr - 1.0) * 0.5, -1.0, 1.0)))
    return t_err, r_err


def accuracy_stats(errors: np.ndarray) -> dict[str, float]:
    """Fraction (percent) of frames within each (t, r) threshold pair
    (reference eval.py:53-90)."""
    errors = np.asarray(errors)
    out = {}
    for name, t_th, r_th in ACCURACY_BUCKETS:
        ok = (errors[:, 0] < t_th) & (errors[:, 1] < r_th)
        out[name] = float(ok.mean() * 100.0)
    return out


def summarize(errors: np.ndarray) -> dict:
    """Median/mean errors + accuracy buckets — the numbers the reference
    prints at eval.py:121-132 and DFM_APR_refine.py:261-266."""
    errors = np.asarray(errors)
    med = np.median(errors, axis=0)
    mean = np.mean(errors, axis=0)
    return {
        "median_t_m": float(med[0]),
        "median_r_deg": float(med[1]),
        "mean_t_m": float(mean[0]),
        "mean_r_deg": float(mean[1]),
        "accuracy": accuracy_stats(errors),
        "n_frames": int(len(errors)),
    }


def load_pose_txt(path) -> np.ndarray:
    """Load an (N, 12) flattened-pose txt in the reference's paper_result
    format (one 3×4 row-major pose per line) -> (N, 3, 4)."""
    arr = np.loadtxt(path)
    return arr.reshape(arr.shape[0], 3, 4).astype(np.float32)


def save_pose_txt(path, poses: np.ndarray) -> None:
    """Save (N, 3, 4) poses in the reference txt format
    (np.savetxt default %.18e — matches DFM_APR_refine.py:270-276)."""
    poses = np.asarray(poses).reshape(-1, 12)
    np.savetxt(path, poses)
