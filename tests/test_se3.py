"""Unit tests for the SE(3)/quaternion core against scipy ground truth."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

from nefes_tpu.geometry import (
    se3_exp, so3_exp, make_c2w, quat_to_rotmat, rotmat_to_quat,
    rotation_angle, learn_pose, compose_delta, to_homogeneous,
    orthogonalize_rotation, so3_left_jacobian,
)

rng = np.random.default_rng(0)


def random_rotvecs(n, scale=2.0):
    return (rng.standard_normal((n, 3)) * scale).astype(np.float32)


def test_so3_exp_matches_scipy():
    r = random_rotvecs(64)
    ours = np.asarray(so3_exp(jnp.asarray(r)))
    ref = R.from_rotvec(r).as_matrix()
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_so3_exp_small_angle_stable():
    r = np.array([[1e-9, -1e-9, 1e-10], [0, 0, 0]], dtype=np.float32)
    out = np.asarray(so3_exp(jnp.asarray(r)))
    np.testing.assert_allclose(out, np.eye(3)[None].repeat(2, 0), atol=1e-6)
    # gradient must be finite at zero
    g = jax.grad(lambda x: so3_exp(x).sum())(jnp.zeros(3))
    assert np.all(np.isfinite(np.asarray(g)))


def test_se3_exp_matches_closed_form():
    # SE(3) exp: R from rotvec, translation = V(r) @ t
    tau = rng.standard_normal((32, 6)).astype(np.float32)
    out = np.asarray(se3_exp(jnp.asarray(tau)))
    for i in range(32):
        t, r = tau[i, :3], tau[i, 3:]
        Rm = R.from_rotvec(r).as_matrix()
        theta = np.linalg.norm(r)
        K = np.array([[0, -r[2], r[1]], [r[2], 0, -r[0]], [-r[1], r[0], 0]])
        V = (np.eye(3) + (1 - np.cos(theta)) / theta**2 * K
             + (theta - np.sin(theta)) / theta**3 * K @ K)
        np.testing.assert_allclose(out[i, :3, :3], Rm, atol=2e-5)
        np.testing.assert_allclose(out[i, :3, 3], V @ t, atol=2e-5)
        np.testing.assert_allclose(out[i, 3], [0, 0, 0, 1], atol=0)


def test_se3_exp_zero_is_identity():
    out = np.asarray(se3_exp(jnp.zeros(6)))
    np.testing.assert_allclose(out, np.eye(4), atol=1e-7)


def test_quat_roundtrip():
    q = rng.standard_normal((128, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    q *= np.sign(q[:, :1])  # canonical w>=0
    Rm = quat_to_rotmat(jnp.asarray(q))
    q2 = np.asarray(rotmat_to_quat(Rm))
    np.testing.assert_allclose(q2, q, atol=1e-5)


def test_quat_to_rotmat_matches_scipy():
    q = rng.standard_normal((64, 4)).astype(np.float64)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    ours = np.asarray(quat_to_rotmat(jnp.asarray(q)))
    # scipy uses (x, y, z, w)
    ref = R.from_quat(q[:, [1, 2, 3, 0]]).as_matrix()
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_rotation_angle():
    r = random_rotvecs(64, scale=1.0)
    # geodesic angle equals |r| only for |r| <= pi; rescale the tail
    n = np.linalg.norm(r, axis=-1, keepdims=True)
    r = np.where(n > 3.0, r * (3.0 / n), r).astype(np.float32)
    Rm = R.from_rotvec(r).as_matrix()
    ours = np.asarray(rotation_angle(jnp.asarray(Rm), degrees=False))
    ref = np.linalg.norm(r, axis=-1)
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_learn_pose_composition():
    """Zero delta must return the initial pose exactly (the reference's
    LearnPose contract at iteration 0)."""
    init = rng.standard_normal((5, 3, 4)).astype(np.float32)
    out = np.asarray(learn_pose(jnp.zeros((5, 3)), jnp.zeros((5, 3)),
                                jnp.asarray(init)))
    np.testing.assert_allclose(out[:, :3, :4], init, atol=1e-6)


def test_learn_pose_composition_rule():
    """R_out = R_delta @ R_init, t_out = t_delta + t_init (poses.py:36-49)."""
    init = np.zeros((1, 3, 4), dtype=np.float32)
    init[0, :3, :3] = R.from_rotvec([0.3, -0.2, 0.5]).as_matrix()
    init[0, :3, 3] = [1.0, 2.0, 3.0]
    r = jnp.asarray([[0.1, 0.2, -0.3]])
    t = jnp.asarray([[0.5, -0.5, 0.25]])
    out = np.asarray(learn_pose(r, t, jnp.asarray(init)))
    delta = np.asarray(se3_exp(jnp.concatenate([t, r], axis=-1)))
    np.testing.assert_allclose(out[0, :3, :3],
                               delta[0, :3, :3] @ init[0, :3, :3], atol=1e-5)
    np.testing.assert_allclose(out[0, :3, 3],
                               delta[0, :3, 3] + init[0, :3, 3], atol=1e-5)


def test_learn_pose_differentiable():
    init = jnp.eye(4)[None, :3, :4]

    def loss(r, t):
        pose = learn_pose(r, t, init)
        return jnp.sum(pose[..., :3, 3] ** 2) + jnp.sum(pose[..., :3, :3])

    gr, gt = jax.grad(loss, argnums=(0, 1))(jnp.full((1, 3), 0.1), jnp.full((1, 3), 0.1))
    assert np.all(np.isfinite(np.asarray(gr)))
    assert np.all(np.isfinite(np.asarray(gt)))
    assert float(jnp.abs(gt).sum()) > 0


def test_orthogonalize_rotation():
    pose = rng.standard_normal((8, 3, 4)).astype(np.float32)
    out = np.asarray(orthogonalize_rotation(jnp.asarray(pose)))
    RtR = out[:, :3, :3] @ np.transpose(out[:, :3, :3], (0, 2, 1))
    np.testing.assert_allclose(RtR, np.eye(3)[None].repeat(8, 0), atol=1e-5)
    np.testing.assert_allclose(out[:, :3, 3], pose[:, :3, 3], atol=0)


def test_make_c2w_vs_lie_fallback():
    """make_c2w uses raw t (no V matrix) — reference lie_group_helper.py:71."""
    r = jnp.asarray([0.4, -0.1, 0.2])
    t = jnp.asarray([1.0, 2.0, 3.0])
    out = np.asarray(make_c2w(r, t))
    np.testing.assert_allclose(out[:3, 3], [1.0, 2.0, 3.0], atol=0)
    np.testing.assert_allclose(out[:3, :3],
                               R.from_rotvec(np.asarray(r)).as_matrix(), atol=1e-6)
