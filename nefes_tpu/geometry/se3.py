"""SO(3)/SE(3) exponential maps and quaternion math in pure jnp.

TPU-native replacement for the reference's CUDA extensions:
  * lietorch ``SE3.exp`` (reference script/models/poses.py:32,44) — here a
    closed-form se(3) exp-map (Rodrigues rotation + left-Jacobian V matrix),
    differentiable via JAX autodiff and fully vmappable.
  * pytorch3d ``quaternion_to_matrix``/``matrix_to_quaternion`` (reference
    script/dm/pose_model.py:101-104) — here ≤30-line jnp quaternion math
    (conventions follow script/utils/lie_group_helper.py:84-108).
  * the manual Rodrigues fallback ``make_c2w`` (script/utils/
    lie_group_helper.py:47-81).

All functions operate on the trailing axes and broadcast over leading batch
dims, so they can be vmapped/jitted/scanned freely. Small-angle cases are
handled with series expansions selected by ``jnp.where`` (branch-free — safe
under jit and grad).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

# Pose math is tiny (3x3) but feeds gradients through the renderer into
# SE(3) parameters — run all its matmuls at full f32 precision. (This
# environment's default matmul precision is reduced; the field MLPs keep the
# fast default, geometry must not.)
_PREC = lax.Precision.HIGHEST

_EPS = 1e-8


def skew(v: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) -> (..., 3, 3) skew-symmetric (hat) matrix."""
    zero = jnp.zeros_like(v[..., 0])
    rows = [
        jnp.stack([zero, -v[..., 2], v[..., 1]], axis=-1),
        jnp.stack([v[..., 2], zero, -v[..., 0]], axis=-1),
        jnp.stack([-v[..., 1], v[..., 0], zero], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


def _sinc(theta: jnp.ndarray) -> jnp.ndarray:
    """sin(θ)/θ, series-expanded near 0."""
    small = theta < 1e-4
    t2 = theta * theta
    safe = jnp.where(small, 1.0, theta)
    return jnp.where(small, 1.0 - t2 / 6.0, jnp.sin(safe) / safe)


def _cosc(theta: jnp.ndarray) -> jnp.ndarray:
    """(1-cos θ)/θ², series-expanded near 0."""
    small = theta < 1e-4
    t2 = theta * theta
    safe = jnp.where(small, 1.0, theta)
    return jnp.where(small, 0.5 - t2 / 24.0, (1.0 - jnp.cos(safe)) / (safe * safe))


def _vterm(theta: jnp.ndarray) -> jnp.ndarray:
    """(θ - sin θ)/θ³, series-expanded near 0 (third V-matrix coefficient)."""
    small = theta < 1e-4
    t2 = theta * theta
    safe = jnp.where(small, 1.0, theta)
    return jnp.where(small, 1.0 / 6.0 - t2 / 120.0, (safe - jnp.sin(safe)) / (safe ** 3))


def _safe_norm(r: jnp.ndarray) -> jnp.ndarray:
    """||r|| with a finite gradient at r = 0 (jnp.linalg.norm's gradient is
    NaN there, which would poison the zero-initialised pose deltas of the
    refinement loop on its very first step)."""
    return jnp.sqrt(jnp.sum(r * r, axis=-1) + 1e-24)


def so3_exp(r: jnp.ndarray) -> jnp.ndarray:
    """so(3) axis-angle (..., 3) -> SO(3) rotation matrix (..., 3, 3).

    Rodrigues' formula: R = I + sinc(θ)·K·θ + cosc(θ)·(Kθ)², with K = hat(r)/θ.
    Matches ``Exp`` at reference script/utils/lie_group_helper.py:59-68.
    """
    theta = _safe_norm(r)
    K = skew(r)  # = θ·hat(axis)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=r.dtype), K.shape)
    a = _sinc(theta)[..., None, None]
    b = _cosc(theta)[..., None, None]
    return eye + a * K + b * jnp.matmul(K, K, precision=_PREC)


def so3_left_jacobian(r: jnp.ndarray) -> jnp.ndarray:
    """Left Jacobian V of SO(3): V = I + cosc(θ)·K + vterm(θ)·K².

    Used by the SE(3) exp-map translation: t_world = V @ t (this is what
    lietorch's ``SE3.exp`` computes on GPU for the reference's pose deltas).
    """
    theta = _safe_norm(r)
    K = skew(r)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=r.dtype), K.shape)
    return eye + _cosc(theta)[..., None, None] * K + _vterm(theta)[..., None, None] * jnp.matmul(K, K, precision=_PREC)


def se3_exp(tau: jnp.ndarray) -> jnp.ndarray:
    """se(3) twist (..., 6) ordered ``[t, r]`` -> SE(3) matrix (..., 4, 4).

    The ``[translation, rotation]`` ordering matches lietorch's ``SE3.exp``
    input as used at reference script/models/poses.py:31-32 (``torch.cat([t,
    r])``). Translation is V(r) @ t per the exact exp-map.
    """
    t, r = tau[..., :3], tau[..., 3:6]
    R = so3_exp(r)
    V = so3_left_jacobian(r)
    trans = jnp.einsum("...ij,...j->...i", V, t, precision=_PREC)
    return pack_se3(R, trans)


def make_c2w(r: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle + raw translation -> 4x4 (the reference's non-lietorch
    fallback, script/utils/lie_group_helper.py:71-81: t used directly, no V)."""
    return pack_se3(so3_exp(r), t)


def pack_se3(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) + (..., 3) -> homogeneous (..., 4, 4)."""
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)  # (..., 3, 4)
    bottom = jnp.zeros_like(top[..., :1, :]).at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bottom], axis=-2)


def to_homogeneous(pose34: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 4) -> (..., 4, 4) by appending [0,0,0,1]."""
    return pack_se3(pose34[..., :3, :3], pose34[..., :3, 3])


def compose_delta(delta44: jnp.ndarray, init44: jnp.ndarray) -> jnp.ndarray:
    """Compose a learned delta with an initial pose the way the reference's
    ``LearnPose`` does (script/models/poses.py:36-49):

        R_out = R_delta @ R_init,   t_out = t_delta + t_init

    (NOT a full matrix product — rotation composed, translation added.)
    """
    R = jnp.matmul(delta44[..., :3, :3], init44[..., :3, :3], precision=_PREC)
    t = delta44[..., :3, 3] + init44[..., :3, 3]
    return pack_se3(R, t)


def learn_pose(r: jnp.ndarray, t: jnp.ndarray, init_c2w: jnp.ndarray) -> jnp.ndarray:
    """The reference's LearnPose forward (script/models/poses.py:25-50),
    lietorch path: c2w = compose(SE3.exp([t, r]), init). Differentiable in
    (r, t); vmappable over a leading camera axis."""
    delta = se3_exp(jnp.concatenate([t, r], axis=-1))
    return compose_delta(delta, to_homogeneous(init_c2w[..., :3, :4]))


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion (..., 4) in (w, x, y, z) -> rotation matrix (..., 3, 3).

    Same formula as reference script/utils/lie_group_helper.py:84-97
    (``qvec2rotmat``); works on unnormalised q after normalisation here.
    """
    q = q / jnp.clip(jnp.linalg.norm(q, axis=-1, keepdims=True), _EPS)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    rows = [
        jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1),
        jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1),
        jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1),
    ]
    return jnp.stack(rows, axis=-2)


def rotmat_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix (..., 3, 3) -> quaternion (..., 4), (w, x, y, z), w>=0.

    Branch-free Shepperd-style selection of the numerically best of the four
    candidate constructions (replaces the eigen-solve at reference
    script/utils/lie_group_helper.py:100-108 — eigh of a 4x4 per pose is
    hostile to vmap/TPU; this is pure elementwise math).
    """
    m = R
    t0 = 1.0 + m[..., 0, 0] + m[..., 1, 1] + m[..., 2, 2]
    t1 = 1.0 + m[..., 0, 0] - m[..., 1, 1] - m[..., 2, 2]
    t2 = 1.0 - m[..., 0, 0] + m[..., 1, 1] - m[..., 2, 2]
    t3 = 1.0 - m[..., 0, 0] - m[..., 1, 1] + m[..., 2, 2]

    # one candidate per diagonal-dominance case; each uses the numerically
    # largest sqrt argument as its pivot component
    s0 = jnp.sqrt(jnp.clip(t0, _EPS)) * 2.0
    q0 = jnp.stack([s0 * 0.25,
                    (m[..., 2, 1] - m[..., 1, 2]) / s0,
                    (m[..., 0, 2] - m[..., 2, 0]) / s0,
                    (m[..., 1, 0] - m[..., 0, 1]) / s0], -1)
    s1 = jnp.sqrt(jnp.clip(t1, _EPS)) * 2.0
    q1 = jnp.stack([(m[..., 2, 1] - m[..., 1, 2]) / s1, s1 * 0.25,
                    (m[..., 0, 1] + m[..., 1, 0]) / s1,
                    (m[..., 0, 2] + m[..., 2, 0]) / s1], -1)
    s2 = jnp.sqrt(jnp.clip(t2, _EPS)) * 2.0
    q2 = jnp.stack([(m[..., 0, 2] - m[..., 2, 0]) / s2,
                    (m[..., 0, 1] + m[..., 1, 0]) / s2, s2 * 0.25,
                    (m[..., 1, 2] + m[..., 2, 1]) / s2], -1)
    s3 = jnp.sqrt(jnp.clip(t3, _EPS)) * 2.0
    q3 = jnp.stack([(m[..., 1, 0] - m[..., 0, 1]) / s3,
                    (m[..., 0, 2] + m[..., 2, 0]) / s3,
                    (m[..., 1, 2] + m[..., 2, 1]) / s3, s3 * 0.25], -1)

    ts = jnp.stack([t0, t1, t2, t3], axis=-1)
    idx = jnp.argmax(ts, axis=-1)
    qs = jnp.stack([q0, q1, q2, q3], axis=-2)  # (..., 4 candidates, 4)
    q = jnp.take_along_axis(qs, idx[..., None, None].repeat(4, axis=-1), axis=-2)[..., 0, :]
    # canonical sign: w >= 0 (matches reference rotmat2qvec sign fix)
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


def rotation_angle(R: jnp.ndarray, degrees: bool = True) -> jnp.ndarray:
    """Geodesic rotation angle of (..., 3, 3): θ = acos((tr R − 1)/2).

    Equals the norm of the Rodrigues vector the reference computes with
    ``cv2.Rodrigues`` at script/eval.py:49-50.
    """
    tr = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos = jnp.clip((tr - 1.0) * 0.5, -1.0, 1.0)
    ang = jnp.arccos(cos)
    return jnp.degrees(ang) if degrees else ang


def orthogonalize_rotation(pose: jnp.ndarray) -> jnp.ndarray:
    """SVD re-orthogonalisation of the rotation block of (..., 3, 4) poses
    (the reference's ``svd_reg``, script/dm/DFM_pose_refine.py:119-129)."""
    R = pose[..., :3, :3]
    u, _, vt = jnp.linalg.svd(R, full_matrices=False)
    Rs = jnp.matmul(u, vt, precision=_PREC)
    return jnp.concatenate([Rs, pose[..., :3, 3:4]], axis=-1)
