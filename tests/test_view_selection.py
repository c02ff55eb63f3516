"""Frustum-overlap view selection + spiral path tests (SURVEY row 6) and
profiling hooks smoke (row 51)."""

import numpy as np
import pytest

from nefes_tpu.data.view_selection import (
    default_frustum_params, fetch_unique_view_index, frustum_overlap,
    generate_render_pose, generate_sampling_frustum, init_k,
    render_path_spiral, select_nearest_neighbor_views,
)


def _ref_overlap(pose0, pose1, frustum, K, xr, yr):
    """The reference's per-point implementation
    (load_7Scenes.py:99-112) as the parity twin."""
    R0, t0 = pose0[:3, :3], pose0[:3, 3]
    R1, t1 = pose1[:3, :3], pose1[:3, 3]
    R10 = R1.T @ R0
    t10 = R1.T @ (t0 - t1)
    P = (R10 @ frustum.T).T + t10
    p = (K @ P.T).T
    p = p / p[:, 2:3]
    inside = [(0 < q[0] < xr) and (0 < q[1] < yr) for q in p]
    return np.sum(inside) / len(inside)


def _poses_on_arc(n, radius=1.5, spread=1.2):
    poses = []
    for a in np.linspace(-spread, spread, n):
        c, s = np.cos(a), np.sin(a)
        R = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
        t = np.array([radius * s, 0.0, radius * (1 - c)])
        poses.append(np.concatenate([R, t[:, None]], axis=1))
    return np.stack(poses)


def test_frustum_overlap_matches_reference_impl():
    K, frustum, xr, yr = default_frustum_params((0.0, 1.0))
    frustum = frustum[::37]   # subsample for test speed
    poses = _poses_on_arc(5)
    for i in (0, 2):
        want = np.array([_ref_overlap(poses[i], poses[j], frustum, K,
                                      xr, yr) for j in range(5)])
        got = frustum_overlap(poses[i], poses, frustum, K, xr, yr)
        np.testing.assert_allclose(got, want, atol=1e-12)


def test_overlap_identity_and_disjoint():
    K, frustum, xr, yr = default_frustum_params((0.0, 1.0))
    p0 = np.concatenate([np.eye(3), np.zeros((3, 1))], axis=1)
    assert frustum_overlap(p0, p0, frustum, K, xr, yr) == pytest.approx(1.0)
    # NOTE: an exact 180-degree flip at the same position aliases to
    # overlap 1.0 (projective sign cancellation) — in the REFERENCE's
    # math too; a translated camera is the meaningful disjoint case.
    p_far = p0.copy()
    p_far[:, 3] = [100.0, 0.0, 0.0]
    assert frustum_overlap(p0, p_far, frustum, K, xr, yr) < 0.05


def test_unique_view_selection_and_neighbors(tmp_path):
    poses = _poses_on_arc(30, spread=2.0)
    idx = fetch_unique_view_index(poses, threshold=0.6,
                                  near_far=(0.0, 1.0),
                                  save_path=str(tmp_path / "u.txt"))
    assert idx[0] == 0 and len(idx) >= 2
    assert (tmp_path / "u.txt").exists()
    nn = select_nearest_neighbor_views(poses, 0.6, idx,
                                       near_far=(0.0, 1.0), stride=1)
    assert len(nn) > 0
    assert not set(nn) & set(idx.tolist())


def test_spiral_poses_are_valid_cameras():
    poses = _poses_on_arc(8)
    out = generate_render_pose(poses, bds=np.array([0.5, 4.0]),
                               n_views=16, rng=np.random.default_rng(0))
    assert out.shape == (16, 3, 4)
    for p in out[:4]:
        R = p[:3, :3]
        np.testing.assert_allclose(R.T @ R, np.eye(3), atol=1e-10)

    spiral = render_path_spiral(poses[0], np.array([0, 1, 0.0]),
                                [0.2, 0.2, 0.2], 2.0, n_views=8)
    assert spiral.shape == (8, 3, 4)


def test_sampling_frustum_points_project_inside():
    K = init_k(100.0, 50.0, 40.0)
    f = generate_sampling_frustum(0.2, 2.0, K, 100.0, 80.0)
    assert len(f) > 0
    p = f @ K.T
    p = p / p[:, 2:3]
    assert np.all((p[:, 0] > 0) & (p[:, 0] < 100)
                  & (p[:, 1] > 0) & (p[:, 1] < 80))


def test_phase_timer_and_trace(tmp_path):
    import jax.numpy as jnp
    from nefes_tpu.utils.profiling import (
        PhaseTimer, end_timer_and_print, start_timer, trace,
    )
    t = PhaseTimer()
    with t.phase("a"):
        jnp.sum(jnp.ones(8)).block_until_ready()
    with t.phase("a"):
        pass
    assert t.counts["a"] == 2 and "a:" in t.report()
    with trace(None):   # no-op path
        pass
    t0 = start_timer()
    assert end_timer_and_print(t0, "test") >= 0.0
