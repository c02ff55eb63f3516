"""Tests for the legacy/alternative field family + ATE evaluation."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nefes_tpu.fields import (
    PlainNeRF, NeRFW, NeRFHTcnn, HashGridEncoding, GiraffeDecoder,
    spherical_harmonics_deg4, trunc_exp, trunc_softplus,
)


def test_trunc_exp_value_and_clamped_grad():
    x = jnp.asarray([0.0, 1.0, 20.0])
    np.testing.assert_allclose(np.asarray(trunc_exp(x)), np.exp([0, 1, 20]),
                               rtol=1e-6)
    g = jax.grad(lambda v: trunc_exp(v).sum())(x)
    # grad at 20 uses clamped input 15
    np.testing.assert_allclose(np.asarray(g),
                               [1.0, np.e, np.exp(15.0)], rtol=1e-5)
    assert np.isfinite(float(trunc_softplus(jnp.asarray(100.0))))


def test_plain_nerf():
    m = PlainNeRF(depth=2, width=32, skips=(1,), in_channels_xyz=9,
                  in_channels_dir=6)
    x, d = jnp.zeros((4, 9)), jnp.zeros((4, 6))
    v = m.init(jax.random.key(0), x, d)
    out = m.apply(v, x, d)
    assert out["static_rgb"].shape == (4, 3)
    assert float(out["static_rgb"].min()) >= 0
    assert set(m.apply(v, x, sigma_only=True)) == {"static_sigma"}


def test_nerfw_fine_appearance_and_transient():
    m = NeRFW(typ="fine", depth=2, width=32, skips=(1,), in_channels_xyz=9,
              in_channels_dir=6, in_channels_a=5, in_channels_t=3)
    x, d = jnp.zeros((4, 7, 9)), jnp.zeros((4, 7, 6))
    a, t = jnp.ones((4, 7, 5)), jnp.ones((4, 7, 3))
    v = m.init(jax.random.key(0), x, d, a, t)
    out = m.apply(v, x, d, a, t, output_transient=True)
    assert out["static_rgb"].shape == (4, 7, 3)
    assert out["transient_beta"].shape == (4, 7)
    out2 = m.apply(v, x, d, a, t, output_transient=False)
    assert "transient_rgb" not in out2


def test_sh_deg4_orthonormal_dc():
    # DC coefficient is 1/sqrt(4pi) for any direction
    d = np.random.default_rng(0).standard_normal((32, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    sh = np.asarray(spherical_harmonics_deg4(jnp.asarray(d)))
    assert sh.shape == (32, 16)
    np.testing.assert_allclose(sh[:, 0], 1 / np.sqrt(4 * np.pi), atol=1e-6)


def test_hashgrid_encoding_interpolates():
    m = HashGridEncoding(n_levels=4, max_resolution=64)
    x = jnp.asarray([[0.5, 0.5, 0.5], [0.2, 0.7, 0.9]])
    v = m.init(jax.random.key(0), x)
    out = m.apply(v, x)
    assert out.shape == (2, 8)
    # continuity: nearby points give nearby encodings
    out2 = m.apply(v, x + 1e-5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-3)
    # differentiable wrt position
    g = jax.grad(lambda p: m.apply(v, p).sum())(x)
    assert np.isfinite(np.asarray(g)).all()


def test_nerfh_tcnn_field():
    m = NeRFHTcnn(bound=4.0, hash_level=4, encode_transient=True)
    xyz = jnp.asarray(np.random.default_rng(0).uniform(-2, 2, (6, 3)),
                      dtype=jnp.float32)
    d = jnp.asarray([[0.0, 0.0, 1.0]] * 6)
    a = jnp.ones((6, 5))
    t = jnp.ones((6, 2))
    v = m.init(jax.random.key(0), xyz, d, a, t, output_transient=True)
    out = m.apply(v, xyz, d, a, t, output_transient=True)
    assert out["static_rgb"].shape == (6, 3)
    assert out["transient_sigma"].shape == (6,)
    assert float(out["static_sigma"].min()) >= 0
    out_s = m.apply(v, xyz, sigma_only=True)
    assert set(out_s) == {"static_sigma"}


def test_giraffe_decoder():
    m = GiraffeDecoder(n_blocks=3, out_hw=(48, 64))
    x = jnp.zeros((1, 6, 8, 128))
    v = m.init(jax.random.key(0), x)
    out = m.apply(v, x)
    assert out.shape == (1, 48, 64, 3)
    assert 0.0 <= float(out.min()) and float(out.max()) <= 1.0
    rgbs = m.apply(v, x, return_hier_rgbs=True)
    assert len(rgbs) == 3
    assert rgbs[-1].shape == (1, 48, 64, 3)


def test_ate_alignment():
    from nefes_tpu.evaluation.ate import (
        umeyama_alignment, align_ate_c2b_use_a2b, compute_ate,
    )
    from scipy.spatial.transform import Rotation
    rng = np.random.default_rng(0)
    src = rng.standard_normal((50, 3))
    R = Rotation.from_rotvec([0.2, -0.4, 0.1]).as_matrix()
    s_true, t_true = 1.7, np.array([1.0, -2.0, 0.5])
    dst = s_true * src @ R.T + t_true
    s, R_est, t_est = umeyama_alignment(src, dst)
    assert s == pytest.approx(s_true, rel=1e-6)
    np.testing.assert_allclose(R_est, R, atol=1e-8)
    np.testing.assert_allclose(t_est, t_true, atol=1e-8)

    # full trajectory alignment drives ATE to ~0 for a sim3-related pair
    traj_a = np.tile(np.eye(4)[:3], (50, 1, 1)).astype(np.float32)
    traj_a[:, :3, 3] = src
    traj_b = traj_a.copy()
    traj_b[:, :3, :3] = R @ traj_a[:, :3, :3]
    traj_b[:, :3, 3] = dst
    stats = compute_ate(traj_a, traj_b, align_a2b="sim3")
    assert stats["median_t_m"] < 1e-5
    assert stats["median_r_deg"] < 1e-3
    aligned = align_ate_c2b_use_a2b(traj_a, traj_b)
    assert aligned.shape == (50, 4, 4)
