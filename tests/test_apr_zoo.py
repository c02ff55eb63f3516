"""APR model-zoo smoke/shape tests (reference pose_model.py +
mstransformer/)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nefes_tpu.features.posenet import (
    PoseNetV2, EfficientNetB3APR, PoseNetRes34, MapNet, qexp,
    mapnet_output_to_pose12,
)


def _img(b=1, h=64, w=64):
    return jnp.asarray(np.random.default_rng(0).uniform(0, 1, (b, h, w, 3)),
                       dtype=jnp.float32)


def test_posenet_v2():
    m = PoseNetV2()
    x = _img()
    v = m.init(jax.random.key(0), x)
    out = m.apply(v, x)
    assert out.shape == (1, 12)
    assert np.isfinite(np.asarray(out)).all()


def test_posenet_res34():
    m = PoseNetRes34()
    x = _img()
    v = m.init(jax.random.key(0), x)
    out = m.apply(v, x)
    assert out.shape == (1, 12)


def test_efficientnet_b3():
    m = EfficientNetB3APR()
    x = _img()
    v = m.init(jax.random.key(0), x)
    out = m.apply(v, x)
    assert out.shape == (1, 12)
    # B3 head must be 1536 channels (pose_model.py:235)
    assert v["params"]["fc_pose"]["kernel"].shape[0] == 1536


def test_mapnet_qexp_and_pose():
    # qexp of zero logq -> identity quaternion
    q = np.asarray(qexp(jnp.zeros((2, 3))))
    np.testing.assert_allclose(q, [[1, 0, 0, 0]] * 2, atol=1e-6)
    out6 = jnp.asarray([[1.0, 2.0, 3.0, 0.0, 0.0, 0.0]])
    pose = np.asarray(mapnet_output_to_pose12(out6)).reshape(3, 4)
    np.testing.assert_allclose(pose[:, :3], np.eye(3), atol=1e-6)
    np.testing.assert_allclose(pose[:, 3], [1, 2, 3], atol=1e-6)


def test_mapnet_module():
    m = MapNet()
    x = _img()
    v = m.init(jax.random.key(0), x)
    out = m.apply(v, x)
    assert out.shape == (1, 12)
    R = np.asarray(out).reshape(3, 4)[:, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)


def test_mstransformer():
    from nefes_tpu.features.mstransformer import (
        MSTransPoseNet, ems_pose_to_matrix,
    )
    m = MSTransPoseNet(num_scenes=3, layers=2)
    x = _img(2, 240, 320)
    v = m.init(jax.random.key(0), x)
    out = m.apply(v, x)
    assert out["pose"].shape == (2, 7)
    assert out["scene_log_distr"].shape == (2, 3)
    assert out["max_indices"].shape == (2,)
    # log-softmax sums to 1 in prob space
    np.testing.assert_allclose(
        np.exp(np.asarray(out["scene_log_distr"])).sum(-1), 1.0, atol=1e-5)
    pose = ems_pose_to_matrix(out["pose"])
    assert pose.shape == (2, 3, 4)
    R = np.asarray(pose)[0, :3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-4)


def test_ems_single_head():
    from nefes_tpu.features.mstransformer import MSTransPoseNet
    m = MSTransPoseNet(num_scenes=1, layers=1, single_head=True)
    x = _img(1, 128, 128)
    v = m.init(jax.random.key(0), x)
    out = m.apply(v, x)
    assert out["pose"].shape == (1, 7)


def test_cambridge_coordinate_conversion():
    """ems Cambridge conversion must match the numpy transforms pipeline."""
    from nefes_tpu.features.mstransformer import _cambridge_to_opengl_jnp
    from nefes_tpu.geometry.transforms import (
        cambridge_to_opengl, center_poses,
    )
    rng = np.random.default_rng(3)
    from scipy.spatial.transform import Rotation
    pose = np.zeros((4, 3, 4), np.float32)
    pose[:, :3, :3] = Rotation.random(4, random_state=0).as_matrix()
    pose[:, :3, 3] = rng.standard_normal((4, 3))
    pose_avg = np.eye(4)[:3].astype(np.float64)
    pose_avg[:3, 3] = [0.5, -0.2, 0.1]

    ours = np.asarray(_cambridge_to_opengl_jnp(jnp.asarray(pose),
                                               jnp.asarray(pose_avg)))
    centered, _ = center_poses(pose.astype(np.float64), pose_avg)
    expected = cambridge_to_opengl(centered)
    np.testing.assert_allclose(ours, expected, atol=1e-5)
