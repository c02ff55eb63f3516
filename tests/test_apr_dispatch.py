"""APR loader dispatch (features/apr_loader.py) + generalized mode-2
refinement across the zoo — the load_APR_and_FeatureNet parity gate
(reference direct_pose_model.py:148-173)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nefes_tpu.features.apr_loader import load_apr

HW = (48, 64)


@pytest.mark.parametrize("kind", ["DFNet", "PoseNet", "PoseNetV2",
                                  "EfficientNetB3", "MapNet"])
def test_load_apr_random_init_pose_shapes(kind):
    module, variables, pose_fn = load_apr(kind, None, HW,
                                          jax.random.key(0), feature_dim=8)
    img = jnp.linspace(0, 1, HW[0] * HW[1] * 3).reshape(*HW, 3)
    pose = pose_fn(variables, img)
    assert pose.shape == (3, 4)
    assert np.all(np.isfinite(np.asarray(pose)))


def test_load_apr_mstransformer():
    module, variables, pose_fn = load_apr(
        "MsTransformer", None, (256, 320), jax.random.key(0))
    img = jnp.zeros((256, 320, 3)) + 0.4
    pose = pose_fn(variables, img)
    assert pose.shape == (3, 4)
    assert np.all(np.isfinite(np.asarray(pose)))
    # rotation block must be a valid rotation (unit quaternion -> R)
    R = np.asarray(pose)[:, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-4)


def test_refine_apr_single_with_posenetv2():
    """Mode-2 refinement drives gradients into a non-DFNet APR."""
    from nefes_tpu.refine import RefineConfig, refine_apr_single
    from nefes_tpu.train.model import ModelConfig, NeFeSModel

    cfg = ModelConfig.tiny()
    model = NeFeSModel(cfg)
    variables = model.init_variables(jax.random.key(0))
    apr_module, apr_vars, _ = load_apr("PoseNetV2", None, HW,
                                       jax.random.key(1))
    rcfg_render = cfg.render_config(n_samples=6, n_importance=6,
                                    perturb=False,
                                    output_transient=False).test()
    rcfg = RefineConfig(opt_iter=2, learning_rate=1e-4)
    img = jnp.linspace(0, 1, HW[0] * HW[1] * 3).reshape(*HW, 3)
    target = jnp.asarray(np.random.default_rng(0).normal(
        size=(*HW, cfg.feature_dim)).astype(np.float32))
    out = refine_apr_single(
        model, variables, apr_module, apr_vars, img, target,
        jnp.zeros(10), jnp.asarray([1.0, 1.0, 0, 0, 0]),
        (12, 16, 10.0), (*HW, 40.0), 0.3, 4.0, rcfg_render, rcfg,
        svd_reg=True, apr_kind="PoseNetV2")
    assert out["refined_pose"].shape == (3, 4)
    assert np.all(np.isfinite(np.asarray(out["losses"])))
    # the APR weights moved: refined != initial
    diff = np.abs(np.asarray(out["refined_pose"])
                  - np.asarray(out["initial_pose"])).max()
    assert diff > 0
