"""Validation-renderer + semantic-mask wiring tests (VERDICT r1 items 3/5):

  * render_path_with_feature / render_path / render_test produce metrics
    and PNG artifacts on a tiny synthetic scene
  * masked vs unmasked refinement losses measurably differ
  * masked stage-2 patch loss excludes dynamic pixels
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nefes_tpu.data.synthetic import make_synthetic_scene
from nefes_tpu.train.model import ModelConfig, NeFeSModel
from nefes_tpu.train.losses import nefes_training_loss


@pytest.fixture(scope="module")
def scene():
    return make_synthetic_scene(n_views=6, H=48, W=48)


@pytest.fixture(scope="module")
def setup(scene):
    cfg = ModelConfig.tiny()
    model = NeFeSModel(cfg)
    variables = model.init_variables(jax.random.key(0))
    from nefes_tpu.features.dfnet import DFNet
    dfnet = DFNet(output_dim=cfg.feature_dim)
    dfvars = dfnet.init(jax.random.key(1),
                        jnp.zeros((1, scene.H, scene.W, 3)),
                        upsample_hw=(scene.H, scene.W))
    return cfg, model, variables, (dfnet, dfvars)


def test_render_path_with_feature_metrics_and_pngs(scene, setup, tmp_path):
    cfg, model, variables, dfnet_bundle = setup
    from nefes_tpu.render.validation import render_path_with_feature
    rcfg = cfg.render_config(n_samples=8, n_importance=8, perturb=False,
                             output_transient=False).test()
    out = render_path_with_feature(
        model, variables, scene.poses[:2], scene.hists[:2],
        (scene.H, scene.W, float(scene.focal)), scene.near, scene.far,
        rcfg, scene.images[:2], dfnet_bundle, global_step=100,
        tinyscale=2.0, savedir=str(tmp_path))
    assert np.isfinite(out["psnr"])
    assert 0.0 <= out["feat_cos"] <= 2.0
    for f in ["000.png", "000_GT.png", "000_disp.png", "000_feature.png",
              "000_feature_gt.png", "001.png"]:
        assert os.path.exists(tmp_path / f), f


def test_render_path_fullres(scene, setup, tmp_path):
    cfg, model, variables, _ = setup
    from nefes_tpu.render.validation import render_path
    rcfg = cfg.render_config(n_samples=8, n_importance=8,
                             perturb=False, output_transient=False).test()
    out = render_path(model, variables, scene.poses[:1], scene.hists[:1],
                      (scene.H, scene.W, float(scene.focal)), scene.near,
                      scene.far, rcfg, gt_images=scene.images[:1],
                      savedir=str(tmp_path))
    assert np.isfinite(out["psnr"])
    assert os.path.exists(tmp_path / "000.png")


def test_render_test_drives_both_sets(scene, setup, tmp_path):
    cfg, model, variables, dfnet_bundle = setup
    from nefes_tpu.render.validation import holdout_views, render_test
    rcfg = cfg.render_config(n_samples=8, n_importance=8,
                             perturb=False, output_transient=False).test()
    views = holdout_views(scene, skip=3, limit=2)
    res = render_test(model, variables, views, views,
                      (scene.H, scene.W, float(scene.focal)), scene.near,
                      scene.far, rcfg, dfnet_bundle, global_step=250,
                      basedir=str(tmp_path), expname="exp", tinyscale=2.0)
    assert "train" in res and "val" in res
    assert os.path.isdir(tmp_path / "exp" / "evaluate_train_000250")


def test_masked_vs_unmasked_refine_losses_differ(scene, setup):
    """Cambridge-style semantic refinement: zeroing half the image must
    change the DFM loss when (and only when) the mask is wired."""
    from nefes_tpu.refine.losses import (
        feature_cosine_loss, masked_feature_cosine_loss,
    )
    rng = np.random.default_rng(0)
    h, w, c = 12, 16, 6
    rendered = jnp.asarray(rng.normal(size=(h, w, c)).astype(np.float32))
    target = rendered + 0.1
    # corrupt the left half of the target (a "dynamic object")
    target = target.at[:, : w // 2].add(
        jnp.asarray(rng.normal(0, 3.0, size=(h, w // 2, c)), jnp.float32))
    mask = jnp.zeros((h, w)).at[:, w // 2:].set(1.0)

    full = float(feature_cosine_loss(rendered, target))
    masked = float(masked_feature_cosine_loss(rendered, target, mask))
    assert abs(full - masked) > 1e-3
    assert masked < full  # masking removes the corrupted region


def test_refine_pose_single_accepts_mask(scene, setup):
    cfg, model, variables, _ = setup
    from nefes_tpu.refine import RefineConfig, refine_pose_single
    rcfg_render = cfg.render_config(n_samples=8, n_importance=8,
                                    perturb=False,
                                    output_transient=False).test()
    rcfg = RefineConfig(opt_iter=2)
    hwf = (12, 12, 10.0)
    tgt = jnp.asarray(np.random.default_rng(3).normal(
        size=(12, 12, cfg.feature_dim)).astype(np.float32))
    mask = jnp.ones((12, 12)).at[:, :6].set(0.0)
    ws_vec = jnp.asarray([1.0, 1.0, 0.0, 0.0, 0.0])
    pose = jnp.asarray(scene.poses[0])
    p1, l1 = refine_pose_single(model, variables, pose, tgt,
                                jnp.asarray(scene.hists[0]), ws_vec, hwf,
                                scene.near, scene.far, rcfg_render, rcfg)
    p2, l2 = refine_pose_single(model, variables, pose, tgt,
                                jnp.asarray(scene.hists[0]), ws_vec, hwf,
                                scene.near, scene.far, rcfg_render, rcfg,
                                mask=mask)
    assert np.all(np.isfinite(np.asarray(p2)))
    assert abs(float(l1[0]) - float(l2[0])) > 1e-6


def test_masked_patch_loss_ignores_dynamic_pixels():
    rng = np.random.default_rng(1)
    B, N, C = 2, 10, 4
    out = {"rgb": jnp.zeros((B, N, 3)), "rgb0": jnp.zeros((B, N, 3)),
           "feat": jnp.asarray(rng.normal(size=(B, N, C)), jnp.float32)}
    target_rgb = jnp.zeros((B, N, 3))
    target_feat = out["feat"] + 0.0
    # corrupt masked-out pixels only
    target_feat = target_feat.at[:, :5].add(100.0)
    mask = jnp.zeros((B, N)).at[:, 5:].set(1.0)
    fusion = out["feat"]
    loss_m, _ = nefes_training_loss(out, target_rgb, target_feat, fusion,
                                    stage=2, mask=mask)
    loss_u, _ = nefes_training_loss(out, target_rgb, target_feat, fusion,
                                    stage=2)
    assert float(loss_m) < 1e-4          # corrupted pixels excluded
    assert float(loss_u) > 1.0           # unmasked sees the corruption
