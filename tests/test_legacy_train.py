"""Legacy DFM training utilities vs torch twins + EarlyStopping +
feature-tap APRs (VERDICT r1 item 8 / SURVEY rows 28, 34, 35)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from nefes_tpu.refine.legacy_train import (  # noqa: E402
    masked_mse_loss, perturb_rotation, perturb_single_render_pose,
    perturb_single_render_pose_norm, triplet_loss,
    triplet_loss_hard_negative_mining,
    triplet_loss_hard_negative_mining_plus, triplet_margin_loss,
)


def _pair(shape, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.normal(size=shape).astype(np.float32),
            rng.normal(size=shape).astype(np.float32))


def test_triplet_margin_matches_torch():
    a, p = _pair((2, 3, 8, 10, 6))
    n = np.roll(p, 1, axis=1)
    crit = tnn.TripletMarginLoss(margin=1.0, reduction="mean")
    want = crit(torch.tensor(a), torch.tensor(p), torch.tensor(n))
    got = triplet_margin_loss(jnp.asarray(a), jnp.asarray(p),
                              jnp.asarray(n))
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)
    np.testing.assert_allclose(float(triplet_loss(jnp.asarray(a),
                                                  jnp.asarray(p))),
                               float(want), rtol=1e-5)


def _torch_hnm(f1, f2, margin=1.0):
    crit = tnn.TripletMarginLoss(margin=margin, reduction="mean")
    mse = tnn.MSELoss(reduction="mean")
    a, p = torch.tensor(f1), torch.tensor(f2)
    an, n = torch.roll(a, 1, dims=1), torch.roll(p, 1, dims=1)
    if float(mse(a, n)) < float(mse(p, an)):
        return float(crit(a, p, n))
    return float(crit(p, a, an))


def test_triplet_hard_negative_matches_torch():
    for seed in range(3):
        f1, f2 = _pair((2, 4, 6, 5, 7), seed)
        got = float(triplet_loss_hard_negative_mining(jnp.asarray(f1),
                                                      jnp.asarray(f2)))
        np.testing.assert_allclose(got, _torch_hnm(f1, f2), rtol=1e-5)


def _torch_hnm_plus(f1, f2, margin=1.0):
    crit = tnn.TripletMarginLoss(margin=margin, reduction="mean")
    mse = tnn.MSELoss(reduction="mean")
    dim = 1 if f1.ndim == 5 else 0
    a, p = torch.tensor(f1), torch.tensor(f2)
    an, n = torch.roll(a, 1, dims=dim), torch.roll(p, 1, dims=dim)
    cases = [mse(a, n), mse(p, an), mse(a, an), mse(p, n)]
    k = int(torch.argmin(torch.stack(cases)))
    return float([crit(a, p, n), crit(p, a, an), crit(a, p, an),
                  crit(p, a, n)][k])


@pytest.mark.parametrize("shape", [(2, 4, 6, 5, 7), (4, 6, 5, 7)])
def test_triplet_hnm_plus_matches_torch(shape):
    for seed in range(3):
        f1, f2 = _pair(shape, seed + 10)
        got = float(triplet_loss_hard_negative_mining_plus(
            jnp.asarray(f1), jnp.asarray(f2)))
        np.testing.assert_allclose(got, _torch_hnm_plus(f1, f2), rtol=1e-5)


def test_masked_mse_matches_torch_gather_version():
    rng = np.random.default_rng(3)
    f1 = rng.normal(size=(2, 6, 8, 4)).astype(np.float32)   # NHWC
    f2 = rng.normal(size=(2, 6, 8, 4)).astype(np.float32)
    mask = (rng.uniform(size=(2, 6, 8)) > 0.4).astype(np.float32)
    # torch twin (NCHW gather, misc.py:359-388)
    t1 = torch.tensor(f1).permute(0, 3, 1, 2)
    t2 = torch.tensor(f2).permute(0, 3, 1, 2)
    vm = torch.tensor(mask)[0].reshape(-1)
    idx = torch.nonzero(vm > 0, as_tuple=True)[0]
    N, C, H, W = t1.shape
    want = tnn.MSELoss()(t1.reshape(N, C, H * W)[..., idx],
                         t2.reshape(N, C, H * W)[..., idx])
    got = masked_mse_loss(jnp.asarray(f1), jnp.asarray(f2),
                          jnp.asarray(mask))
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)


def test_perturb_poses_shapes_and_magnitude():
    pose = np.concatenate([np.eye(3), [[0.5], [0.2], [1.0]]], axis=1)
    rng = np.random.default_rng(0)
    out = perturb_single_render_pose(pose, 0.1, 5.0, rng)
    assert out.shape == (1, 3, 4)
    R = out[0, :3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
    assert np.abs(out[0, :, 3] - pose[:, 3]).max() <= 0.1 + 1e-6

    # the norm variant rotates AFTER translating (reference order), so the
    # final Δt also carries the world-frame rotation of the position
    out2 = perturb_single_render_pose_norm(pose, 0.1, 5.0, rng)
    R2 = out2[0, :3, :3]
    np.testing.assert_allclose(R2 @ R2.T, np.eye(3), atol=1e-5)
    assert np.abs(out2[0] - pose).max() > 1e-3
    rot = perturb_rotation(pose, 10.0, 0.0, 0.0)
    assert rot.shape == (3, 4)


def test_early_stopping_loss_and_psnr_modes(tmp_path):
    from nefes_tpu.train.callbacks import EarlyStopping
    saved = []
    es = EarlyStopping(str(tmp_path), lambda p, s: saved.append((p, s)),
                       patience=2)
    es(1.0, "s0", epoch=0)
    es(0.5, "s1", epoch=1)     # improvement -> save
    assert es.is_best_model()
    es(0.9, "s2", epoch=2)     # worse
    es(0.9, "s3", epoch=3)     # worse -> patience hit
    assert es.early_stop and not es.is_best_model()
    assert [s for _, s in saved] == ["s0", "s1"]

    saved2 = []
    es2 = EarlyStopping(str(tmp_path), lambda p, s: saved2.append(s),
                        patience=3, val_on_psnr=True)
    es2(0.0, "a", val_psnr=20.0)
    es2(0.0, "b", val_psnr=25.0)   # higher psnr -> save
    es2(0.0, "c", val_psnr=24.0)   # worse
    assert saved2 == ["a", "b"] and es2.counter == 1


def test_feature_tap_aprs():
    from nefes_tpu.features.posenet import EfficientNetB3Feat, PoseNetV2Feat
    x = jnp.zeros((2, 32, 32, 3)) + 0.5
    m = PoseNetV2Feat()
    v = m.init(jax.random.key(0), x)
    feats, pose = m.apply(v, x, single_stream=True)
    assert pose.shape == (2, 12)
    assert feats[0].shape[0] == 1 and feats[0].shape[-1] == 320
    feats2, _ = m.apply(v, x, single_stream=False)
    assert feats2[0].shape[0] == 2 and feats2[0].shape[1] == 1

    e = EfficientNetB3Feat()
    ve = e.init(jax.random.key(1), x)
    feats3, pose3 = e.apply(ve, x)
    assert pose3.shape == (2, 12)
    assert feats3[0].shape[0] == 1


def test_render_nerfw_imgs_and_validation_loss():
    from nefes_tpu.data.synthetic import make_synthetic_scene
    from nefes_tpu.refine.legacy_train import (
        get_validation_loss, render_nerfw_imgs,
    )
    from nefes_tpu.train.model import ModelConfig, NeFeSModel
    scene = make_synthetic_scene(n_views=2, H=16, W=16)
    cfg = ModelConfig.tiny()
    model = NeFeSModel(cfg)
    variables = model.init_variables(jax.random.key(0))
    rcfg = cfg.render_config(n_samples=4, n_importance=4, perturb=False,
                             output_transient=False).test()
    imgs = render_nerfw_imgs(model, variables, scene.poses, scene.hists,
                             (16, 16, float(scene.focal)), scene.near,
                             scene.far, rcfg)
    assert imgs.shape == (2, 16, 16, 3)
    rng = np.random.default_rng(0)
    feats = rng.normal(size=(2, 16, 16, 4)).astype(np.float32)
    out = get_validation_loss(imgs, scene.images, feats, feats + 0.1,
                              option_list=("pose", "feature_mse",
                                           "feature_cosine_similarity"))
    assert set(out) == {"pose", "feature_mse", "feature_cos"}
    assert all(np.isfinite(v) for v in out.values())
