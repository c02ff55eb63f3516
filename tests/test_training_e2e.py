"""End-to-end training slice on the synthetic scene (SURVEY.md §7 step 4):
data -> render -> staged loss -> adam + exp decay -> checkpoint roundtrip.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nefes_tpu.data.synthetic import make_synthetic_scene, render_gt_features
from nefes_tpu.train import (
    ModelConfig, NeFeSModel, create_train_state, make_optimizer,
    stage_for_epoch, lr_for_epoch, train_step_rays, train_step_patch,
    save_checkpoint, restore_checkpoint, latest_checkpoint,
)


@pytest.fixture(scope="module")
def scene():
    return make_synthetic_scene(n_views=8, H=24, W=32)


@pytest.fixture(scope="module")
def setup(scene):
    cfg = ModelConfig.tiny()
    model = NeFeSModel(cfg)
    tx = make_optimizer()
    state = create_train_state(model, jax.random.key(0), tx)
    rcfg = cfg.render_config(n_samples=24, n_importance=24)
    return model, tx, state, rcfg


def _batch(scene, idx, feats=None):
    b = {
        "rgb": jnp.asarray(scene.images[idx]),
        "poses": jnp.asarray(scene.poses[idx]),
        "hists": jnp.asarray(scene.hists[idx]),
    }
    if feats is not None:
        b["feat"] = jnp.asarray(feats[idx])
    return b


def test_stage0_loss_decreases(scene, setup):
    model, tx, state, rcfg = setup
    hwf = (scene.H, scene.W, float(scene.focal))
    rng = jax.random.key(1)
    losses = []
    for step in range(30):
        rng, k = jax.random.split(rng)
        batch = _batch(scene, np.arange(4))
        state, loss, aux = train_step_rays(
            model, rcfg, tx, state, batch, k,
            jnp.asarray(lr_for_epoch(step, 5e-3)), hwf,
            scene.near, scene.far, n_rand=128, stage=0)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < np.mean(losses[:5]) * 0.8, losses


def test_stage1_feature_loss(scene, setup):
    model, tx, state, rcfg = setup
    feats = render_gt_features(scene, feature_dim=8)
    hwf = (scene.H, scene.W, float(scene.focal))
    rng = jax.random.key(2)
    losses = []
    for step in range(10):
        rng, k = jax.random.split(rng)
        batch = _batch(scene, np.arange(4), feats)
        state, loss, aux = train_step_rays(
            model, rcfg, tx, state, batch, k, jnp.asarray(5e-3), hwf,
            scene.near, scene.far, n_rand=128, stage=1)
        losses.append(float(loss))
        assert "loss_feat" in aux
    assert np.isfinite(losses).all()


def test_stage2_patch_fusion_step(scene, setup):
    model, tx, state, rcfg = setup
    feats = render_gt_features(scene, feature_dim=8)
    hwf = (scene.H, scene.W, float(scene.focal))
    batch = _batch(scene, np.arange(2), feats)
    state2, loss, aux = train_step_patch(
        model, rcfg, tx, state, batch, jax.random.key(3),
        jnp.asarray(1e-3), hwf, scene.near, scene.far)
    assert np.isfinite(float(loss))
    assert "loss_fusion" in aux
    # fusion BN batch stats must update
    old = jax.tree.leaves(state.variables["batch_stats"])
    new = jax.tree.leaves(state2.variables["batch_stats"])
    assert any(not np.allclose(o, n) for o, n in zip(old, new))


def test_masked_ray_selection(scene, setup):
    """Semantic masking: rays must only be drawn from mask>0 pixels."""
    model, tx, state, rcfg = setup
    hwf = (scene.H, scene.W, float(scene.focal))
    mask = np.zeros((4, scene.H, scene.W), np.float32)
    mask[:, :, : scene.W // 2] = 1.0  # only left half valid
    batch = _batch(scene, np.arange(4))
    batch["mask"] = jnp.asarray(mask)
    # smoke: runs and finite (selection correctness tested via trainer internals)
    state, loss, aux = train_step_rays(
        model, rcfg, tx, state, batch, jax.random.key(4),
        jnp.asarray(1e-3), hwf, scene.near, scene.far, n_rand=64, stage=0)
    assert np.isfinite(float(loss))

    from nefes_tpu.train.trainer import _select_ray_pixels
    px, py, idx = _select_ray_pixels(jax.random.key(0), 64, scene.H, scene.W,
                                     jnp.asarray(mask[0]))
    assert np.all(np.asarray(px) < scene.W // 2)


def test_grad_clip_optimizer(scene, setup):
    """make_optimizer(grad_clip>0): same lr-injection protocol as the
    default, updates bounded by the clip, and a train step runs through
    it (guards the FusionNet trailing-BN collapse — see make_optimizer)."""
    import optax
    from nefes_tpu.train.trainer import make_optimizer

    tx = make_optimizer(grad_clip=1.0)
    p = {"w": jnp.ones(4)}
    st = tx.init(p)
    st.hyperparams["learning_rate"] = 1e-2   # the train steps' protocol
    big = {"w": jnp.full(4, 1e6)}
    up, _ = tx.update(big, st, p)
    # Adam normalizes magnitude; clip must not break the step or sign
    assert np.all(np.isfinite(np.asarray(up["w"])))
    assert np.all(np.asarray(up["w"]) < 0)

    model, _, _, rcfg = setup
    txc = make_optimizer(grad_clip=0.5)
    state = create_train_state(model, jax.random.key(0), txc)
    hwf = (scene.H, scene.W, scene.focal)
    batch = _batch(scene, np.arange(4))
    state, loss, aux = train_step_rays(
        model, rcfg, txc, state, batch, jax.random.key(1),
        jnp.asarray(1e-3), hwf, scene.near, scene.far, n_rand=64, stage=0)
    assert np.isfinite(float(loss))


def test_schedule_and_lr():
    assert stage_for_epoch(1, 0) == 0
    assert stage_for_epoch(1, 599) == 0
    assert stage_for_epoch(2, 0) == 1
    assert stage_for_epoch(2, 199) == 1
    assert stage_for_epoch(2, 200) == 2
    assert lr_for_epoch(0) == pytest.approx(5e-4)
    assert lr_for_epoch(754) == pytest.approx(5e-5)


def test_checkpoint_roundtrip(tmp_path, scene, setup):
    model, tx, state, rcfg = setup
    path = save_checkpoint(tmp_path / "ckpt", state, epoch=3)
    assert latest_checkpoint(tmp_path / "ckpt") == path
    template = create_train_state(model, jax.random.key(9), tx)
    restored = restore_checkpoint(path, template)
    for a, b in zip(jax.tree.leaves(state.params),
                    jax.tree.leaves(restored.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
