"""Field-model zoo: the flag-selectable alternative fields (legacy
NeRF-W/Hist, plain NeRF, instant-ngp hash grid) driven through the SAME
trainer/render stack as the production NFF model, with the N_vocab
appearance/transient embedding tables (reference create_nerf,
nerfh.py:522-600 / nerfh_tcnn.py:286-310)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nefes_tpu.fields.embedder import EmbedConfig
from nefes_tpu.train.field_zoo import ZooConfig, ZooFieldModel
from nefes_tpu.train.trainer import (
    AuxConfig, create_train_state, make_optimizer, train_step_rays,
)

KINDS = ["nerfw", "nerf", "hash"]


def tiny_cfg(kind):
    return ZooConfig(kind=kind, depth=2, width=16, skips=(1,),
                     xyz_embed=EmbedConfig(num_freqs=2),
                     dir_embed=EmbedConfig(num_freqs=1),
                     hash_level=3, bound=2.0, n_vocab=128, hist_bin=4)


def tiny_batch(rng, B=2, H=8, W=8, bins=4):
    ks = jax.random.split(rng, 3)
    pose = jnp.concatenate([jnp.eye(3), jnp.asarray([[0.], [0.], [1.]])], -1)
    return {
        "rgb": jax.random.uniform(ks[0], (B, H, W, 3)),
        "poses": jnp.broadcast_to(pose, (B, 3, 4)),
        "hists": jnp.asarray(
            np.random.default_rng(0).integers(0, 100, (B, bins)),
            jnp.float32),
    }


@pytest.mark.parametrize("kind", KINDS)
def test_train_step_updates_field_and_tables(kind):
    cfg = tiny_cfg(kind)
    model = ZooFieldModel(cfg)
    tx = make_optimizer()
    state = create_train_state(model, jax.random.key(0), tx)
    if kind == "hash":
        # instant-ngp tables init at ~2e-4, so density (and hence every
        # color/latent gradient, which scales with the composite weights)
        # starts at ~0 — seed a visible density like a few hundred real
        # steps would produce, so one step exercises the full grad path
        p = state.params
        for twr in ("coarse", "fine"):
            p[twr]["sigma_out"]["bias"] = \
                p[twr]["sigma_out"]["bias"].at[0].set(5.0)
        state = state.replace(variables={"params": p},
                              opt_state=tx.init(p))
    rcfg = cfg.render_config(n_samples=6, n_importance=6)
    batch = tiny_batch(jax.random.key(1))
    hwf = (8, 8, 10.0)

    state2, loss, aux = train_step_rays(model, rcfg, tx, state, batch,
                                        jax.random.key(2),
                                        jnp.asarray(1e-3), hwf, 0.5, 3.0,
                                        n_rand=16, stage=0)
    assert np.isfinite(float(loss))
    # the field weights moved
    p0 = jax.tree.leaves(state.params)
    p1 = jax.tree.leaves(state2.params)
    assert any(not np.allclose(a, b) for a, b in zip(p0, p1))
    if kind != "nerf":
        # the N_vocab embedding tables are TRAINED (grads flow through
        # the per-image latent closures) — rows indexed by the batch
        # histograms must have moved
        ids = np.unique(np.clip(np.round(np.asarray(batch["hists"])),
                                0, cfg.n_vocab - 1).astype(int))
        d_a = np.asarray(state2.params["embed_a"]["embedding"]
                         - state.params["embed_a"]["embedding"])
        assert np.abs(d_a[ids]).max() > 0, "appearance table never updated"


def test_latent_shapes_match_reference_layout():
    """hist (bins,) -> a (bins*5,), t (bins*2,) — the flattened
    Embedding(N_vocab, 5/2) lookup of run_network_NeRFH
    (nerfh.py:216-227)."""
    cfg = tiny_cfg("nerfw")
    model = ZooFieldModel(cfg)
    v = model.init_variables(jax.random.key(0))
    hist = jnp.asarray([3.0, 50.0, 99.0, 0.0])
    a, t = model.latents(v["params"], hist)
    assert a.shape == (4 * 5,) and t.shape == (4 * 2,)
    # equal bin values share table rows
    a2, _ = model.latents(v["params"], jnp.asarray([3.0, 3.0, 3.0, 3.0]))
    np.testing.assert_allclose(np.asarray(a2[:5]), np.asarray(a2[5:10]))


def test_l1normloss_consumed_for_hash_field():
    cfg = tiny_cfg("hash")
    model = ZooFieldModel(cfg)
    tx = make_optimizer()
    state = create_train_state(model, jax.random.key(0), tx)
    rcfg = cfg.render_config(n_samples=4, n_importance=4)
    batch = tiny_batch(jax.random.key(1))
    hwf = (8, 8, 10.0)
    kw = dict(n_rand=8, stage=0)
    args = (model, rcfg, tx, state, batch, jax.random.key(2),
            jnp.asarray(1e-3), hwf, 0.5, 3.0)
    _, loss_off, _ = train_step_rays(*args, aux=AuxConfig(), **kw)
    _, loss_on, _ = train_step_rays(
        *args, aux=AuxConfig(l1normloss=True, l1normloss_w=10.0), **kw)
    assert float(loss_on) > float(loss_off), \
        "l1normloss did not contribute to the objective"


def test_l1normloss_rejected_for_non_hash_field():
    model = ZooFieldModel(tiny_cfg("nerfw"))
    v = model.init_variables(jax.random.key(0))
    with pytest.raises(ValueError, match="hash"):
        model.encoder_fns(v["params"])


def test_depth_loss_wired_into_ray_step():
    """--depth supervision (reference options.py:61; the loss math
    losses.py:175-191) contributes when the batch carries dpt targets."""
    from nefes_tpu.train import ModelConfig, NeFeSModel
    cfg = ModelConfig.tiny()
    model = NeFeSModel(cfg)
    tx = make_optimizer()
    state = create_train_state(model, jax.random.key(0), tx)
    rcfg = cfg.render_config(n_samples=6, n_importance=6)
    batch = tiny_batch(jax.random.key(1), bins=10)
    batch["depth"] = jax.random.uniform(jax.random.key(3), (2, 8, 8),
                                        minval=0.5, maxval=3.0)
    hwf = (8, 8, 10.0)
    _, _, aux = train_step_rays(model, rcfg, tx, state, batch,
                                jax.random.key(2), jnp.asarray(1e-3),
                                hwf, 0.5, 3.0, n_rand=16, stage=0,
                                aux=AuxConfig(depth=True))
    assert "loss_depth" in aux and np.isfinite(float(aux["loss_depth"]))


# ---- CLI dispatch (the reference --tcnn / --NeRFW flag surface) ----

from tests.fixture_datasets import make_7scenes_fixture


@pytest.fixture(scope="module")
def fx(tmp_path_factory):
    root = tmp_path_factory.mktemp("zoo7scenes")
    return make_7scenes_fixture(str(root)), str(root)


def _args(paths, root, **kw):
    base = {
        "dataset_type": "7Scenes", "datadir": paths["datadir"],
        "data_root": paths["data_root"], "basedir": os.path.join(root, "logs"),
        "df": "8", "netdepth": "2", "netwidth": "16",
        "multires": "2", "multires_views": "1",
        "N_samples": "4", "N_importance": "4", "N_rand": "16",
        "batch_size": "2", "i_weights": "1", "i_print": "1",
        "i_testset": "0", "val_views": "1", "tinyscale": "4",
        "epochs": "1", "new_schedule": "1",
    }
    base.update({k: str(v) for k, v in kw.items()})
    argv = []
    for k, v in base.items():
        argv += [f"--{k}", v]
    return argv


def test_cli_trains_hash_field_end_to_end(fx):
    paths, root = fx
    from nefes_tpu.cli.train import main
    s = main(_args(paths, root, expname="hashrun", tcnn=True,
                   hash_level=2, bound=4.0, l1normloss=True))
    assert int(s.epoch) == 2
    assert "encoder" in s.params["coarse"], "hash field was not selected"
    assert os.path.isdir(os.path.join(root, "logs", "hashrun", "ckpts"))


def test_cli_trains_legacy_nerfw_field(fx):
    paths, root = fx
    from nefes_tpu.cli.train import main
    s = main(_args(paths, root, expname="nerfwrun", nerfh_nff=False))
    assert "embed_a" in s.params, "N_vocab tables missing"


def test_cli_rejects_feature_losses_for_zoo_fields(fx):
    paths, root = fx
    from nefes_tpu.cli.train import main
    with pytest.raises(ValueError, match="feature"):
        main(_args(paths, root, expname="bad", tcnn=True,
                   color_feat_loss=True))


def test_validation_render_with_latent_field():
    """render_path drives the latent-conditioned zoo fields through the
    validation renderer (ray_field_fns binds each view's histogram
    latents inside the jitted per-pose render)."""
    from nefes_tpu.render.validation import render_path

    cfg = tiny_cfg("nerfw")
    model = ZooFieldModel(cfg)
    variables = model.init_variables(jax.random.key(0))
    rcfg = cfg.render_config(n_samples=4, n_importance=4,
                             perturb=False).test()
    pose = np.concatenate([np.eye(3), [[0.], [0.], [1.5]]], axis=1)
    poses = np.stack([pose, pose]).astype(np.float32)
    hists = np.asarray(
        np.random.default_rng(0).integers(0, 100, (2, 4)), np.float32)
    gt = np.random.default_rng(1).uniform(size=(2, 16, 16, 3)) \
        .astype(np.float32)
    out = render_path(model, variables, poses, hists, (16, 16, 12.0),
                      0.3, 3.0, rcfg, gt_images=gt)
    assert np.isfinite(out["psnr"])
    assert out["frames_rgb"].shape == (2, 16, 16, 3)
    # different histograms must produce different renders (the latents
    # actually condition the field)
    h2 = hists.copy()
    h2[1] = (h2[1] + 37) % 100
    out2 = render_path(model, variables, poses, h2, (16, 16, 12.0),
                       0.3, 3.0, rcfg, gt_images=gt)
    assert not np.allclose(out["frames_rgb"][1], out2["frames_rgb"][1])
