"""Previously-dead reference flags now have behavior: NeRFW off,
encode_hist off, reduce_embedding modes, color_loss_only,
load_pose_avg_stats off."""

import jax
import jax.numpy as jnp
import numpy as np

from nefes_tpu.data.synthetic import make_synthetic_scene
from nefes_tpu.fields.embedder import EmbedConfig
from nefes_tpu.train import (
    ModelConfig, NeFeSModel, create_train_state, make_optimizer,
    train_step_rays,
)


def _step(cfg, rcfg_kw, stage=0):
    scene = make_synthetic_scene(n_views=2, H=12, W=12)
    model = NeFeSModel(cfg)
    tx = make_optimizer()
    state = create_train_state(model, jax.random.key(0), tx)
    rcfg = cfg.render_config(n_samples=4, n_importance=4, **rcfg_kw)
    batch = {"rgb": jnp.asarray(scene.images),
             "poses": jnp.asarray(scene.poses),
             "hists": jnp.asarray(scene.hists)}
    state, loss, aux = train_step_rays(
        model, rcfg, tx, state, batch, jax.random.key(1),
        jnp.asarray(1e-3), (12, 12, float(scene.focal)), scene.near,
        scene.far, n_rand=16, stage=stage)
    return float(loss)


def test_nerfw_off_trains_without_beta_blowup():
    cfg = ModelConfig.tiny()
    # output_transient=False -> compositor beta is zeros; the loss must
    # fall back to plain MSE instead of log(0)
    loss = _step(cfg, {"output_transient": False})
    assert np.isfinite(loss)


def test_encode_hist_off_uses_plain_sigmoid():
    base = ModelConfig.tiny()
    cfg = base.__class__(**{**base.__dict__, "encode_hist": False})
    model = NeFeSModel(cfg)
    variables = model.init_variables(jax.random.key(0))
    raw = jnp.asarray([[[-1.0, 0.0, 2.0]]])
    out = model.apply_exposure(variables["params"],
                               jnp.full((1, 10), 37.0), raw)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(jax.nn.sigmoid(raw)), atol=1e-7)
    # and a different histogram must NOT change the output
    out2 = model.apply_exposure(variables["params"], jnp.zeros((1, 10)),
                                raw)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))


def test_reduce_embedding_modes():
    assert EmbedConfig.reduced(10).num_freqs == 5
    assert EmbedConfig.reduced(10).out_dim == 3 + 6 * 5
    assert EmbedConfig.identity().out_dim == 3
    # identity-embedded field trains
    base = ModelConfig.tiny()
    cfg = base.__class__(**{**base.__dict__,
                            "xyz_embed": EmbedConfig.identity(),
                            "dir_embed": EmbedConfig.identity()})
    assert np.isfinite(_step(cfg, {}))


def test_load_pose_avg_stats_false_computes_from_split(tmp_path):
    import os.path as osp
    from tests.fixture_datasets import make_7scenes_fixture
    from nefes_tpu.data import load_7scenes_dslam
    paths = make_7scenes_fixture(str(tmp_path))
    root = osp.dirname(paths["datadir"])
    sc_file = load_7scenes_dslam("chess", root, paths["data_root"], df=8.0)
    sc_comp = load_7scenes_dslam("chess", root, paths["data_root"], df=8.0,
                                 load_pose_avg_stats=False)
    # fixture stats are identity, computed stats are the real average --
    # both are valid centerings but differ
    assert sc_comp.pose_avg_stats is not None
    assert np.all(np.isfinite(sc_comp.poses))
    assert np.abs(sc_comp.pose_avg_stats
                  - sc_file.pose_avg_stats).max() > 1e-3


def test_unknown_cli_flags_ignored_with_print(capsys):
    from nefes_tpu.cli.options import options_from_cli
    opts = options_from_cli(["--eval", "true", "--dfnet", "1",
                             "--N_rand", "64"])
    assert opts.N_rand == 64
    out = capsys.readouterr().out
    assert "ignoring unknown CLI args" in out
