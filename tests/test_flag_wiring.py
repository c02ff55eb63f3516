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


def test_nerfies_window_anneals_embedding_in_train_step():
    """reduce_embedding=2: the window is a TRACED argument of the jitted
    train step and actually changes the computation (reference embed_DNeRF,
    nerfh_nff.py:272-297)."""
    from nefes_tpu.fields.embedder import cosine_window, embed, train_windows

    # Eq.8 progression: closed at epoch 0, fully open at epochs_to_full
    w0 = np.asarray(cosine_window(4, 0.0, 100.0))
    w_mid = np.asarray(cosine_window(4, 50.0, 100.0))
    w_full = np.asarray(cosine_window(4, 100.0, 100.0))
    np.testing.assert_allclose(w0, 0.0, atol=1e-7)
    np.testing.assert_allclose(w_full, 1.0, atol=1e-7)
    assert np.all(w_mid[:-1] >= w_mid[1:])  # lower bands open first

    # closed window kills every frequency channel, keeps identity input
    ec = EmbedConfig(num_freqs=4)
    x = jnp.asarray([[0.3, -0.2, 0.9]])
    e0 = np.asarray(embed(x, ec, window=jnp.zeros(4)))
    np.testing.assert_allclose(e0[:, :3], np.asarray(x), atol=1e-7)
    np.testing.assert_allclose(e0[:, 3:], 0.0, atol=1e-7)
    # all-ones window == no window
    np.testing.assert_array_equal(
        np.asarray(embed(x, ec, window=jnp.ones(4))),
        np.asarray(embed(x, ec)))

    # the jitted train step consumes the window: epoch-0 (closed) and
    # late-epoch (open) windows give DIFFERENT losses; open == None
    cfg = ModelConfig.tiny()
    scene = make_synthetic_scene(n_views=2, H=12, W=12)
    model = NeFeSModel(cfg)
    tx = make_optimizer()
    state = create_train_state(model, jax.random.key(0), tx)
    rcfg = cfg.render_config(n_samples=4, n_importance=4, perturb=False)
    batch = {"rgb": jnp.asarray(scene.images),
             "poses": jnp.asarray(scene.poses),
             "hists": jnp.asarray(scene.hists)}
    hwf = (12, 12, float(scene.focal))

    def run(window):
        _, loss, _ = train_step_rays(
            model, rcfg, tx, state, batch, jax.random.key(1),
            jnp.asarray(1e-3), hwf, scene.near, scene.far, n_rand=16,
            stage=0, window=window)
        return float(loss)

    closed = run(train_windows(0.0, cfg.xyz_embed, cfg.dir_embed, 100.0))
    opened = run(train_windows(100.0, cfg.xyz_embed, cfg.dir_embed, 100.0))
    none = run(None)
    assert closed != opened
    np.testing.assert_allclose(opened, none, rtol=1e-6)


def test_window_for_epoch_cli_helper():
    from nefes_tpu.cli.options import Options
    from nefes_tpu.cli.train import window_for_epoch
    cfg = ModelConfig.tiny()
    opts = Options(reduce_embedding=2, epochs=100, epochToMaxFreq=-1)
    w = window_for_epoch(opts, cfg, 0)
    assert w is not None and len(w) == 2
    np.testing.assert_allclose(np.asarray(w[0]), 0.0, atol=1e-7)
    w_end = window_for_epoch(opts, cfg, 100)
    np.testing.assert_allclose(np.asarray(w_end[0]), 1.0, atol=1e-7)
    assert window_for_epoch(Options(reduce_embedding=-1), cfg, 5) is None
