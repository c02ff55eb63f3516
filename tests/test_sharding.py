"""Multi-chip sharding tests on the 8-device virtual CPU mesh
(SURVEY.md §7 step 9 gate: multi-chip == single-chip numerics)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nefes_tpu.data.synthetic import make_synthetic_scene
from nefes_tpu.parallel import (
    make_mesh, make_sharded_train_step, render_rays_sharded, shard_batch,
    replicate,
)
from nefes_tpu.train import (
    ModelConfig, NeFeSModel, create_train_state, make_optimizer,
    train_step_rays,
)


@pytest.fixture(scope="module")
def world():
    assert jax.device_count() >= 8, "conftest must provide 8 virtual devices"
    scene = make_synthetic_scene(n_views=8, H=16, W=16)
    cfg = ModelConfig.tiny()
    model = NeFeSModel(cfg)
    tx = make_optimizer()
    state = create_train_state(model, jax.random.key(0), tx)
    rcfg = cfg.render_config(n_samples=16, n_importance=16)
    return scene, model, tx, state, rcfg


def _batch(scene, n):
    return {"rgb": jnp.asarray(scene.images[:n]),
            "poses": jnp.asarray(scene.poses[:n]),
            "hists": jnp.asarray(scene.hists[:n])}


def test_dp_train_step_matches_single_device(world):
    scene, model, tx, state, rcfg = world
    hwf = (scene.H, scene.W, float(scene.focal))
    batch = _batch(scene, 8)
    rng = jax.random.key(5)
    lr = jnp.asarray(1e-3)

    # single-device reference
    s1, loss1, _ = train_step_rays(model, rcfg, tx, state, batch, rng, lr,
                                   hwf, scene.near, scene.far,
                                   n_rand=64, stage=0)

    mesh = make_mesh(data=8, rays=1)
    step = make_sharded_train_step(model, rcfg, tx, mesh, hwf,
                                   scene.near, scene.far, n_rand=64, stage=0)
    s2, loss2, _ = step(replicate(mesh, state), shard_batch(mesh, batch),
                        rng, lr)

    np.testing.assert_allclose(float(loss1), float(loss2), rtol=2e-5)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_dp_2x4_mesh(world):
    scene, model, tx, state, rcfg = world
    hwf = (scene.H, scene.W, float(scene.focal))
    mesh = make_mesh(data=2, rays=4)
    step = make_sharded_train_step(model, rcfg, tx, mesh, hwf,
                                   scene.near, scene.far, n_rand=64, stage=0)
    s, loss, _ = step(replicate(mesh, state),
                      shard_batch(mesh, _batch(scene, 8)),
                      jax.random.key(6), jnp.asarray(1e-3))
    assert np.isfinite(float(loss))


def test_ray_sharded_render_matches_local(world):
    scene, model, tx, state, rcfg = world
    from nefes_tpu.geometry import get_rays
    from nefes_tpu.render import render_rays
    c2w = jnp.asarray(scene.poses[0])
    ro, rd = get_rays(16, 16, float(scene.focal), c2w)
    ro, rd = ro.reshape(-1, 3), rd.reshape(-1, 3)
    tcfg = rcfg.test()

    local = render_rays(model.coarse_fn, model.fine_fn, state.params,
                        state.params, ro, rd, scene.near, scene.far,
                        None, tcfg)["rgb"]
    mesh = make_mesh(data=4, rays=2)
    sharded = render_rays_sharded(model, state.params, ro, rd,
                                  scene.near, scene.far, tcfg, mesh)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(local),
                               atol=2e-5)


def test_sharded_refinement_matches_local(world):
    """8 frames refined across the 8-device mesh == the local vmapped
    batch (frame-parallel serving path)."""
    scene, model, tx, state, rcfg = world
    from nefes_tpu.parallel.train_dp import refine_poses_sharded
    from nefes_tpu.refine import RefineConfig, refine_poses_batch

    variables = state.variables
    tcfg = rcfg.test()
    rfc = RefineConfig(opt_iter=2)
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(
        size=(8, 8, 8, model.cfg.feature_dim)).astype(np.float32))
    poses = jnp.asarray(scene.poses[:8])
    hists = jnp.asarray(scene.hists[:8])
    hwf = (8, 8, 6.0)

    local, losses_l = refine_poses_batch(
        model, variables, poses, feats, hists, scene.world, hwf, tcfg, rfc)
    mesh = make_mesh(data=4, rays=2)
    sharded, losses_s = refine_poses_sharded(
        model, variables, poses, feats, hists, scene.world, hwf, tcfg,
        rfc, mesh)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(local),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(losses_s), np.asarray(losses_l),
                               atol=2e-5)


def test_sharded_apr_refinement_matches_local(world):
    """Mode-2 (APR-weight, the paper headline) refinement sharded across
    the mesh == the local vmapped batch (VERDICT r2 weak #4)."""
    scene, model, tx, state, rcfg = world
    from nefes_tpu.features.dfnet import DFNet, extract_target_features
    from nefes_tpu.parallel.train_dp import refine_apr_sharded
    from nefes_tpu.refine import RefineConfig
    from nefes_tpu.refine.apr_opt import apply_verification, refine_apr_batch

    FH, FW = 32, 48   # >=32 px (DFNet pose head) and > the 10-px DFM crop
    dfnet = DFNet(output_dim=model.cfg.feature_dim)
    rng = np.random.default_rng(3)
    imgs = jnp.asarray(rng.uniform(size=(8, FH, FW, 3)).astype(np.float32))
    dfvars = dfnet.init(jax.random.key(1), imgs[:1], upsample_hw=(FH, FW))
    # well-conditioned pose-head bias: a near-zero random 3x3 makes the
    # svd_reg orthogonalisation unstable and the mesh-vs-local parity
    # check would measure SVD conditioning, not correctness
    dfvars["params"]["fc_pose"]["bias"] = jnp.asarray(
        [1, 0, 0, 0.0, 0, 1, 0, 0.3, 0, 0, 1, 1.2], jnp.float32)
    targets = jax.lax.stop_gradient(
        extract_target_features(dfnet, dfvars, imgs, FH, FW))
    hists = jnp.asarray(scene.hists[:8])
    ws_vec = jnp.asarray([scene.world.pose_scale, scene.world.pose_scale2,
                          *scene.world.move_all_cam_vec], jnp.float32)
    tcfg = rcfg.test()
    rfc = RefineConfig(opt_iter=2, learning_rate=1e-4)
    hwf_render = (6, 8, 6.0)
    hwf_full = (FH, FW, 24.0)

    local = refine_apr_batch(model, state.variables, dfnet, dfvars, imgs,
                             targets, hists, ws_vec, hwf_render, hwf_full,
                             scene.near, scene.far, tcfg, rfc)
    mesh = make_mesh(data=4, rays=2)
    sharded = refine_apr_sharded(model, state.variables, dfnet, dfvars,
                                 imgs, targets, hists, ws_vec, hwf_render,
                                 hwf_full, scene.near, scene.far, tcfg,
                                 rfc, mesh)
    # Forward quantities are exactly comparable across execution layouts:
    np.testing.assert_allclose(np.asarray(sharded["initial_pose"]),
                               np.asarray(local["initial_pose"]),
                               atol=1e-5, err_msg="initial_pose")
    np.testing.assert_allclose(np.asarray(sharded["losses"][:, 0]),
                               np.asarray(local["losses"][:, 0]),
                               rtol=1e-4, err_msg="first-iteration loss")
    # The optimisation TRAJECTORY is not bitwise-comparable between the
    # vmapped-batch and one-frame-per-device layouts: conv batching
    # reorders f32 accumulation (~1e-6), and Adam's early steps are
    # sign-like, so near-zero-gradient weights amplify that noise into
    # divergent (equally valid) trajectories — the same jitter the torch
    # reference documents across GPU models (README.md:70-76). Assert the
    # mesh path reaches the same optimisation state, loosely:
    np.testing.assert_allclose(np.asarray(sharded["losses"][:, -1]),
                               np.asarray(local["losses"][:, -1]),
                               rtol=5e-2, err_msg="final loss")
    # the verification fail-safe composes with sharded results too
    final = apply_verification(sharded)
    assert final.shape == (8, 3, 4)
    assert np.isfinite(np.asarray(final)).all()
