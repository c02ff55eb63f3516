"""Sharded training + rendering: the multi-chip execution paths.

Strategy (SURVEY.md §2.10 TPU mapping): replicate params, shard the batch
axis over "data" and the ray axis over "rays"; XLA inserts the gradient
all-reduce (psum over both axes) at the loss — data-parallel NeRF training
with zero hand-written collectives. Rendering shards rays of a single
image across the whole mesh (the ray axis is the scene's "sequence" axis).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from nefes_tpu.render.renderer import RenderConfig, render_rays
from nefes_tpu.train.model import NeFeSModel
from nefes_tpu.train.trainer import TrainState, train_step_rays
from nefes_tpu.parallel.mesh import batch_sharding, replicated


def make_sharded_train_step(model: NeFeSModel, cfg: RenderConfig, tx,
                            mesh: Mesh, hwf: tuple, near: float, far: float,
                            n_rand: int = 1536, stage: int = 0):
    """Wrap train_step_rays with mesh shardings: state replicated, batch
    sharded over "data". Returns step(state, batch, rng, lr)."""
    rep = replicated(mesh)
    bsh = batch_sharding(mesh)

    def step(state: TrainState, batch: dict, rng: jax.Array, lr):
        return train_step_rays(model, cfg, tx, state, batch, rng, lr,
                               hwf, near, far, n_rand=n_rand, stage=stage)

    return jax.jit(step,
                   in_shardings=(rep, bsh, rep, rep),
                   out_shardings=(rep, rep, rep))


def refine_poses_sharded(model: NeFeSModel, variables, init_poses,
                         target_feats, hists, ws, hwf: tuple,
                         cfg: RenderConfig, rcfg, mesh: Mesh):
    """Mode-3 refinement of a whole test SET across the mesh: the frame
    batch is sharded over every device axis, each chip runs its frames'
    50-iteration scans independently (refinement is embarrassingly
    parallel across frames — the serving-scale path the reference's
    serial loop cannot express). Frame count must divide the device
    count; callers pad with repeats and drop extras.

    Returns (refined poses (N, 3, 4), losses (N, opt_iter))."""
    from nefes_tpu.refine.pose_opt import refine_poses_batch

    frame_spec = NamedSharding(mesh, P(("data", "rays")))
    rep = replicated(mesh)
    init_poses = jax.device_put(init_poses, frame_spec)
    target_feats = jax.device_put(target_feats, frame_spec)
    hists = jax.device_put(hists, frame_spec)
    variables = jax.device_put(variables, rep)

    @partial(jax.jit, out_shardings=(frame_spec, frame_spec))
    def go(variables, poses, feats, hi):
        return refine_poses_batch(model, variables, poses, feats, hi, ws,
                                  hwf, cfg, rcfg)

    return go(variables, init_poses, target_feats, hists)


def refine_apr_sharded(model: NeFeSModel, variables, dfnet, dfnet_vars,
                       images, targets, hists, ws_vec, hwf_render: tuple,
                       hwf_full: tuple, near: float, far: float,
                       cfg: RenderConfig, rcfg, mesh: Mesh,
                       svd_reg: bool = True, masks=None,
                       freeze_bn: bool = True, apr_kind: str = "DFNet",
                       dataset_type: str = "7Scenes", pose_avg=None) -> dict:
    """Mode-2 (APR-weight) refinement of a frame batch sharded across the
    mesh — the paper-headline serving path at fleet scale. Each device
    runs its frames' full 50-iteration APR-weight scans (including per-
    frame DFNet/VGG16 forwards) independently; the field + APR weights
    are replicated, the frame axis (images/targets/hists/masks) is split
    over every mesh axis. Frame count must divide the device count
    (callers pad with repeats and drop extras, as cli/refine.py does for
    the vmapped batch).

    Returns the refine_apr_batch dict with frame-sharded leaves."""
    from nefes_tpu.refine.apr_opt import refine_apr_batch

    frame_spec = NamedSharding(mesh, P(("data", "rays")))
    rep = replicated(mesh)
    images = jax.device_put(images, frame_spec)
    targets = jax.device_put(targets, frame_spec)
    hists = jax.device_put(hists, frame_spec)
    if masks is not None:
        masks = jax.device_put(masks, frame_spec)
    variables = jax.device_put(variables, rep)
    dfnet_vars = jax.device_put(dfnet_vars, rep)

    kw = dict(svd_reg=svd_reg, freeze_bn=freeze_bn, apr_kind=apr_kind,
              dataset_type=dataset_type, pose_avg=pose_avg)

    @partial(jax.jit, out_shardings=frame_spec)
    def go(variables, dfnet_vars, images, targets, hists, masks):
        return refine_apr_batch(model, variables, dfnet, dfnet_vars,
                                images, targets, hists, ws_vec,
                                hwf_render, hwf_full, near, far, cfg,
                                rcfg, masks=masks, **kw)

    return go(variables, dfnet_vars, images, targets, hists, masks)


def render_rays_sharded(model: NeFeSModel, params, rays_o, rays_d,
                        near, far, cfg: RenderConfig, mesh: Mesh):
    """Render one image's rays sharded across ALL devices of the mesh
    (flattened (R, 3) rays split over data×rays). R must divide evenly;
    callers pad (render_image_sharded handles it)."""
    spec = NamedSharding(mesh, P(("data", "rays")))
    rep = replicated(mesh)
    rays_o = jax.device_put(rays_o, spec)
    rays_d = jax.device_put(rays_d, spec)
    params = jax.device_put(params, rep)

    @partial(jax.jit, out_shardings=spec)
    def go(params, ro, rd):
        return render_rays(model.coarse_fn, model.fine_fn, params, params,
                           ro, rd, near, far, None, cfg)["rgb"]

    return go(params, rays_o, rays_d)
