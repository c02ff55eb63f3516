"""Mode-3 refinement: explicit SE(3) pose-delta optimisation.

Reference: script/dm/DFM_pose_refine.py:290-453 (DFM_optimization_NFF /
DFM_post_processing2) + LearnPose (script/models/poses.py). The torch
version runs 50 python iterations per image, each launching chunked
renders; here the WHOLE 50-iteration optimisation is ONE ``lax.scan``
compiled once per scene geometry — per-frame cost is one executable launch
(SURVEY.md §2.10 TPU mapping). ``refine_poses_batch`` additionally vmaps
the scan across cameras, something the serial torch loop cannot express.

Per iteration (matching DFM_optimization_NFF):
  pose = SE3.exp([t, r]) ∘ init  ->  fix_coord_supp world rescale ->
  render at H/tinyscale -> exposure affine -> FusionNet (batch-stats BN,
  the reference's operating point — see NeFeSModel.apply_fusion) ->
  per-channel cosine feature loss vs DFNet target (extracted once at
  H/tinyscale) -> Adam step with separate lr_r / lr_t (options.py:137-138).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import optax

from nefes_tpu.geometry.se3 import learn_pose
from nefes_tpu.geometry.transforms import WorldSetup
from nefes_tpu.refine.losses import (
    feature_cosine_loss, masked_feature_cosine_loss,
)
from nefes_tpu.render.renderer import RenderConfig, render_image
from nefes_tpu.train.model import NeFeSModel


@dataclass(frozen=True)
class RefineConfig:
    opt_iter: int = 50          # dm/options.py:139
    lr_r: float = 0.01          # dm/options.py:137 (7Scenes sh: 0.0087)
    lr_t: float = 0.1           # dm/options.py:138 (7Scenes sh: 0.01)
    tinyscale: float = 4.0      # options.py:89
    per_pixel: bool = False
    learning_rate: float = 1e-5  # mode-2 APR lr (dm/options.py:31)
    # FusionNet application in the DFM forward: "batch" = reference-exact
    # batch-stats BN (see NeFeSModel.apply_fusion), "running" = running-
    # average BN, "none" = bypass fusion and match RAW rendered features
    # (ablation leg for the fused-vs-raw evidence)
    fusion: str = "batch"


def fix_coord_supp_jnp(pose: jnp.ndarray, ws: WorldSetup) -> jnp.ndarray:
    """jit-safe world rescale of (..., 3, 4) poses
    (reference direct_pose_model.py:210-232)."""
    t = pose[..., :3, 3]
    t = (t * ws.pose_scale
         + jnp.asarray(ws.move_all_cam_vec, pose.dtype)) * ws.pose_scale2
    return jnp.concatenate([pose[..., :3, :3], t[..., None]], axis=-1)


def render_feature_image(model: NeFeSModel, variables, pose34: jnp.ndarray,
                         hist: jnp.ndarray, hwf: tuple, near: float,
                         far: float, cfg: RenderConfig,
                         block_rays: int = 0, fusion_bn: str = "batch"):
    """Render at H/tinyscale and run exposure + fusion — the shared forward
    of both refinement modes (DFM_APR_refine.py:107-113,
    DFM_pose_refine.py:321-329). Returns (rgb_img (h,w,3), fused (h,w,F)).

    fusion_bn: BatchNorm statistics mode for the FusionNet — "batch"
    (reference-exact: the torch model is never .eval()'d, so its BN
    normalizes each render with its own statistics) or "running"
    (see NeFeSModel.apply_fusion).

    block_rays: 0 = one fused launch (right for the H/4 refinement
    renders). FULL-resolution calls (e.g. the accuracy harness's
    feature-finetune renders at 240x320 = 76,800 rays) MUST chunk: the
    unchunked fine pass materializes ~10 GB of (R*S, 63..131) transients
    and exhausts HBM."""
    h, w, focal = hwf
    params = variables["params"]
    if cfg.fused and cfg.fused_pre:
        packed_c, packed_f = model.pack_fused_pre(params)
        fine = (model.fine_render_pre_fn() if cfg.fused_render
                else model.fine_pre_fn(need_dw=cfg.fused_need_dw))
        out = render_image(model.coarse_pre_fn(need_dw=cfg.fused_need_dw),
                           fine, packed_c, packed_f,
                           h, w, focal, pose34, near, far, cfg,
                           block_rays=block_rays)
    elif cfg.fused:
        packed_c, packed_f = model.pack_fused(params)
        fine = (model.fine_render_raw_fn() if cfg.fused_render
                else model.fine_raw_fn(need_dw=cfg.fused_need_dw))
        out = render_image(model.coarse_raw_fn(need_dw=cfg.fused_need_dw),
                           fine, packed_c, packed_f,
                           h, w, focal, pose34, near, far, cfg,
                           block_rays=block_rays)
    else:
        out = render_image(model.coarse_fn, model.fine_fn, params, params,
                           h, w, focal, pose34, near, far, cfg,
                           block_rays=block_rays)
    rgb = model.apply_exposure(params, hist[None],
                               out["rgb"].reshape(1, -1, 3))
    rgb_img = rgb.reshape(h, w, 3)
    if fusion_bn == "none":
        return rgb_img, out["feat"]
    fused, _ = model.apply_fusion(variables, rgb_img[None],
                                  out["feat"][None], train=False,
                                  bn_stats=fusion_bn)
    return rgb_img, fused[0]


def _pose_optimizer(rcfg: RefineConfig) -> optax.GradientTransformation:
    """Per-group Adam: lr_r on r, lr_t on t (DFM_pose_refine.py:392-398)."""
    return optax.multi_transform(
        {"r": optax.adam(rcfg.lr_r), "t": optax.adam(rcfg.lr_t)},
        param_labels={"r": "r", "t": "t"})


@partial(jax.jit, static_argnames=("model", "cfg", "rcfg", "hwf"))
def refine_pose_single(model: NeFeSModel, variables, init_pose: jnp.ndarray,
                       target_feat: jnp.ndarray, hist: jnp.ndarray,
                       ws_vec: jnp.ndarray, hwf: tuple, near: float,
                       far: float, cfg: RenderConfig, rcfg: RefineConfig,
                       mask: jnp.ndarray | None = None):
    """Refine ONE camera pose for rcfg.opt_iter iterations as a lax.scan.

    init_pose: (3, 4) APR estimate in DATASET world frame (fix_coord_supp
    applied inside, as the reference does each iteration).
    target_feat: (h, w, C) DFNet features of the query image at render
    scale. ws_vec: [pose_scale, pose_scale2, mx, my, mz] world constants.
    mask: optional (h, w) semantic validity mask — invalid pixels are
    dropped from the cosine loss (masked_feature_loss semantics,
    DFM_pose_refine.py:257-288). Returns (refined_pose (3, 4) in dataset
    frame pre-rescale, losses (opt_iter,)).
    """
    tx = _pose_optimizer(rcfg)
    params0 = {"r": jnp.zeros(3), "t": jnp.zeros(3)}

    def pose_from(p):
        c2w = learn_pose(p["r"], p["t"], init_pose)[..., :3, :4]
        sc, sc2 = ws_vec[0], ws_vec[1]
        move = ws_vec[2:5]
        t = (c2w[..., :3, 3] * sc + move) * sc2
        nerf_pose = jnp.concatenate([c2w[..., :3, :3], t[..., None]], -1)
        return c2w, nerf_pose

    def loss_fn(p):
        _, nerf_pose = pose_from(p)
        _, fused = render_feature_image(model, variables, nerf_pose, hist,
                                        hwf, near, far, cfg,
                                        fusion_bn=rcfg.fusion)
        if mask is not None:
            return masked_feature_cosine_loss(fused, target_feat, mask,
                                              per_pixel=rcfg.per_pixel)
        return feature_cosine_loss(fused, target_feat,
                                   per_pixel=rcfg.per_pixel)

    def step(carry, _):
        p, opt_state = carry
        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, opt_state = tx.update(grads, opt_state, p)
        p = optax.apply_updates(p, updates)
        return (p, opt_state), loss

    (p_final, _), losses = jax.lax.scan(
        step, (params0, tx.init(params0)), None, length=rcfg.opt_iter)
    refined, _ = pose_from(p_final)
    return refined, losses


def refine_poses_batch(model: NeFeSModel, variables, init_poses, target_feats,
                       hists, ws: WorldSetup, hwf: tuple, cfg: RenderConfig,
                       rcfg: RefineConfig, masks=None):
    """vmap the per-camera scan across a batch of cameras — N refinements
    in one launch (the serial reference loop at DFM_pose_refine.py:380)."""
    ws_vec = jnp.asarray([ws.pose_scale, ws.pose_scale2,
                          *ws.move_all_cam_vec], jnp.float32)
    fn = lambda pose, feat, hist, mask: refine_pose_single(
        model, variables, pose, feat, hist, ws_vec, hwf, ws.near, ws.far,
        cfg, rcfg, mask=mask)
    if masks is None:
        fn_nomask = lambda pose, feat, hist: refine_pose_single(
            model, variables, pose, feat, hist, ws_vec, hwf, ws.near,
            ws.far, cfg, rcfg)
        return jax.vmap(fn_nomask)(init_poses, target_feats, hists)
    return jax.vmap(fn)(init_poses, target_feats, hists, masks)


@partial(jax.jit, static_argnames=("model", "hwf", "cfg", "rcfg",
                                   "has_mask"))
def refine_pose_indexed(model: NeFeSModel, variables, init_poses,
                        target_feats, hists, idx, ws_vec: jnp.ndarray,
                        hwf: tuple, near: float, far: float,
                        cfg: RenderConfig, rcfg: RefineConfig,
                        masks=None, has_mask: bool = False) -> jnp.ndarray:
    """ONE-LAUNCH mode-3 serving step over DEVICE-RESIDENT frame sets:
    slice frame ``idx`` (a traced scalar — one executable serves every
    frame) out of the full staged arrays, run the 50-iter SE(3) scan,
    return only the (3, 4) refined pose. The mode-3 counterpart of
    refine_apr_verified: per-frame host-side slicing + device_put staging
    puts 3-4 extra tunnel dispatches on every frame (measured as the
    mode-3 CLI loop's 1.36 vs 0.96 scan gap, BENCH r5 serving_ab)."""
    refined, _ = refine_pose_single(
        model, variables, init_poses[idx], target_feats[idx], hists[idx],
        ws_vec, hwf, near, far, cfg, rcfg,
        mask=masks[idx] if has_mask else None)
    return refined


@partial(jax.jit, static_argnames=("model", "ws", "hwf", "cfg", "rcfg"))
def refine_poses_scanned(model: NeFeSModel, variables, init_poses,
                         target_feats, hists, ws: WorldSetup, hwf: tuple,
                         cfg: RenderConfig, rcfg: RefineConfig, masks=None):
    """lax.scan the per-camera refinement across frames — one device
    launch, serial inside (single-frame memory + amortized per-launch
    dispatch; the mode-3 counterpart of refine_apr_verified_scanned).
    Unlike the vmapped refine_poses_batch this adds no cross-frame MXU
    work, so it wins exactly when per-launch overhead, not compute,
    dominates the serving gap. Returns (N, 3, 4) refined poses."""
    ws_vec = jnp.asarray([ws.pose_scale, ws.pose_scale2,
                          *ws.move_all_cam_vec], jnp.float32)

    def body(carry, xs):
        mask = xs[3] if masks is not None else None
        refined, _ = refine_pose_single(
            model, variables, xs[0], xs[1], xs[2], ws_vec, hwf, ws.near,
            ws.far, cfg, rcfg, mask=mask)
        return carry, refined

    xs = ((init_poses, target_feats, hists) if masks is None
          else (init_poses, target_feats, hists, masks))
    _, poses = jax.lax.scan(body, 0, xs)
    return poses
