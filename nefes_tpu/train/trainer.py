"""Jitted NeFeS training steps + the 3-stage progressive schedule.

Reference: script/run_nefes.py. The torch trainer's per-batch python work
(ray gathering with list comprehensions, host loops, global default-device
flips, GradScaler) collapses into two compiled programs:

  * ``train_step_rays``  — stages 0/1: B×N_rand random rays per step
    (run_nefes.py:42-76 + 210-256)
  * ``train_step_patch`` — stage 2 (fusion): 7 random 16×16 patches per
    image so the fusion CNN sees 2-D neighborhoods (run_nefes.py:78-108 +
    150-243)

Both take the learning rate as a traced argument (the reference recomputes
the exp-decayed LR every step, run_nefes.py:265-271). No GradScaler: TPU
bf16 needs no loss scaling.

Stage semantics (run_nefes.py:34-40):
  schedule 1 (stage-1 run):   stage 0 (color only) for all epochs
  schedule 2 (stage-2/3 run): stage 1 (color+feat) until epoch 200, then
                              stage 2 (color+feat+fusion, patch sampling)
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from nefes_tpu.geometry.rays import get_ray_at
from nefes_tpu.render.renderer import RenderConfig, render_rays
from nefes_tpu.train.losses import nefes_training_loss, psnr
from nefes_tpu.train.model import NeFeSModel

EPOCH_TO_FUSION = 200   # run_nefes.py:37
NUM_CROPS = 7           # run_nefes.py:87
CROP_SIZE = 16          # run_nefes.py:88


@dataclass(frozen=True)
class AuxConfig:
    """Auxiliary regularizer switches (reference options.py:52-55,78-79,
    aux math in nefes_tpu/train/aux_losses.py). Hashable jit static."""

    tvloss: bool = False
    tvloss_w: float = 1e-6
    l1normloss: bool = False        # hash-grid tables only
    l1normloss_w: float = 1e-6
    sigma_sparsity: bool = False
    sigma_sparsity2: bool = False
    bound: float = 4.0              # world box half-side for the TV cube
    # DPT mono-depth supervision (reference --depth, options.py:61; the
    # loss math is losses.py:175-191 — its call site is dead code in the
    # reference scripts, so the 0.1 weight is this framework's choice)
    depth: bool = False
    depth_w: float = 0.1

    @classmethod
    def from_options(cls, opts, far: float) -> "AuxConfig":
        return cls(tvloss=opts.tvloss, tvloss_w=opts.tvloss_w,
                   l1normloss=opts.l1normloss,
                   l1normloss_w=opts.l1normloss_w,
                   sigma_sparsity=opts.sigma_sparsity_loss,
                   sigma_sparsity2=opts.sigma_sparsity_loss2,
                   depth=opts.depth_loss,
                   bound=float(far))

    @property
    def any_on(self) -> bool:
        return (self.tvloss or self.l1normloss or self.sigma_sparsity
                or self.sigma_sparsity2)


def aux_regularizers(aux: "AuxConfig", model: NeFeSModel, params,
                     out: dict, rng: jax.Array,
                     cfg: RenderConfig) -> jnp.ndarray:
    """Sum of enabled aux losses. TV samples density over a random
    sub-cube of [-bound, bound]^3 (the reference's normalized hash domain,
    losses.py:226-265); sparsity acts on the raw fine sigmas of the
    current batch."""
    from nefes_tpu.fields.embedder import embed
    from nefes_tpu.train.aux_losses import (
        embeddings_l1_loss, sigma_sparsity_loss, sigma_sparsity_loss2,
        total_variation_loss,
    )
    loss = jnp.zeros(())
    if aux.l1normloss:
        # hash-grid table L1 (reference embeddings_L1_loss,
        # losses.py:284-314); encoder_fns raises for non-hash fields —
        # the CLI gates the flag on the field kind
        enc_c, enc_f = model.encoder_fns(params)
        loss = loss + aux.l1normloss_w * embeddings_l1_loss(enc_c, enc_f)
    if aux.tvloss:
        def density(x01, fn):
            xyz = (x01 * 2.0 - 1.0) * aux.bound
            return fn(params, embed(xyz, cfg.xyz_embed), None, True,
                      False)["static_sigma"]
        loss = loss + aux.tvloss_w * total_variation_loss(
            rng, partial(density, fn=model.coarse_fn),
            partial(density, fn=model.fine_fn),
            sample_resolution=(64, 64, 64))
    if aux.sigma_sparsity:
        loss = loss + jnp.mean(sigma_sparsity_loss(out["static_sigmas"]))
    if aux.sigma_sparsity2:
        loss = loss + sigma_sparsity_loss2(out["static_sigmas"])
    return loss


def stage_for_epoch(new_schedule: int, epoch: int) -> int:
    if new_schedule != 2:
        return 0
    return 1 if epoch < EPOCH_TO_FUSION else 2


def lr_for_epoch(epoch: int, lrate: float = 5e-4,
                 lrate_decay: float = 0.754) -> float:
    """lrate · 0.1^(epoch / (lrate_decay·1000)) — run_nefes.py:265-271."""
    return lrate * (0.1 ** (epoch / (lrate_decay * 1000.0)))


class TrainState(struct.PyTreeNode):
    variables: Any            # {'params': ..., 'batch_stats': ...}
    opt_state: Any
    epoch: jnp.ndarray

    @property
    def params(self):
        return self.variables["params"]


def make_optimizer(grad_clip: float = 0.0) -> optax.GradientTransformation:
    """Adam(β=0.9, 0.999) with injectable LR (nerfh_nff.py:682).

    grad_clip > 0 prepends global-norm clipping. The reference never
    clips, so the default is off; it exists because the FusionNet's
    trailing BatchNorm (nerfh_nff.py:393-394) can amplify early-training
    gradient spikes enough to knock a whole conv layer's ReLUs dead
    (measured: a collapsed run leaves batch_stats var ~1e-10 and the
    fused output pose-independent — zero DFM gradient downstream)."""
    if grad_clip and grad_clip > 0:
        def clipped(learning_rate):
            return optax.chain(optax.clip_by_global_norm(grad_clip),
                               optax.adam(learning_rate))
        return optax.inject_hyperparams(clipped)(learning_rate=5e-4)
    return optax.inject_hyperparams(optax.adam)(learning_rate=5e-4)


def create_train_state(model: NeFeSModel, rng: jax.Array,
                       tx: optax.GradientTransformation | None = None) -> TrainState:
    variables = model.init_variables(rng)
    tx = tx or make_optimizer()
    return TrainState(variables=variables,
                      opt_state=tx.init(variables["params"]),
                      epoch=jnp.zeros((), jnp.int32))


def _select_ray_pixels(rng: jax.Array, n_rand: int, H: int, W: int,
                       mask: jnp.ndarray | None):
    """Pick n_rand pixel coords, optionally restricted to mask>0.

    Gumbel top-k = exact uniform sampling without replacement under a
    validity mask with static shapes (replaces the ragged
    np.random.choice(valid_inds) of run_nefes.py:51-61)."""
    g = jax.random.gumbel(rng, (H * W,))
    if mask is not None:
        g = g + jnp.where(mask.reshape(-1) > 0, 0.0, -1e9)
    _, idx = jax.lax.top_k(g, n_rand)
    py, px = idx // W, idx % W
    return px.astype(jnp.float32), py.astype(jnp.float32), idx


def _render_selected(model: NeFeSModel, params, poses, px, py, hists,
                     H, W, focal, near, far, rng, cfg: RenderConfig,
                     window=None):
    """Render rays at per-image pixel coords. px/py: (B, N). Returns the
    train render dict with (B, N, ...) leaves. Per-image latent fields
    (field_zoo) get their N_vocab-table latents bound from each image's
    histogram here."""
    def one(pose, pxi, pyi, hist, key):
        ro, rd = get_ray_at(pxi, pyi, focal, H, W, pose)
        cfn, ffn = model.ray_field_fns(params, hist)
        return render_rays(cfn, ffn, params, params,
                           ro, rd, near, far, key, cfg, window=window)
    keys = jax.random.split(rng, poses.shape[0])
    return jax.vmap(one)(poses, px, py, hists, keys)


def _finalize_rgb(model: NeFeSModel, params, out: dict, hists):
    """Exposure-correct the fine rgb (run_nefes.py:153-155, 215-217)."""
    out = dict(out)
    out["rgb"] = model.apply_exposure(params, hists, out["rgb"])
    return out


@partial(jax.jit, static_argnames=("model", "cfg", "tx", "n_rand", "stage",
                                   "hwf", "aux"))
def train_step_rays(model: NeFeSModel, cfg: RenderConfig,
                    tx: optax.GradientTransformation,
                    state: TrainState, batch: dict, rng: jax.Array,
                    lr: jnp.ndarray, hwf: tuple, near: float, far: float,
                    n_rand: int = 1536, stage: int = 0,
                    aux: AuxConfig = AuxConfig(), window=None):
    """One random-ray step. batch: rgb (B,H,W,3) [render-scale], poses
    (B,3,4), hists (B,bins), feat (B,H,W,F) when stage>=1, mask optional.

    window: optional (xyz_window, dir_window) Nerfies coarse-to-fine band
    weights for reduce_embedding=2 — TRACED, so per-epoch annealing
    (reference embed_DNeRF, nerfh_nff.py:272-297 + run_nefes.py:370-371)
    reuses one compiled program."""
    H, W, focal = hwf
    B = batch["poses"].shape[0]
    rng_sel, rng_render, rng_aux = jax.random.split(rng, 3)
    sel_keys = jax.random.split(rng_sel, B)
    mask = batch.get("mask")
    px, py, idx = jax.vmap(
        lambda k, m: _select_ray_pixels(k, n_rand, H, W, m)
    )(sel_keys, mask if mask is not None else jnp.ones((B, H, W)))

    gather = lambda imgs: jax.vmap(
        lambda img, i: img.reshape(H * W, -1)[i])(imgs, idx)
    target_rgb = gather(batch["rgb"])
    target_feat = gather(batch["feat"]) if stage >= 1 else None
    target_depth = (gather(batch["depth"][..., None])[..., 0]
                    if aux.depth and "depth" in batch else None)

    def loss_fn(params):
        out = _render_selected(model, params, batch["poses"], px, py,
                               batch["hists"], H, W, focal, near, far,
                               rng_render, cfg, window)
        out = _finalize_rgb(model, params, out, batch["hists"])
        loss, metrics = nefes_training_loss(out, target_rgb, target_feat,
                                            fusion_out=None,
                                            stage=min(stage, 1))
        if aux.any_on:
            loss = loss + aux_regularizers(aux, model, params, out,
                                           rng_aux, cfg)
        if target_depth is not None:
            from nefes_tpu.train.aux_losses import compute_depth_loss
            loss_d = compute_depth_loss(out["depth"], target_depth)
            loss = loss + aux.depth_w * loss_d
            metrics["loss_depth"] = loss_d
        metrics["psnr"] = psnr(out["rgb"], target_rgb)
        return loss, metrics

    (loss, aux_out), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params)
    new_opt = state.opt_state
    new_opt.hyperparams["learning_rate"] = lr
    updates, new_opt = tx.update(grads, new_opt, state.params)
    new_params = optax.apply_updates(state.params, updates)
    new_vars = dict(state.variables)
    new_vars["params"] = new_params
    return (state.replace(variables=new_vars, opt_state=new_opt), loss,
            aux_out)


@partial(jax.jit, static_argnames=("model", "cfg", "tx", "stage", "hwf"))
def train_step_patch(model: NeFeSModel, cfg: RenderConfig,
                     tx: optax.GradientTransformation,
                     state: TrainState, batch: dict, rng: jax.Array,
                     lr: jnp.ndarray, hwf: tuple, near: float, far: float,
                     stage: int = 2, window=None):
    """Stage-2 step: NUM_CROPS random CROP_SIZE² patches (same coordinates
    for every image in the batch, as the reference does at
    run_nefes.py:85-94), rendered and pushed through the fusion CNN."""
    H, W, focal = hwf
    B = batch["poses"].shape[0]
    rng_h, rng_w, rng_render = jax.random.split(rng, 3)
    h0 = jax.random.randint(rng_h, (NUM_CROPS,), 0, H - CROP_SIZE)
    w0 = jax.random.randint(rng_w, (NUM_CROPS,), 0, W - CROP_SIZE)
    dy, dx = jnp.meshgrid(jnp.arange(CROP_SIZE), jnp.arange(CROP_SIZE),
                          indexing="ij")
    py = (h0[:, None, None] + dy).reshape(-1)      # (7*16*16,)
    px = (w0[:, None, None] + dx).reshape(-1)
    idx = (py * W + px)
    pxf = jnp.broadcast_to(px.astype(jnp.float32), (B, px.shape[0]))
    pyf = jnp.broadcast_to(py.astype(jnp.float32), (B, py.shape[0]))

    gather = lambda imgs: jax.vmap(
        lambda img: img.reshape(H * W, -1)[idx])(imgs)
    target_rgb = gather(batch["rgb"])
    target_feat = gather(batch["feat"])
    # contiguous patches cannot avoid masked-out (dynamic) pixels at
    # selection time — drop them from the feature/fusion terms instead
    patch_mask = (gather(batch["mask"])[..., 0]
                  if batch.get("mask") is not None else None)

    def loss_fn(variables):
        params = variables["params"]
        out = _render_selected(model, params, batch["poses"], pxf, pyf,
                               batch["hists"], H, W, focal, near, far,
                               rng_render, cfg, window)
        out = _finalize_rgb(model, params, out, batch["hists"])
        # reshape rays -> (B*crops, 16, 16, C) patch images for the CNN
        as_img = lambda x: x.reshape(B * NUM_CROPS, CROP_SIZE, CROP_SIZE,
                                     x.shape[-1])
        fusion_out, new_bs = model.apply_fusion(
            {**variables, "params": params},
            as_img(out["rgb"]), as_img(out["feat"]), train=True)
        fusion_flat = fusion_out.reshape(B, NUM_CROPS * CROP_SIZE * CROP_SIZE,
                                         -1)
        loss, aux = nefes_training_loss(out, target_rgb, target_feat,
                                        fusion_out=fusion_flat, stage=2,
                                        mask=patch_mask)
        aux["psnr"] = psnr(out["rgb"], target_rgb)
        return loss, (aux, new_bs)

    (loss, (aux, new_bs)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(state.variables)
    grads = grads["params"]
    new_opt = state.opt_state
    new_opt.hyperparams["learning_rate"] = lr
    updates, new_opt = tx.update(grads, new_opt, state.params)
    new_params = optax.apply_updates(state.params, updates)
    new_vars = dict(state.variables)
    new_vars["params"] = new_params
    if new_bs is not None:
        new_vars["batch_stats"] = {"fusion": new_bs}
    return state.replace(variables=new_vars, opt_state=new_opt), loss, aux
