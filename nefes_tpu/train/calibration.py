"""Closed-form convergence of the FusionNet's trailing-BN affine.

Measured on the accuracy harness (round 5 diagnostic): after our miniature
stage-2 schedule the fusion conv stack already carries the pose-sensitive
signal — per-channel correlation with the DFNet targets has median 0.67,
87% of channels above |0.5| — but at raw output scale ~1e3, and the
trailing BatchNorm's learnable affine, which must traverse the targets'
per-channel means (range ±3.2) at Adam's ~lr-per-step crawl, has only
reached ±0.52 after the harness's 2,800 stage-2 steps. The reference's
production schedule gives the same affine ~10x longer to converge
(EPOCH_TO_FUSION = 200 of args.epochs ≈ 2000 epochs,
reference script/run_nefes.py:34-40, train_nefes.sh), which the miniature
harness cannot afford on a shared chip.

This module sets the affine to its least-squares optimum in closed form —
the stationary point SGD is marching toward (with the convs frozen, the
MSE fusion loss is quadratic in (scale, bias) alone) — instead of paying a
5-10x longer stage 2. Converted reference checkpoints never need it: their
affine had the full schedule to converge.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from nefes_tpu.fields.nerfh_nff import FusionNet


def fusion_pre_bn(model, variables, rgb_imgs: jnp.ndarray,
                  raw_feats: jnp.ndarray) -> jnp.ndarray:
    """FusionNet conv-stack output BEFORE the trailing BatchNorm, f32.

    rgb_imgs (N, h, w, 3) exposure-corrected renders, raw_feats
    (N, h, w, F) rendered features — the exact inference inputs."""
    fnet = FusionNet(feature_dim=model.cfg.feature_dim, no_bn=True,
                     dtype=jnp.float32)
    x = jnp.concatenate([rgb_imgs.astype(jnp.float32),
                         raw_feats.astype(jnp.float32)], axis=-1)
    # the no_bn module consumes the same conv params; the unused "bn"
    # subtree is ignored by flax
    return fnet.apply({"params": variables["params"]["fusion"]}, x,
                      train=False)


def calibrate_fusion_bn(model, variables, rgb_imgs: jnp.ndarray,
                        raw_feats: jnp.ndarray, targets: jnp.ndarray,
                        eps: float = 1e-5) -> tuple[dict, dict]:
    """Fit the per-channel least-squares affine pre_bn -> target on the
    given (train-split) views and write it into the fusion BN parameters.

    Both normalization modes then realize the fitted affine: the running
    statistics are set to the calibration population's mean/var (so
    ``bn_stats="running"`` applies it exactly), and scale/bias are chosen
    so that under batch statistics close to the calibration population
    (``bn_stats="batch"``, the reference's operating point) the output
    matches it too:  BN(x) = g·(x-μ)/sqrt(σ²+ε) + b  ≡  a·x + c  with
    g = a·sqrt(σ²+ε), b = c + a·μ.

    Returns (new_variables, stats) where stats records the fit quality
    (per-channel correlation, pre/post L1 on the calibration views).
    """
    pre = fusion_pre_bn(model, variables, rgb_imgs, raw_feats)
    C = pre.shape[-1]
    F = pre.reshape(-1, C)
    T = targets.astype(jnp.float32).reshape(-1, C)
    mu_f, mu_t = F.mean(0), T.mean(0)
    var_f = F.var(0)
    cov = ((F - mu_f) * (T - mu_t)).mean(0)
    a = cov / (var_f + eps)
    c = mu_t - a * mu_f

    scale = a * jnp.sqrt(var_f + eps)
    bias = c + a * mu_f

    params = dict(variables["params"])
    fusion_p = dict(params["fusion"])
    bn = dict(fusion_p.get("bn", {}))
    bn["scale"], bn["bias"] = scale, bias
    fusion_p["bn"] = bn
    params["fusion"] = fusion_p
    new_vars = dict(variables)
    new_vars["params"] = params
    if "batch_stats" in variables:
        bs = dict(variables["batch_stats"])
        fbs = dict(bs.get("fusion", {}))
        fbn = dict(fbs.get("bn", {}))
        fbn["mean"], fbn["var"] = mu_f, var_f
        fbs["bn"] = fbn
        bs["fusion"] = fbs
        new_vars["batch_stats"] = bs

    corr = cov / jnp.sqrt((var_f + eps) * (T.var(0) + eps))
    l1_post = jnp.mean(jnp.abs(F * a + c - T))
    stats = {
        "corr_median": float(jnp.median(corr)),
        "corr_frac_gt_0p5": float(jnp.mean(jnp.abs(corr) > 0.5)),
        "l1_post": float(l1_post),
        "scale_median": float(jnp.median(scale)),
        "bias_range": [float(bias.min()), float(bias.max())],
    }
    return new_vars, stats
