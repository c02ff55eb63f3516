"""Training losses — the reference loss zoo (script/models/losses.py) as
pure functions.

The production NeFeS loss is ``color_feat_fusion_nerfw``
(run_nefes.py:359-360): NeRF-W Eq.13 color terms + L1 feature term + L1
fusion term, with the 0.02/0.04 stage weights applied at the call site
(run_nefes.py:238-248) — mirrored in ``nefes_training_loss``.
"""

from __future__ import annotations

from functools import partial

import jax.numpy as jnp

LAMBDA_U = 0.01  # NerfWLoss lambda_u (losses.py:104)


def mse(a, b):
    return jnp.mean((a - b) ** 2)


def l1(a, b):
    return jnp.mean(jnp.abs(a - b))


def nerfw_loss(rgb_coarse: jnp.ndarray, rgb_fine: jnp.ndarray,
               target: jnp.ndarray, beta: jnp.ndarray | None = None,
               transient_sigmas: jnp.ndarray | None = None,
               lambda_u: float = LAMBDA_U) -> jnp.ndarray:
    """NeRF-W Eq. 13 (reference losses.py:89-132): 0.5·coarse MSE +
    beta-weighted fine MSE + log-beta (+3) + transient-sigma regulariser."""
    loss = 0.5 * mse(rgb_coarse, target)
    if beta is None:
        loss = loss + 0.5 * mse(rgb_fine, target)
    else:
        loss = loss + jnp.mean((rgb_fine - target) ** 2
                               / (2.0 * beta[..., None] ** 2))
        loss = loss + 3.0 + jnp.mean(jnp.log(beta))
        loss = loss + lambda_u * jnp.mean(transient_sigmas)
    return loss


def color_loss(rgb_coarse, rgb_fine, target):
    """Plain MSE fine+coarse (losses.py:4-15)."""
    return mse(rgb_fine, target) + mse(rgb_coarse, target)


def masked_l1(a, b, mask):
    """Mean |a-b| over pixels with mask>0. mask broadcasts against the
    leading dims of a (e.g. (B, N) weights vs (B, N, C) features)."""
    m = (mask > 0).astype(a.dtype)[..., None]
    denom = jnp.maximum(m.sum() * a.shape[-1], 1.0)
    return (jnp.abs(a - b) * m).sum() / denom


def nefes_training_loss(outputs: dict, target_rgb: jnp.ndarray,
                        target_feat: jnp.ndarray | None,
                        fusion_out: jnp.ndarray | None,
                        stage: int,
                        feat_weight: float = 0.04,
                        fusion_weight: float = 0.02,
                        mask: jnp.ndarray | None = None) -> tuple[jnp.ndarray, dict]:
    """The staged production loss.

    stage 0: color only (NerfW color terms, run_nefes.py:249-251)
    stage 1: + feat_weight·L1(feat_fine, target_feat)  (:244-248, w=0.04)
    stage 2: + fusion_weight·(L1 feat + L1 fusion)     (:238-243, w=0.02)

    outputs: render_rays train dict (rgb AFTER affine color transform must
    be placed in outputs['rgb']). mask: optional (B, N) semantic validity
    weights applied to the feature/fusion terms — the stage-2 patch step
    cannot pre-filter pixels by mask (patches are contiguous), so dynamic
    pixels are excluded here instead. Returns (loss, aux dict).
    """
    # with the transient heads off (NeRFW=False) the compositor returns a
    # zero beta map — the Eq.13 beta terms must fall back to plain MSE or
    # log(beta) explodes
    ts = outputs.get("transient_sigmas")
    loss_rgb = nerfw_loss(outputs["rgb0"], outputs["rgb"], target_rgb,
                          beta=outputs.get("beta") if ts is not None
                          else None,
                          transient_sigmas=ts)
    aux = {"loss_rgb": loss_rgb}
    if stage == 0:
        return loss_rgb, aux

    feat_l1 = l1 if mask is None else partial(masked_l1, mask=mask)
    loss_f = feat_l1(outputs["feat"], target_feat)
    if stage == 1:
        aux["loss_feat"] = loss_f
        return loss_rgb + feat_weight * loss_f, aux

    loss_fusion = feat_l1(fusion_out, target_feat)
    aux["loss_feat"] = loss_f
    aux["loss_fusion"] = loss_fusion
    return (loss_rgb + fusion_weight * loss_f + fusion_weight * loss_fusion,
            aux)


def psnr(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """-10·log10(MSE) (reference img2mse/mse2psnr, nerfh_nff.py:15-16)."""
    return -10.0 * jnp.log10(mse(pred, target))
