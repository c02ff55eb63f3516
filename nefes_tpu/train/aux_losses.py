"""Auxiliary regularization losses.

Reference: script/models/losses.py:175-366 — the geometry-regularizer zoo
used by the hash-grid / Cambridge experiments: TV-on-density over a random
alpha sub-cube, L1 on hash-grid embeddings, Cauchy sigma sparsity, scale-
invariant DPT depth losses, and edge-aware depth smoothness. Pure jnp;
random cube corners come in via explicit PRNG keys instead of torch's
global generator, and the density/encoder closures are plain callables
(xyz (N, 3) in [0,1] -> sigma / embedding) rather than module attributes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

TV_DELTAS = 9.5238e-02   # reference magic number (losses.py:231)


def _tv3d(vol: jnp.ndarray, denom: jnp.ndarray | float) -> jnp.ndarray:
    """Sum of squared forward differences along the 3 spatial axes of a
    (X, Y, Z, C) volume (compute_TV_loss, losses.py:219-223)."""
    tv_x = jnp.sum((vol[1:] - vol[:-1]) ** 2)
    tv_y = jnp.sum((vol[:, 1:] - vol[:, :-1]) ** 2)
    tv_z = jnp.sum((vol[:, :, 1:] - vol[:, :, :-1]) ** 2)
    return jnp.sum((tv_x + tv_y + tv_z) / denom) + 1e-8


def total_variation_loss(rng: jax.Array, density_coarse, density_fine,
                         sample_resolution=(512, 256, 512),
                         deltas: float = TV_DELTAS) -> jnp.ndarray:
    """TV smoothness on alphas over a random 10%-side sub-cube
    (losses.py:226-265). density_*: callable xyz (N, 3) in [0,1] -> sigma
    (N,)."""
    res = jnp.asarray(sample_resolution, jnp.float32)
    cube = tuple(int(s // 10) for s in sample_resolution)
    keys = jax.random.split(rng, 3)
    mins = [jax.random.randint(keys[i], (), 0,
                               sample_resolution[i] - cube[i])
            for i in range(3)]
    ax = [mins[i] + jnp.arange(cube[i]) for i in range(3)]
    grid = jnp.stack(jnp.meshgrid(*ax, indexing="ij"), axis=-1)
    coords = (grid / (res - 1.0)).reshape(-1, 3)

    out = []
    for density in (density_coarse, density_fine):
        sigma = density(coords)
        alpha = 1.0 - jnp.exp(-deltas * sigma)
        vol = alpha.reshape(*cube, 1)
        out.append(_tv3d(vol, jnp.asarray(cube, jnp.float32)))
    return out[0] + out[1]


def embeddings_l1_loss(encoder_coarse, encoder_fine,
                       sample_resolution: int = 16) -> jnp.ndarray:
    """Mean-|.| of hash-grid embeddings over a dense [0,1]³ grid
    (embeddings_L1_loss, losses.py:284-314)."""
    idx = jnp.arange(sample_resolution, dtype=jnp.float32)
    grid = jnp.stack(jnp.meshgrid(idx, idx, idx, indexing="ij"), axis=-1)
    coords = (grid / (sample_resolution - 1.0)).reshape(-1, 3)
    loss = 0.0
    for enc in (encoder_coarse, encoder_fine):
        emb = enc(coords)
        loss = loss + jnp.mean(jnp.abs(emb))
    return loss


def sigma_sparsity_loss(sigmas: jnp.ndarray) -> jnp.ndarray:
    """Cauchy sparsity, per-sample sum over the trailing axis
    (losses.py:277-279)."""
    return jnp.sum(jnp.log(1.0 + 2.0 * sigmas ** 2), axis=-1)


def sigma_sparsity_loss2(sigmas: jnp.ndarray,
                         lambda_u: float = 0.01) -> jnp.ndarray:
    return lambda_u * jnp.mean(sigmas)


def _shift_scale_normalize(depth: jnp.ndarray):
    t = jnp.median(depth)
    s = jnp.mean(jnp.abs(depth - t))
    return (depth - t) / (s + 1e-12)


def compute_depth_loss(pred_depth: jnp.ndarray,
                       gt_depth: jnp.ndarray) -> jnp.ndarray:
    """Scale/shift-invariant MSE between NeRF depth and DPT depth
    (losses.py:175-191)."""
    return jnp.mean((_shift_scale_normalize(pred_depth)
                     - _shift_scale_normalize(gt_depth)) ** 2)


def depth_loss_dpt(pred_depth: jnp.ndarray, gt_depth: jnp.ndarray,
                   weight: jnp.ndarray | None = None) -> jnp.ndarray:
    """(H, W) variant with optional pixel weights (losses.py:344-366)."""
    pn = _shift_scale_normalize(pred_depth)
    gn = _shift_scale_normalize(gt_depth)
    if weight is None:
        return jnp.mean((pn - gn) ** 2)
    per = (pn - gn) ** 2 * weight
    return per.sum() / (weight.sum() + 1e-8)


def compute_smooth_loss(tgt_depth: jnp.ndarray,
                        tgt_img: jnp.ndarray) -> jnp.ndarray:
    """Edge-aware smoothness of a disparity/depth map
    (losses.py:316-341). NHWC layout: depth (B, H, W, 1), img (B, H, W, 3)
    — the reference is NCHW; same math."""
    mean_disp = jnp.mean(tgt_depth, axis=(1, 2), keepdims=True)
    disp = tgt_depth / (mean_disp + 1e-7)

    grad_disp_x = jnp.abs(disp[:, :, :-1] - disp[:, :, 1:])
    grad_disp_y = jnp.abs(disp[:, :-1] - disp[:, 1:])
    grad_img_x = jnp.mean(jnp.abs(tgt_img[:, :, :-1] - tgt_img[:, :, 1:]),
                          axis=-1, keepdims=True)
    grad_img_y = jnp.mean(jnp.abs(tgt_img[:, :-1] - tgt_img[:, 1:]),
                          axis=-1, keepdims=True)
    grad_disp_x = grad_disp_x * jnp.exp(-grad_img_x)
    grad_disp_y = grad_disp_y * jnp.exp(-grad_img_y)
    return jnp.mean(grad_disp_x) + jnp.mean(grad_disp_y)
