"""Direct feature-matching (DFM) losses.

Reference: script/dm/DFM_pose_refine.py:211-288 (feature_loss /
FeatureLoss / masked_feature_loss). Cosine similarity between rendered and
target feature maps:

  per_pixel=False (the DFNet paper-model default, DFM_pose_refine.py:338):
    cosine over the SPATIAL axis per channel, averaged over channels.
  per_pixel=True: cosine over the CHANNEL axis per pixel, averaged over
    pixels.

Loss = 1 − mean cosine. eps=1e-6 as in torch CosineSimilarity.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-6


def _cos(a: jnp.ndarray, b: jnp.ndarray, axis: int) -> jnp.ndarray:
    # sqrt(x + eps²) ≈ torch's clamp_min(norm, eps) and, unlike
    # jnp.linalg.norm, has a finite gradient for all-zero feature pixels
    # (empty-space rays composite to exactly 0)
    na = jnp.sqrt(jnp.sum(a * a, axis=axis) + _EPS * _EPS)
    nb = jnp.sqrt(jnp.sum(b * b, axis=axis) + _EPS * _EPS)
    return (a * b).sum(axis) / (na * nb)


def feature_cosine_loss(feat_rgb: jnp.ndarray, feat_target: jnp.ndarray,
                        per_pixel: bool = False) -> jnp.ndarray:
    """feat_*: (H, W, C) or (N, C) feature maps.

    Matches reference feature_loss with img_in=True: reshape to (C, H*W),
    cosine along dim 1 (spatial) per channel unless per_pixel.
    """
    if feat_rgb.ndim == 3:
        C = feat_rgb.shape[-1]
        fr = feat_rgb.reshape(-1, C)       # (HW, C)
        ft = feat_target.reshape(-1, C)
    else:
        fr, ft = feat_rgb, feat_target
    axis = 0 if not per_pixel else 1       # spatial axis of (HW, C)
    return 1.0 - _cos(fr, ft, axis=axis).mean()


def masked_feature_cosine_loss(feat_rgb: jnp.ndarray,
                               feat_target: jnp.ndarray,
                               mask: jnp.ndarray,
                               per_pixel: bool = False) -> jnp.ndarray:
    """Semantic-masked variant (DFM_pose_refine.py:257-288). The reference
    gathers valid pixels (ragged); we zero-out invalid pixels before the
    spatial cosine — identical for the per-channel loss because masked
    entries contribute 0 to both dot product and norms."""
    m = (mask.reshape(-1, 1) > 0).astype(feat_rgb.dtype)
    C = feat_rgb.shape[-1]
    fr = feat_rgb.reshape(-1, C) * m
    ft = feat_target.reshape(-1, C) * m
    if per_pixel:
        cos = _cos(fr, ft, axis=1)
        valid = m[:, 0]
        return 1.0 - (cos * valid).sum() / jnp.maximum(valid.sum(), 1.0)
    return 1.0 - _cos(fr, ft, axis=0).mean()
