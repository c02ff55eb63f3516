"""Pinhole ray generation (OpenGL convention) in pure jnp.

Replaces reference script/models/ray_utils.py (get_rays/get_rays_batch/
ndc_rays). TPU-first: a single broadcast expression, vmappable over poses;
no python loops over the batch dim (the reference loops per image at
ray_utils.py:57-60).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

# full-precision ray rotation: pose gradients flow through this einsum
_PREC = lax.Precision.HIGHEST


def get_rays(H: int, W: int, focal: float, c2w: jnp.ndarray):
    """Rays for every pixel of an H×W image.

    c2w: (..., 3, 4) camera-to-world. Returns (rays_o, rays_d) each
    (..., H, W, 3). Direction convention matches reference
    ray_utils.py:5-16: ((i - W/2)/f, -(j - H/2)/f, -1) in camera frame.
    """
    j, i = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                        jnp.arange(W, dtype=jnp.float32), indexing="ij")
    dirs = jnp.stack([(i - W * 0.5) / focal,
                      -(j - H * 0.5) / focal,
                      -jnp.ones_like(i)], axis=-1)  # (H, W, 3)
    # rotate into world frame: d_world = R @ d_cam, broadcast over leading dims
    rays_d = jnp.einsum("hwc,...rc->...hwr", dirs, c2w[..., :3, :3], precision=_PREC)
    rays_o = jnp.broadcast_to(c2w[..., None, None, :3, 3],
                              rays_d.shape[:-3] + (H, W, 3))
    return rays_o, rays_d


def get_ray_at(px: jnp.ndarray, py: jnp.ndarray, focal: float, H: int, W: int,
               c2w: jnp.ndarray):
    """Rays for explicit pixel coordinates (px, py) of shape (N,).

    Used for random-ray / patch training batches where materialising all
    H×W rays first (as the reference does, run_nefes.py:45-65) would waste
    HBM bandwidth.
    """
    dirs = jnp.stack([(px - W * 0.5) / focal,
                      -(py - H * 0.5) / focal,
                      -jnp.ones_like(px)], axis=-1)  # (N, 3)
    rays_d = jnp.einsum("nc,...rc->...nr", dirs, c2w[..., :3, :3], precision=_PREC)
    rays_o = jnp.broadcast_to(c2w[..., None, :3, 3], rays_d.shape)
    return rays_o, rays_d


def ndc_rays(H: int, W: int, focal: float, near: float,
             rays_o: jnp.ndarray, rays_d: jnp.ndarray):
    """NDC transform for forward-facing (LLFF) scenes — capability parity
    with reference ray_utils.py:27-44 (unused by the paper-result path)."""
    t = -(near + rays_o[..., 2]) / rays_d[..., 2]
    rays_o = rays_o + t[..., None] * rays_d

    o0 = -1.0 / (W / (2.0 * focal)) * rays_o[..., 0] / rays_o[..., 2]
    o1 = -1.0 / (H / (2.0 * focal)) * rays_o[..., 1] / rays_o[..., 2]
    o2 = 1.0 + 2.0 * near / rays_o[..., 2]
    d0 = -1.0 / (W / (2.0 * focal)) * (rays_d[..., 0] / rays_d[..., 2]
                                       - rays_o[..., 0] / rays_o[..., 2])
    d1 = -1.0 / (H / (2.0 * focal)) * (rays_d[..., 1] / rays_d[..., 2]
                                       - rays_o[..., 1] / rays_o[..., 2])
    d2 = -2.0 * near / rays_o[..., 2]
    return jnp.stack([o0, o1, o2], -1), jnp.stack([d0, d1, d2], -1)
