"""SSIM — used by the refinement verification fail-safe.

Matches reference script/utils/utils.py:15-49: 7x7 average-pool windows,
reflection padding, C1=0.01², C2=0.03², clamped to [0, 1] (similarity, not
DSSIM). Operates on NHWC."""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

_K = 7
_C1 = 0.01 ** 2
_C2 = 0.03 ** 2


def _avg_pool_valid(x: jnp.ndarray) -> jnp.ndarray:
    """7x7 stride-1 VALID mean pool over NHWC."""
    s = lax.reduce_window(x, 0.0, lax.add, (1, _K, _K, 1), (1, 1, 1, 1),
                          "VALID")
    return s / (_K * _K)


def _reflect_pad(x: jnp.ndarray) -> jnp.ndarray:
    p = _K // 2
    return jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect")


def ssim(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Per-pixel SSIM map of two NHWC images, clamped to [0, 1]."""
    x = _reflect_pad(x)
    y = _reflect_pad(y)
    mu_x = _avg_pool_valid(x)
    mu_y = _avg_pool_valid(y)
    sigma_x = _avg_pool_valid(x * x) - mu_x * mu_x
    sigma_y = _avg_pool_valid(y * y) - mu_y * mu_y
    sigma_xy = _avg_pool_valid(x * y) - mu_x * mu_y
    n = (2 * mu_x * mu_y + _C1) * (2 * sigma_xy + _C2)
    d = (mu_x ** 2 + mu_y ** 2 + _C1) * (sigma_x + sigma_y + _C2)
    return jnp.clip(n / d, 0.0, 1.0)


def ssim_mean(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    return ssim(x, y).mean()
