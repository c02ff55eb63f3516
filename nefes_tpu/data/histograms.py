"""Luminance histograms — the NeRF-Hist appearance conditioning signal.

Reference: dataset_loaders/seven_scenes.py:352-358 (torch.histc of the YUV
Y channel, 10 bins over [0,1], converted to rounded percent density) and the
kornia-derived rgb_to_yuv at dataset_loaders/utils/color.py:4-39.

numpy implementation (runs in the host data pipeline); a jnp twin is
provided for on-device recomputation inside jitted eval loops.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

# BT.601 luma coefficients (kornia rgb_to_yuv)
_YUV_Y = (0.299, 0.587, 0.114)


def luminance(img_hwc: np.ndarray) -> np.ndarray:
    """RGB (H, W, 3) in [0,1] -> Y channel (H, W)."""
    r, g, b = img_hwc[..., 0], img_hwc[..., 1], img_hwc[..., 2]
    return _YUV_Y[0] * r + _YUV_Y[1] * g + _YUV_Y[2] * b


def luminance_histogram(img_hwc: np.ndarray, bins: int = 10) -> np.ndarray:
    """Rounded percent-density luminance histogram, shape (bins,).

    Matches torch.histc(y, bins, min=0, max=1) -> /sum*100 -> round
    (seven_scenes.py:352-358). torch.histc puts values == max into the last
    bin; np.histogram with range=(0,1) does the same.
    """
    y = luminance(img_hwc)
    hist, _ = np.histogram(y, bins=bins, range=(0.0, 1.0))
    hist = hist.astype(np.float32)
    hist = hist / hist.sum() * 100.0
    return np.round(hist).astype(np.float32)


def luminance_histogram_jnp(img_hwc: jnp.ndarray, bins: int = 10) -> jnp.ndarray:
    """jit-safe twin (static bin count, fixed [0,1] range)."""
    y = (_YUV_Y[0] * img_hwc[..., 0] + _YUV_Y[1] * img_hwc[..., 1]
         + _YUV_Y[2] * img_hwc[..., 2]).reshape(-1)
    idx = jnp.clip((y * bins).astype(jnp.int32), 0, bins - 1)
    hist = jnp.zeros((bins,), jnp.float32).at[idx].add(1.0)
    hist = hist / hist.sum() * 100.0
    return jnp.round(hist)
