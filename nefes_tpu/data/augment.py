"""Image augmentations — torchvision-semantics ColorJitter.

Reference: dataset_loaders/cambridge_scenes.py:263-264 creates
``transforms.ColorJitter(brightness=(0.2,1.3), contrast=(0.8,1.5),
saturation=(1.0,2.5))`` to mimic exposure variation for APR training
(the NeRF dataloader asserts it OFF, load_Cambridge.py:410 — same rule
applies here: this is for the APR/feature-training path only).

torchvision semantics reproduced exactly: per-op factor uniform in its
range, ops applied in a random permutation, each op a clamped blend —
brightness vs black, contrast vs the mean of the grayscale image,
saturation vs the per-pixel grayscale.
"""

from __future__ import annotations

import numpy as np

BRIGHTNESS = (0.2, 1.3)
CONTRAST = (0.8, 1.5)
SATURATION = (1.0, 2.5)


def _grayscale(img: np.ndarray) -> np.ndarray:
    return (0.2989 * img[..., 0] + 0.587 * img[..., 1]
            + 0.114 * img[..., 2])[..., None]


def _blend(a, b, factor):
    return np.clip(factor * a + (1.0 - factor) * b, 0.0, 1.0)


def color_jitter(img: np.ndarray, rng: np.random.Generator | None = None,
                 brightness=BRIGHTNESS, contrast=CONTRAST,
                 saturation=SATURATION) -> np.ndarray:
    """img: (..., H, W, 3) float [0,1]. Returns the jittered copy."""
    rng = rng or np.random.default_rng()
    img = np.asarray(img, np.float32)
    ops = []
    if brightness:
        b = rng.uniform(*brightness)
        ops.append(lambda x: _blend(x, np.zeros_like(x), b))
    if contrast:
        c = rng.uniform(*contrast)
        ops.append(lambda x: _blend(
            x, _grayscale(x).mean((-3, -2, -1), keepdims=True), c))
    if saturation:
        s = rng.uniform(*saturation)
        ops.append(lambda x: _blend(x, _grayscale(x), s))
    for i in rng.permutation(len(ops)):
        img = ops[i](img)
    return img
