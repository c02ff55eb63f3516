"""Image resize ops with exact torch interpolation semantics.

The reference's DFM loss path runs through torch resizes whose kernels
differ from jax.image.resize defaults:

  * ``nn.UpsamplingBilinear2d`` (DFNet feature upsample, dfnet.py:148) is
    bilinear with ``align_corners=True``.
  * ``nn.Upsample(mode='bicubic')`` / ``F.interpolate(mode='bicubic')``
    (feature/rgb upsample in refinement, DFM_APR_refine.py:114,118) is
    bicubic with A = -0.75, half-pixel centers — jax's 'cubic' uses the
    Keys kernel A = -0.5, so we implement torch's here.
  * ``F.interpolate(mode='bilinear', align_corners=False)`` (target
    downsample, run_nefes.py:147) matches jax.image.resize 'linear'
    closely but is reproduced exactly via the same gather machinery.

All implemented as separable 1-D gathers (static shapes; XLA fuses)
operating on NHWC or HWC arrays.
"""

from __future__ import annotations

from functools import partial

import jax.numpy as jnp
import numpy as np


def _linear_weights(in_size: int, out_size: int, align_corners: bool):
    """Returns (idx0, idx1, w1) arrays for 1-D linear interpolation."""
    if align_corners and out_size > 1:
        x = np.arange(out_size) * (in_size - 1) / (out_size - 1)
    else:
        scale = in_size / out_size
        x = np.maximum((np.arange(out_size) + 0.5) * scale - 0.5, 0.0)
    i0 = np.clip(np.floor(x).astype(np.int32), 0, in_size - 1)
    i1 = np.minimum(i0 + 1, in_size - 1)
    w1 = (x - i0).astype(np.float32)
    return i0, i1, w1


def _cubic_kernel(t: np.ndarray, A: float = -0.75) -> np.ndarray:
    """torch/OpenCV bicubic kernel (A=-0.75)."""
    at = np.abs(t)
    w = np.where(
        at <= 1.0,
        ((A + 2.0) * at - (A + 3.0)) * at * at + 1.0,
        np.where(at < 2.0, (((at - 5.0) * at + 8.0) * at - 4.0) * A, 0.0))
    return w.astype(np.float32)


def _cubic_weights(in_size: int, out_size: int):
    """(idx (out,4), w (out,4)) for torch half-pixel bicubic."""
    scale = in_size / out_size
    x = (np.arange(out_size) + 0.5) * scale - 0.5
    x0 = np.floor(x).astype(np.int32)
    t = (x - x0).astype(np.float32)
    offs = np.array([-1, 0, 1, 2])
    idx = x0[:, None] + offs[None, :]
    w = _cubic_kernel(t[:, None] - offs[None, :].astype(np.float32))
    idx = np.clip(idx, 0, in_size - 1)  # torch clamps border samples
    return idx.astype(np.int32), w


def _resize_matrix(idx: np.ndarray, w: np.ndarray, in_size: int,
                   out_size: int) -> np.ndarray:
    """(out, taps) gather indices/weights -> dense (out, in) matrix.

    Interpolation along an axis becomes ONE small matmul instead of
    per-tap gathers: on TPU the gather lowering is lane-serial and its
    BACKWARD is a scatter-add — both far off the MXU path the profile
    showed them displacing (PROFILE_r04 'resize'). Border clamping can
    give duplicate indices per row, so weights accumulate.
    """
    m = np.zeros((out_size, in_size), np.float32)
    for k in range(idx.shape[1]):
        np.add.at(m, (np.arange(out_size), idx[:, k]), w[:, k])
    return m


def _apply_axis_matrix(img: jnp.ndarray, axis: int, m: np.ndarray) -> jnp.ndarray:
    moved = jnp.moveaxis(img, axis, -1)
    out = jnp.einsum("...i,oi->...o", moved, jnp.asarray(m))
    return jnp.moveaxis(out, -1, axis)


def _resize_axis_linear(img: jnp.ndarray, axis: int, out_size: int,
                        align_corners: bool) -> jnp.ndarray:
    in_size = img.shape[axis]
    i0, i1, w1 = _linear_weights(in_size, out_size, align_corners)
    idx = np.stack([i0, i1], axis=1)
    w = np.stack([1.0 - w1, w1], axis=1).astype(np.float32)
    return _apply_axis_matrix(img, axis,
                              _resize_matrix(idx, w, in_size, out_size))


def _resize_axis_cubic(img: jnp.ndarray, axis: int, out_size: int) -> jnp.ndarray:
    idx, w = _cubic_weights(img.shape[axis], out_size)
    return _apply_axis_matrix(
        img, axis, _resize_matrix(idx, w, img.shape[axis], out_size))


def resize_bilinear(img: jnp.ndarray, H: int, W: int,
                    align_corners: bool = False) -> jnp.ndarray:
    """Bilinear resize of (..., H, W, C) to (..., H', W', C)."""
    img = _resize_axis_linear(img, img.ndim - 3, H, align_corners)
    return _resize_axis_linear(img, img.ndim - 2, W, align_corners)


def resize_bicubic(img: jnp.ndarray, H: int, W: int) -> jnp.ndarray:
    """torch-semantics bicubic (A=-0.75, half-pixel) of (..., H, W, C)."""
    img = _resize_axis_cubic(img, img.ndim - 3, H)
    return _resize_axis_cubic(img, img.ndim - 2, W)


upsample_bilinear_align_corners = partial(resize_bilinear, align_corners=True)
