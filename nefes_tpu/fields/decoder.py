"""GIRAFFE neural-rendering upsampling decoder (legacy NFF scheme 2).

Reference: script/models/decoder.py — n_blocks of 2x nearest-neighbour
feature upsampling + 3x3 conv + leaky-ReLU, with bilinear-upsampled RGB
skip connections smoothed by a [1,2,1]⊗[1,2,1] blur, final block
upsampling straight to the target (H, W). NHWC throughout.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from nefes_tpu.utils.image import resize_bilinear

import numpy as np

_BLUR = np.asarray([1.0, 2.0, 1.0])  # numpy: no device init at import


def blur(x: jnp.ndarray) -> jnp.ndarray:
    """Normalised 3x3 binomial blur, per channel (reference Blur,
    decoder.py:6-15)."""
    k2d = jnp.asarray(_BLUR[:, None] * _BLUR[None, :])
    k2d = (k2d / k2d.sum()).astype(x.dtype)
    C = x.shape[-1]
    kernel = jnp.zeros((3, 3, 1, C), x.dtype).at[:, :, 0, :].set(
        k2d[..., None])
    from jax import lax
    return lax.conv_general_dilated(
        x, kernel, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=C)


def _nn_upsample2(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


def _nn_resize(x: jnp.ndarray, H: int, W: int) -> jnp.ndarray:
    """Nearest-neighbour resize to (H, W) — torch nn.Upsample(size=...)
    default mode (decoder.py:57)."""
    h, w = x.shape[1], x.shape[2]
    ri = (jnp.arange(H) * h // H).astype(jnp.int32)
    ci = (jnp.arange(W) * w // W).astype(jnp.int32)
    return x[:, ri][:, :, ci]


class GiraffeDecoder(nn.Module):
    """(B, h, w, input_dim) feature maps -> (B, H, W, out_dim) RGB."""

    n_feat: int = 128
    input_dim: int = 128
    out_dim: int = 3
    min_feat: int = 32
    n_blocks: int = 4
    out_hw: tuple[int, int] = (240, 427)
    use_rgb_skip: bool = True
    final_actvn: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, return_hier_rgbs: bool = False):
        H, W = self.out_hw
        conv = lambda f, name: nn.Conv(f, (3, 3), padding="SAME", name=name,
                                       dtype=self.dtype)
        up_rgb = lambda r: blur(resize_bilinear(r, r.shape[1] * 2,
                                                r.shape[2] * 2))
        up_rgb_final = lambda r: blur(resize_bilinear(r, H, W))

        net = x if self.n_feat == self.input_dim else nn.Conv(
            self.n_feat, (1, 1), name="conv_in", dtype=self.dtype)(x)

        rgb = None
        if self.use_rgb_skip:
            rgb = conv(self.out_dim, "conv_rgb_0")(x)
            rgb = up_rgb(rgb) if self.n_blocks > 1 else up_rgb_final(rgb)

        rgbs = []
        widths = [max(self.n_feat // (2 ** (i + 1)), self.min_feat)
                  for i in range(self.n_blocks)]
        for idx, wch in enumerate(widths):
            if idx < self.n_blocks - 1:
                net_up = _nn_upsample2(net)
            else:
                net_up = _nn_resize(net, H, W)  # nn.Upsample(size=...), NN
            net = nn.leaky_relu(conv(wch, f"conv_{idx}")(net_up),
                                negative_slope=0.2)
            if self.use_rgb_skip:
                rgb = rgb + conv(self.out_dim, f"conv_rgb_{idx + 1}")(net)
                if return_hier_rgbs:
                    rgbs.append(rgb)
                if idx < self.n_blocks - 2:
                    rgb = up_rgb(rgb)
                elif idx == self.n_blocks - 2:
                    rgb = up_rgb_final(rgb)
        if not self.use_rgb_skip:
            rgb = conv(self.out_dim, "conv_rgb_out")(net)
        if return_hier_rgbs:
            return rgbs
        return nn.sigmoid(rgb) if self.final_actvn else rgb
