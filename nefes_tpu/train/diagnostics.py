"""Training-health diagnostics.

The FusionNet (reference nerfh_nff.py:356-418: conv-relu x3 -> conv5x5 ->
BatchNorm) can train into a fully-collapsed state: one conv layer's ReLUs
go 100% dead, the output degenerates to the last conv's bias (a constant
map), and — because the trailing BatchNorm's bias keeps absorbing the
training loss — the death is stable. A constant fused output makes the
refinement-time DFM loss pose-independent, so its gradient is exactly
zero and both refinement modes silently do nothing. The fingerprint in a
trained checkpoint is a near-zero BatchNorm running variance (~1e-10).

`fusion_conv_liveness` measures the per-layer fraction of live (positive)
ReLU activations on a real input so harnesses and training loops can
detect the collapse instead of shipping an inert model."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from nefes_tpu.fields.nerfh_nff import IMAGENET_MEAN, IMAGENET_STD

__all__ = ["fusion_conv_liveness"]


def fusion_conv_liveness(fusion_params, rgb_img: jnp.ndarray,
                         feat: jnp.ndarray) -> dict[str, float]:
    """Fraction of positive post-ReLU activations per FusionNet conv.

    Args:
      fusion_params: the ``params['fusion']`` subtree of a trained model.
      rgb_img: (H, W, 3) rendered RGB in [0, 1] (pre-ImageNet-normalize,
        exactly what ``FusionNet.__call__`` receives).
      feat: (H, W, F) rendered feature map.

    Returns ``{'conv0': frac, 'conv1': frac, 'conv2': frac}``; 0.0 for a
    layer means every ReLU is dead — the fused output is a constant and
    the DFM gradient through it is zero.
    """
    x = jnp.concatenate(
        [(rgb_img - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD),
         feat], axis=-1)[None].astype(jnp.float32)
    live = {}
    for name in ("conv0", "conv1", "conv2"):
        x = jax.lax.conv_general_dilated(
            x, jnp.asarray(fusion_params[name]["kernel"], jnp.float32),
            (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        x = jax.nn.relu(x + jnp.asarray(fusion_params[name]["bias"],
                                        jnp.float32))
        live[name] = float(jnp.mean(x > 0))
    return live
