"""DFNet — VGG16-hypercolumn feature extractor + absolute pose regressor.

Reference: script/feature/dfnet.py (DFNet/AdaptLayers). The torchvision
VGG16 backbone is defined natively here (torchvision is a weight source,
not a code dependency — SURVEY.md §2.9); pretrained weights arrive via the
torch->flax converter in nefes_tpu/features/convert.py.

Hypercolumn taps: conv1_2, conv3_3, conv5_3 *pre-ReLU* (the reference
captures the output of encoder[i] where i is the Conv2d index,
dfnet.py:129-134). Each tap goes through an adaptation block
(1x1 conv -> ReLU -> 5x5 conv -> BN) and is bilinearly upsampled
(align_corners=True, matching nn.UpsamplingBilinear2d) to a common size.

All NHWC. Inference-only by design: DFNet is frozen everywhere in the
NeFeS pipeline except APR-refinement mode 2, where its *pose head* (and
optionally the whole tower) receives gradients — supported here because
the module is a pure function of params.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from nefes_tpu.ops.pooling import max_pool_2x2
from nefes_tpu.utils.image import resize_bilinear

# VGG16 conv plan: (name, out_channels); 'M' = 2x2 maxpool
VGG16_PLAN = (
    ("conv1_1", 64), ("conv1_2", 64), "M",
    ("conv2_1", 128), ("conv2_2", 128), "M",
    ("conv3_1", 256), ("conv3_2", 256), ("conv3_3", 256), "M",
    ("conv4_1", 512), ("conv4_2", 512), ("conv4_3", 512), "M",
    ("conv5_1", 512), ("conv5_2", 512), ("conv5_3", 512), "M",
)

HYPERCOLUMN_TAPS = ("conv1_2", "conv3_3", "conv5_3")  # dfnet.py:81
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


class AdaptBlock(nn.Module):
    """1x1 conv -> ReLU -> 5x5 conv -> BN (reference AdaptLayers,
    dfnet.py:45-76). BN uses running stats (frozen) unless train=True."""

    output_dim: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        h = nn.Conv(64, (1, 1), name="conv1", dtype=self.dtype)(x)
        h = nn.relu(h)
        h = nn.Conv(self.output_dim, (5, 5), padding="SAME", name="conv2",
                    dtype=self.dtype)(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn", dtype=self.dtype)(h)
        return h


class DFNet(nn.Module):
    """Feature extractor and APR. Returns (features | None, pose | None).

    features: (L=3, B, H_up, W_up, output_dim) stacked hypercolumn levels
    (NHWC analogue of the reference's (1, [3, B, C, H, W]) single-stream
    output, dfnet.py:145-149).
    pose: (B, 12) flattened 3x4 — reshaped/SVD-regularised by callers.
    """

    feat_dim: int = 12              # pose head output (3x4)
    output_dim: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, return_feature: bool = True,
                 return_pose: bool = True, upsample_hw: tuple | None = None,
                 train_bn: bool = False):
        """x: (B, H, W, 3) RGB in [0,1]."""
        if return_pose:
            # the pose head global-pools conv5_3 after FIVE 2x2 maxpools;
            # inputs under 32 px collapse to a zero-size map and the mean
            # over it is silently NaN (torch's maxpool would error)
            assert x.shape[1] >= 32 and x.shape[2] >= 32, (
                f"DFNet pose head needs >=32x32 input, got "
                f"{x.shape[1]}x{x.shape[2]}")
        mean = jnp.asarray(IMAGENET_MEAN, x.dtype)
        std = jnp.asarray(IMAGENET_STD, x.dtype)
        h = ((x - mean) / std).astype(self.dtype)

        taps = []
        for item in VGG16_PLAN:
            if item == "M":
                # custom-VJP pool: XLA's select-and-scatter maxpool
                # backward is serial on TPU (ops/pooling.py)
                h = max_pool_2x2(h)
                continue
            name, ch = item
            h = nn.Conv(ch, (3, 3), padding="SAME", name=name,
                        dtype=self.dtype)(h)
            if name in HYPERCOLUMN_TAPS:
                taps.append(h)   # pre-ReLU tap (dfnet.py:129-134)
            h = nn.relu(h)
            if name == "conv5_3" and not return_pose:
                break

        features = None
        if return_feature:
            ups = []
            for i, t in enumerate(taps):
                a = AdaptBlock(self.output_dim, dtype=self.dtype,
                               name=f"adapt_{i}")(t.astype(jnp.float32),
                                                  train=train_bn)
                if upsample_hw is not None:
                    a = resize_bilinear(a, upsample_hw[0], upsample_hw[1],
                                        align_corners=True)
                ups.append(a)
            # stack only when levels share a size (i.e. upsampled);
            # otherwise return the per-level list (siamese/raw use)
            features = jnp.stack(ups) if upsample_hw is not None else ups

        pose = None
        if return_pose:
            g = jnp.mean(h, axis=(1, 2)).astype(jnp.float32)  # adaptive avgpool(1)
            pose = nn.Dense(self.feat_dim, name="fc_pose")(g)
        return features, pose


def extract_target_features(dfnet: DFNet, variables, images: jnp.ndarray,
                            H: int, W: int,
                            levels: tuple[int, ...] = (0,)) -> jnp.ndarray:
    """Single-stream DFNet feature extraction at (H, W) — the per-image
    target of the DFM loss (reference inference_pose_feature_extraction,
    DFM_pose_refine.py:163-190).

    levels: hypercolumn levels to use (``feature_matching_lvl``,
    dm/options.py:24-25; default [0]). Multiple levels are concatenated
    along channels, the [L,B,C,H,W] -> [B,L*C,H,W] reshape of
    preprocess_features_for_loss (DFM_pose_refine.py:97-106).
    Returns (B, H, W, len(levels)*C)."""
    feats, _ = dfnet.apply(variables, images, return_feature=True,
                           return_pose=False, upsample_hw=(H, W))
    return jnp.concatenate([feats[l] for l in levels], axis=-1)
