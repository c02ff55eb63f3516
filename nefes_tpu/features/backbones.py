"""ImageNet CNN backbones in flax (NHWC): ResNet34, MobileNetV2,
EfficientNet-B0/B3.

These replace torchvision / efficientnet-pytorch as the APR feature
extractors (reference script/dm/pose_model.py:226-294; SURVEY.md §2.9:
pretrained weights are a *data* dependency — converters in
features/convert_backbones.py map the torch state_dicts).

All BatchNorms default to frozen running stats (the APRs are always used
pretrained + fine-tuned with freezeBN in the reference, utils.py:51-61).
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp


class ConvBN(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1
    act: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # torchvision pads symmetrically ((k-1)//2 each side) — NOT TF
        # "SAME", which goes asymmetric for stride 2 on even sizes
        p = (self.kernel - 1) // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=[(p, p), (p, p)],
                    feature_group_count=self.groups, use_bias=False,
                    name="conv", dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn", dtype=self.dtype)(x)
        return nn.relu6(x) if self.act else x


# ----------------------------------------------------------------------
# ResNet-34 (torchvision BasicBlock layout)
# ----------------------------------------------------------------------

class BasicBlock(nn.Module):
    features: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        h = nn.Conv(self.features, (3, 3), strides=(self.stride,) * 2,
                    padding=[(1, 1), (1, 1)], use_bias=False, name="conv1",
                    dtype=self.dtype)(x)
        h = nn.BatchNorm(use_running_average=not train, name="bn1",
                         epsilon=1e-5, dtype=self.dtype)(h)
        h = nn.relu(h)
        h = nn.Conv(self.features, (3, 3), padding=[(1, 1), (1, 1)],
                    use_bias=False, name="conv2", dtype=self.dtype)(h)
        h = nn.BatchNorm(use_running_average=not train, name="bn2",
                         epsilon=1e-5, dtype=self.dtype)(h)
        if self.stride != 1 or x.shape[-1] != self.features:
            identity = nn.Conv(self.features, (1, 1),
                               strides=(self.stride,) * 2, use_bias=False,
                               name="downsample_conv", dtype=self.dtype)(x)
            identity = nn.BatchNorm(use_running_average=not train,
                                    name="downsample_bn", epsilon=1e-5,
                                    dtype=self.dtype)(identity)
        return nn.relu(h + identity)


class ResNet34(nn.Module):
    """torchvision resnet34 feature tower (fc replaced by callers)."""

    dtype: Any = jnp.float32
    stage_sizes: Sequence[int] = (3, 4, 6, 3)

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, name="conv1", dtype=self.dtype)(x)
        h = nn.BatchNorm(use_running_average=not train, name="bn1",
                         epsilon=1e-5, dtype=self.dtype)(h)
        h = nn.relu(h)
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        for stage, (n, feats) in enumerate(zip(self.stage_sizes,
                                               (64, 128, 256, 512))):
            for i in range(n):
                stride = 2 if (i == 0 and stage > 0) else 1
                h = BasicBlock(feats, stride, dtype=self.dtype,
                               name=f"layer{stage + 1}_{i}")(h, train)
        return jnp.mean(h, axis=(1, 2))  # adaptive avgpool(1)


# ----------------------------------------------------------------------
# MobileNetV2 (torchvision layout)
# ----------------------------------------------------------------------

class InvertedResidual(nn.Module):
    features: int
    stride: int
    expand: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        hidden = in_ch * self.expand
        h = x
        if self.expand != 1:
            h = ConvBN(hidden, kernel=1, name="expand",
                       dtype=self.dtype)(h, train)
        h = ConvBN(hidden, kernel=3, stride=self.stride, groups=hidden,
                   name="depthwise", dtype=self.dtype)(h, train)
        h = ConvBN(self.features, kernel=1, act=False, name="project",
                   dtype=self.dtype)(h, train)
        if self.stride == 1 and in_ch == self.features:
            h = h + x
        return h


# (expand, out_channels, repeats, stride) — MobileNetV2 paper Table 2
_MBV2_PLAN = ((1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
              (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1))


class MobileNetV2(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, return_tap: int = -1):
        """return_tap >= 0: also return that block's output map (the
        legacy feature-tap APRs read torchvision features[17] == block 16,
        reference feature/model.py:56-63)."""
        h = ConvBN(32, kernel=3, stride=2, name="stem",
                   dtype=self.dtype)(x, train)
        idx = 0
        tap = None
        for expand, out, reps, stride in _MBV2_PLAN:
            for i in range(reps):
                h = InvertedResidual(out, stride if i == 0 else 1, expand,
                                     dtype=self.dtype,
                                     name=f"block_{idx}")(h, train)
                if idx == return_tap:
                    tap = h
                idx += 1
        h = ConvBN(1280, kernel=1, name="head", dtype=self.dtype)(h, train)
        pooled = jnp.mean(h, axis=(1, 2))
        if return_tap >= 0:
            return pooled, tap
        return pooled


# ----------------------------------------------------------------------
# EfficientNet (B0/B3) — lukemelas layout (pose_model.py:226-244)
# ----------------------------------------------------------------------

def _round_filters(f: int, width: float) -> int:
    f *= width
    new = max(8, int(f + 4) // 8 * 8)
    if new < 0.9 * f:
        new += 8
    return int(new)


def _round_repeats(r: int, depth: float) -> int:
    return int(math.ceil(depth * r))


class MBConv(nn.Module):
    features: int
    kernel: int
    stride: int
    expand: int
    se_ratio: float = 0.25
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        hidden = in_ch * self.expand
        h = x
        if self.expand != 1:
            h = nn.Conv(hidden, (1, 1), use_bias=False, name="expand_conv",
                        dtype=self.dtype)(h)
            h = nn.BatchNorm(use_running_average=not train, name="bn0",
                             epsilon=1e-3, dtype=self.dtype)(h)
            h = nn.silu(h)
        h = nn.Conv(hidden, (self.kernel,) * 2, strides=(self.stride,) * 2,
                    padding="SAME", feature_group_count=hidden,
                    use_bias=False, name="depthwise_conv", dtype=self.dtype)(h)
        h = nn.BatchNorm(use_running_average=not train, name="bn1",
                         epsilon=1e-3, dtype=self.dtype)(h)
        h = nn.silu(h)
        # squeeze-excite
        se_ch = max(1, int(in_ch * self.se_ratio))
        s = jnp.mean(h, axis=(1, 2), keepdims=True)
        s = nn.Conv(se_ch, (1, 1), name="se_reduce", dtype=self.dtype)(s)
        s = nn.silu(s)
        s = nn.Conv(hidden, (1, 1), name="se_expand", dtype=self.dtype)(s)
        h = h * nn.sigmoid(s)
        h = nn.Conv(self.features, (1, 1), use_bias=False,
                    name="project_conv", dtype=self.dtype)(h)
        h = nn.BatchNorm(use_running_average=not train, name="bn2",
                         epsilon=1e-3, dtype=self.dtype)(h)
        if self.stride == 1 and in_ch == self.features:
            h = h + x
        return h


# (expand, channels, repeats, stride, kernel) — EfficientNet-B0 base plan
_EFFNET_PLAN = ((1, 16, 1, 1, 3), (6, 24, 2, 2, 3), (6, 40, 2, 2, 5),
                (6, 80, 3, 2, 3), (6, 112, 3, 1, 5), (6, 192, 4, 2, 5),
                (6, 320, 1, 1, 3))

EFFNET_SCALING = {"b0": (1.0, 1.0), "b3": (1.2, 1.4)}  # (width, depth)


class EfficientNet(nn.Module):
    """extract_features tower; B0 head 1280ch, B3 head 1536ch."""

    variant: str = "b0"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, return_endpoints: bool = False):
        width, depth = EFFNET_SCALING[self.variant]
        h = nn.Conv(_round_filters(32, width), (3, 3), strides=(2, 2),
                    padding="SAME", use_bias=False, name="stem_conv",
                    dtype=self.dtype)(x)
        h = nn.BatchNorm(use_running_average=not train, name="stem_bn",
                         epsilon=1e-3, dtype=self.dtype)(h)
        h = nn.silu(h)
        # endpoints follow the lukemelas extract_endpoints rule: the map
        # recorded as reduction_i is the activation JUST BEFORE the i-th
        # post-stem downsampling (B0: reduction_3 = 40ch, reduction_4 =
        # 112ch — the taps MsTransformer uses, backbone.py:19)
        endpoints = {}
        idx = 0
        red = 1
        for expand, ch, reps, stride, kernel in _EFFNET_PLAN:
            ch = _round_filters(ch, width)
            for i in range(_round_repeats(reps, depth)):
                s = stride if i == 0 else 1
                if s > 1:
                    endpoints[f"reduction_{red}"] = h
                    red += 1
                h = MBConv(ch, kernel, s, expand,
                           dtype=self.dtype, name=f"block_{idx}")(h, train)
                idx += 1
        head_ch = _round_filters(1280, width)
        h = nn.Conv(head_ch, (1, 1), use_bias=False, name="head_conv",
                    dtype=self.dtype)(h)
        h = nn.BatchNorm(use_running_average=not train, name="head_bn",
                         epsilon=1e-3, dtype=self.dtype)(h)
        h = nn.silu(h)
        if return_endpoints:
            endpoints[f"reduction_{red}"] = h
            return h, endpoints
        return jnp.mean(h, axis=(1, 2))
