"""APR model zoo — the alternate pose regressors behind
``--PoseEstimatorType`` (reference script/dm/pose_model.py:226-380).

Every model maps an ImageNet-normalised RGB image to a pose; outputs
follow the reference conventions:
  PoseNetV2 / EfficientNetB3 / PoseNetRes34 -> (B, 12) flattened 3x4
  PoseNetMapNetStyle -> (B, 6) [xyz, logq]; MapNet wrapper converts to
  (B, 12) via the quaternion exp map (pose_model.py:335-380).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from nefes_tpu.features.backbones import EfficientNet, MobileNetV2, ResNet34
from nefes_tpu.geometry.se3 import quat_to_rotmat

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def _normalize(x):
    mean = jnp.asarray(IMAGENET_MEAN, x.dtype)
    std = jnp.asarray(IMAGENET_STD, x.dtype)
    return (x - mean) / std


class PoseNetV2(nn.Module):
    """MobileNetV2 backbone + fc_pose(1280 -> 12) (pose_model.py:247-260)."""

    feat_dim: int = 12
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        g = MobileNetV2(dtype=self.dtype, name="backbone")(_normalize(x),
                                                           train)
        return nn.Dense(self.feat_dim, name="fc_pose")(g)


class EfficientNetB3APR(nn.Module):
    """EfficientNet-B3 backbone + fc_pose(1536 -> 12)
    (pose_model.py:226-244)."""

    feat_dim: int = 12
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        g = EfficientNet(variant="b3", dtype=self.dtype,
                         name="backbone")(_normalize(x), train)
        return nn.Dense(self.feat_dim, name="fc_pose")(g)


class PoseNetRes34(nn.Module):
    """ResNet34 -> fc(512 -> 2048) -> relu [-> dropout] -> fc_pose(12)
    (pose_model.py:263-294; droprate 0 in reported results)."""

    feat_dim: int = 2048
    droprate: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        g = ResNet34(dtype=self.dtype, name="backbone")(_normalize(x), train)
        g = nn.Dense(self.feat_dim, name="fc")(g)
        g = nn.relu(g)
        if self.droprate > 0 and train:
            g = nn.Dropout(self.droprate, deterministic=not train)(g)
        return nn.Dense(12, name="fc_pose")(g)


class PoseNetV2Feat(nn.Module):
    """Legacy feature-tap PoseNetV2 (reference feature/model.py:10-70):
    pose head + the torchvision features[17]-block map for DFM training.

    Returns (feat_levels, pose): feat_levels = [(S, B, h, w, C)] with
    S=1 single-stream or S=2 target/render siamese split (the
    _aggregate_feature2 layout, NHWC here)."""

    feat_dim: int = 12
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, return_feature: bool = True,
                 single_stream: bool = True):
        g, tap = MobileNetV2(dtype=self.dtype, name="backbone")(
            _normalize(x), train, return_tap=16)  # features[17] == block 16
        pose = nn.Dense(self.feat_dim, name="fc_pose")(g)
        if not return_feature:
            return [], pose
        if single_stream:
            feats = tap[None]
        else:
            b = tap.shape[0] // 2
            feats = jnp.stack([tap[:b], tap[b:]])
        return [feats], pose


class EfficientNetB3Feat(nn.Module):
    """Legacy feature-tap EfficientNet-B3 APR (feature/model.py:72-126):
    feature_block selects a reduction endpoint (6 = head output)."""

    feat_dim: int = 12
    feature_block: int = 6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, return_feature: bool = True,
                 single_stream: bool = True):
        head, endpoints = EfficientNet(variant="b3", dtype=self.dtype,
                                       name="backbone")(
            _normalize(x), train, return_endpoints=True)
        fe = head if self.feature_block == 6 else \
            endpoints[f"reduction_{self.feature_block}"]
        pose = nn.Dense(self.feat_dim, name="fc_pose")(
            jnp.mean(head, axis=(1, 2)))
        if not return_feature:
            return [], pose
        if single_stream:
            feats = fe[None]
        else:
            b = fe.shape[0] // 2
            feats = jnp.stack([fe[:b], fe[b:]])
        return [feats], pose


class PoseNetMapNetStyle(nn.Module):
    """MapNet-paper PoseNet: ResNet34 -> fc(2048) -> {fc_xyz(3),
    fc_wpqr(3 logq)} (pose_model.py:297-333)."""

    feat_dim: int = 2048
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        g = ResNet34(dtype=self.dtype, name="backbone")(_normalize(x), train)
        g = nn.relu(nn.Dense(self.feat_dim, name="fc")(g))
        xyz = nn.Dense(3, name="fc_xyz")(g)
        wpqr = nn.Dense(3, name="fc_wpqr")(g)
        return jnp.concatenate([xyz, wpqr], axis=-1)


def qexp(logq: jnp.ndarray) -> jnp.ndarray:
    """Quaternion exp map (N, 3) logq -> (N, 4) wxyz
    (MapNet.qexp, pose_model.py:372-380: cos(|q|), sinc(|q|/pi)·q)."""
    n = jnp.sqrt(jnp.sum(logq ** 2, axis=-1, keepdims=True) + 1e-24)
    return jnp.concatenate([jnp.cos(n), jnp.sinc(n / jnp.pi) * logq], -1)


def mapnet_output_to_pose12(out6: jnp.ndarray) -> jnp.ndarray:
    """(N, 6) [xyz, logq] -> (N, 12) flattened 3x4 SE(3)
    (MapNet.forward, pose_model.py:349-370)."""
    q = qexp(out6[:, 3:])
    R = quat_to_rotmat(q)
    pose = jnp.concatenate([R, out6[:, :3, None]], axis=-1)
    return pose.reshape(-1, 12)


class MapNet(nn.Module):
    """MapNet wrapper: image -> logq PoseNet -> SE(3) matrix.

    Design note: in this framework EVERY model takes [0,1] RGB and
    ImageNet-normalises internally (the reference splits normalisation
    between dataloader transforms and model forwards; one convention here).
    The inner PoseNet already normalises, so no second normalisation.
    """

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        out6 = PoseNetMapNetStyle(dtype=self.dtype, name="mapnet")(x, train)
        return mapnet_output_to_pose12(out6)
