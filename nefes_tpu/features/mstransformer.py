"""MS-Transformer APR — multi-scene TransPoseNet in flax.

Reference: script/mstransformer/ (transposenet.py, transformer.py,
transformer_encoder.py, pencoder.py, backbone.py — DETR-derived). Config
values from the official repo (transposenet.py:56-66): hidden 256, 4
heads, ffn 256, 6+6 encoder/decoder layers per branch, pre-norm, GELU,
learned row/col position embeddings, EfficientNet-B0 backbone tapped at
reduction_4 (112ch, translation branch) and reduction_3 (40ch, rotation
branch).

TPU-first deltas from the torch original:
  * per-scene regressor-head selection is a gather over stacked head
    params (vmapped Dense) instead of a python loop over batch elements
    (transposenet.py:176-180) — one launch, static shapes.
  * images are resized/cropped with jnp ops instead of PIL transforms
    inside forward (transposenet.py:96-101).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from nefes_tpu.features.backbones import EfficientNet
from nefes_tpu.geometry.se3 import quat_to_rotmat
from nefes_tpu.utils.image import resize_bilinear

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def preprocess_mstransformer(img: jnp.ndarray) -> jnp.ndarray:
    """Resize shorter side to 256, center-crop 224, ImageNet-normalise
    (the torchvision transform stack at transposenet.py:96-101).
    img: (B, H, W, 3) in [0,1]."""
    B, H, W, _ = img.shape
    if H < W:
        nh, nw = 256, max(1, round(W * 256 / H))
    else:
        nh, nw = max(1, round(H * 256 / W)), 256
    img = resize_bilinear(img, nh, nw)
    top, left = (nh - 224) // 2, (nw - 224) // 2
    img = img[:, top:top + 224, left:left + 224]
    mean = jnp.asarray(IMAGENET_MEAN, img.dtype)
    std = jnp.asarray(IMAGENET_STD, img.dtype)
    return (img - mean) / std


class MHA(nn.Module):
    d_model: int
    nhead: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, q, k, v):
        return nn.MultiHeadDotProductAttention(
            num_heads=self.nhead, qkv_features=self.d_model,
            out_features=self.d_model, dtype=self.dtype,
            name="attn")(inputs_q=q, inputs_k=k, inputs_v=v)


class EncoderLayer(nn.Module):
    """Pre-norm DETR encoder layer (transformer_encoder.py)."""

    d_model: int = 256
    nhead: int = 4
    ffn: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, src, pos):
        h = nn.LayerNorm(name="norm1")(src)
        qk = h + pos
        src = src + MHA(self.d_model, self.nhead, self.dtype,
                        name="self_attn")(qk, qk, h)
        h = nn.LayerNorm(name="norm2")(src)
        h = nn.Dense(self.ffn, name="linear1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.d_model, name="linear2")(h)
        return src + h


class DecoderLayer(nn.Module):
    """Pre-norm DETR decoder layer."""

    d_model: int = 256
    nhead: int = 4
    ffn: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tgt, memory, pos, query_pos):
        h = nn.LayerNorm(name="norm1")(tgt)
        qk = h + query_pos
        tgt = tgt + MHA(self.d_model, self.nhead, self.dtype,
                        name="self_attn")(qk, qk, h)
        h = nn.LayerNorm(name="norm2")(tgt)
        tgt = tgt + MHA(self.d_model, self.nhead, self.dtype,
                        name="cross_attn")(h + query_pos, memory + pos,
                                           memory)
        h = nn.LayerNorm(name="norm3")(tgt)
        h = nn.Dense(self.ffn, name="linear1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.d_model, name="linear2")(h)
        return tgt + h


class TransformerBranch(nn.Module):
    """Encoder+decoder stack of one branch (t or rot)."""

    d_model: int = 256
    nhead: int = 4
    ffn: int = 256
    layers: int = 6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, src, pos, query):
        """src/pos: (B, S, C); query: (Q, C). Returns (B, Q, C)."""
        h = src
        for i in range(self.layers):
            h = EncoderLayer(self.d_model, self.nhead, self.ffn, self.dtype,
                             name=f"enc_{i}")(h, pos)
        memory = nn.LayerNorm(name="enc_norm")(h)
        B = src.shape[0]
        q = jnp.broadcast_to(query[None], (B,) + query.shape)
        tgt = jnp.zeros_like(q)
        for i in range(self.layers):
            tgt = DecoderLayer(self.d_model, self.nhead, self.ffn,
                               self.dtype, name=f"dec_{i}")(tgt, memory,
                                                            pos, q)
        return nn.LayerNorm(name="dec_norm")(tgt)


class LearnedPosEmbed2D(nn.Module):
    """DETR learned row/col position embedding (pencoder.py:148-173):
    channels = [col_embed(x) ⊕ row_embed(y)], each d_model//2."""

    d_model: int = 256
    max_hw: int = 50

    @nn.compact
    def __call__(self, h: int, w: int):
        half = self.d_model // 2
        row = self.param("row_embed", nn.initializers.uniform(1.0),
                         (self.max_hw, half))
        col = self.param("col_embed", nn.initializers.uniform(1.0),
                         (self.max_hw, half))
        x_emb = jnp.broadcast_to(col[None, :w], (h, w, half))
        y_emb = jnp.broadcast_to(row[:h, None], (h, w, half))
        return jnp.concatenate([x_emb, y_emb], axis=-1)  # (h, w, d_model)


class PoseRegressor(nn.Module):
    """decoder_dim -> 1024 -> gelu -> out (transposenet.py:17-49)."""

    out_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.gelu(nn.Dense(1024, name="fc_h", dtype=self.dtype)(x),
                    approximate=False)
        return nn.Dense(self.out_dim, name="fc_o")(h)


class MultiScenePoseRegressor(nn.Module):
    """num_scenes PoseRegressor heads; output selected by scene index via
    gather (replaces the per-sample python loop, transposenet.py:176-180)."""

    num_scenes: int
    out_dim: int
    d_model: int = 256

    @nn.compact
    def __call__(self, x: jnp.ndarray, scene_idx: jnp.ndarray):
        """x: (B, C); scene_idx: (B,) int. Returns (B, out_dim)."""
        w_h = self.param("fc_h_kernel", nn.initializers.xavier_uniform(),
                         (self.num_scenes, self.d_model, 1024))
        b_h = self.param("fc_h_bias", nn.initializers.zeros,
                         (self.num_scenes, 1024))
        w_o = self.param("fc_o_kernel", nn.initializers.xavier_uniform(),
                         (self.num_scenes, 1024, self.out_dim))
        b_o = self.param("fc_o_bias", nn.initializers.zeros,
                         (self.num_scenes, self.out_dim))
        wh, bh = w_h[scene_idx], b_h[scene_idx]          # (B, C, 1024)
        wo, bo = w_o[scene_idx], b_o[scene_idx]
        h = nn.gelu(jnp.einsum("bc,bco->bo", x, wh) + bh,
                    approximate=False)
        return jnp.einsum("bc,bco->bo", h, wo) + bo


class MSTransPoseNet(nn.Module):
    """Multi-scene TransPoseNet (transposenet.py:52-201). Returns a dict
    {'pose' (B, 7) [xyz, quat wxyz], 'scene_log_distr' (B, S),
    'max_indices' (B,)}."""

    num_scenes: int = 7
    d_model: int = 256
    nhead: int = 4
    ffn: int = 256
    layers: int = 6
    single_head: bool = False  # EMS variant: one shared head
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, img: jnp.ndarray, train: bool = False):
        x = preprocess_mstransformer(img)
        _, endpoints = EfficientNet(variant="b0", dtype=self.dtype,
                                    name="backbone")(
            x, train, return_endpoints=True)
        src_t = endpoints["reduction_4"]    # (B, 14, 14, 112)
        src_rot = endpoints["reduction_3"]  # (B, 28, 28, 40)

        feats = {}
        for name, src in (("t", src_t), ("rot", src_rot)):
            proj = nn.Conv(self.d_model, (1, 1),
                           name=f"input_proj_{name}")(src)
            B, h, w, C = proj.shape
            pos = LearnedPosEmbed2D(self.d_model,
                                    name=f"pos_embed_{name}")(h, w)
            pos = jnp.broadcast_to(pos[None], (B, h, w, C))
            query = self.param(f"query_embed_{name}",
                               nn.initializers.normal(1.0),
                               (self.num_scenes, self.d_model))
            feats[name] = TransformerBranch(
                self.d_model, self.nhead, self.ffn, self.layers, self.dtype,
                name=f"transformer_{name}")(proj.reshape(B, h * w, C),
                                            pos.reshape(B, h * w, C), query)

        local_t, local_rot = feats["t"], feats["rot"]     # (B, S, C)
        scene_logits = nn.Dense(1, name="scene_embed")(
            jnp.concatenate([local_t, local_rot], axis=-1))[..., 0]
        scene_log_distr = nn.log_softmax(scene_logits, axis=-1)
        max_indices = jnp.argmax(scene_log_distr, axis=-1)

        take = lambda d: jnp.take_along_axis(
            d, max_indices[:, None, None], axis=1)[:, 0]
        global_t, global_rot = take(local_t), take(local_rot)

        if self.single_head:
            x_t = PoseRegressor(3, name="regressor_head_t")(global_t)
            x_rot = PoseRegressor(4, name="regressor_head_rot")(global_rot)
        else:
            x_t = MultiScenePoseRegressor(
                self.num_scenes, 3, self.d_model,
                name="regressor_head_t")(global_t, max_indices)
            x_rot = MultiScenePoseRegressor(
                self.num_scenes, 4, self.d_model,
                name="regressor_head_rot")(global_rot, max_indices)

        return {"pose": jnp.concatenate([x_t, x_rot], axis=-1),
                "scene_log_distr": scene_log_distr,
                "max_indices": max_indices}


def ems_pose_to_matrix(pose7: jnp.ndarray, dataset_type: str = "7Scenes",
                       pose_avg_stats=None) -> jnp.ndarray:
    """EMSTransPoseNet output head (transposenet.py:241-263): quat -> R,
    Cambridge gets the transpose + Cambridge2OpenGL conversion."""
    R = quat_to_rotmat(pose7[:, 3:])
    out = jnp.concatenate([R, pose7[:, :3, None]], axis=-1)  # (B, 3, 4)
    if dataset_type == "Cambridge":
        out = out.at[:, :3, :3].set(jnp.swapaxes(out[:, :3, :3], 1, 2))
        out = _cambridge_to_opengl_jnp(out, pose_avg_stats)
    return out


def _cambridge_to_opengl_jnp(pose: jnp.ndarray, pose_avg_stats) -> jnp.ndarray:
    """jnp twin of geometry.transforms.fix_coord_cambridge's center+rotate
    step applied to network outputs (transposenet.py:203-233)."""
    pose_avg_homo = jnp.eye(4).at[:3].set(jnp.asarray(pose_avg_stats))
    last = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 0.0, 1.0]),
                            (pose.shape[0], 1, 4))
    hom = jnp.concatenate([pose, last], axis=1)
    centered = jnp.linalg.inv(pose_avg_homo) @ hom
    rot180x = jnp.asarray([[1, 0, 0, 0], [0, -1, 0, 0],
                           [0, 0, -1, 0], [0, 0, 0, 1.0]])
    p = rot180x @ centered
    R = -p[:, :3, :3]
    R = R @ jnp.diag(jnp.asarray([-1.0, 1.0, 1.0]))
    return jnp.concatenate([R, p[:, :3, 3:4]], axis=-1)
