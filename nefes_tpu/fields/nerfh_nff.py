"""NeRFH-NFF — the NeFeS neural feature field, as flax modules.

Reference: script/models/nerfh_nff.py:421-626 (NeRFH_NFF), :356-418
(FusionNet), :511-522,605-626 (exposure-compensation MLP, which the
reference runs through tiny-cuda-nn's FullyFusedMLP — here a plain flax MLP
that XLA fuses on the MXU; a Pallas fused version lives in
nefes_tpu/kernels for the hot render path).

Design differences from the torch original (TPU-first, not a port):
  * The field returns a *dict of named heads* instead of a packed channel
    tensor sliced by magic offsets (nerfh_nff.py:45-50).
  * No netchunk python loop — callers vmap/lax.map over rays; one module
    application handles any leading batch shape.
  * Compute dtype is a module attribute (bf16 on TPU for the MXU), params
    stay f32.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

FEATURE_DIM = 128  # reference nerfh_nff.py:21
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


class SplitDense(nn.Module):
    """Dense over a conceptual concat [a, b] computed as two matmuls
    a @ K[:da] + b @ K[da:] + bias — same math and the SAME param tree as
    ``nn.Dense`` applied to the concat (kernel (da+db, out), bias (out,)),
    but without materializing the concatenated activation. On TPU the
    concat forces a lane-relayout copy of the (R, S, W) hidden state and
    its backward emits a slice + copy pair — ~50 ms of pure data movement
    per refinement frame at the 7-Scenes shape (PROFILE_r04 top-ops
    %split/%copy rows)."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        da, db = a.shape[-1], b.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (da + db, self.features), jnp.float32).astype(self.dtype)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32).astype(self.dtype)
        return (a.astype(self.dtype) @ kernel[:da]
                + b.astype(self.dtype) @ kernel[da:] + bias)


class NeRFHNFF(nn.Module):
    """Coarse or fine NeFeS field MLP.

    Heads (reference nerfh_nff.py:485-505):
      static_sigma (softplus), static_rgbfeat (3 RGB + feature_dim channels,
      linear — sigmoid applied later by the affine color transform), and for
      the fine model NeRF-W transient heads (rgb sigmoid / sigma softplus /
      beta softplus).
    """

    typ: str = "coarse"                 # 'coarse' | 'fine'
    depth: int = 8                      # netdepth (options.py:30)
    width: int = 128                    # netwidth (options.py:31)
    skips: tuple[int, ...] = (4,)
    in_channels_xyz: int = 63
    in_channels_dir: int = 27
    feature_dim: int = FEATURE_DIM
    encode_transient: bool = None       # default: fine only
    beta_min: float = 0.1
    dtype: Any = jnp.float32            # compute dtype (bf16 on TPU)
    # dtype of the big per-sample channel heads (static_rgb/static_feat/
    # transient_rgb). The (R, S, 128) feature head is the largest tensor
    # of a refinement iteration; keeping it in the compute dtype (instead
    # of casting up) halves its HBM traffic — the compositor contracts it
    # on the MXU with f32 accumulation (render/compositor.py:_contract).
    # Scalar heads (sigmas, beta) always return f32. None -> f32.
    head_dtype: Any = None

    @property
    def has_transient(self) -> bool:
        if self.encode_transient is None:
            return self.typ == "fine"
        return self.encode_transient

    @nn.compact
    def __call__(self, xyz_emb: jnp.ndarray, dir_emb: jnp.ndarray | None = None,
                 sigma_only: bool = False, output_transient: bool = True):
        """xyz_emb: (..., 63), dir_emb: (..., 27). Returns a dict of heads
        broadcast over the leading dims."""
        dense = lambda w, name: nn.Dense(w, name=name, dtype=self.dtype)
        x = xyz_emb.astype(self.dtype)
        h = x
        for i in range(self.depth):
            if i in self.skips:
                h = SplitDense(self.width, dtype=self.dtype,
                               name=f"xyz_encoding_{i + 1}")(x, h)
            else:
                h = dense(self.width, f"xyz_encoding_{i + 1}")(h)
            h = nn.relu(h)

        static_sigma = nn.softplus(dense(1, "static_sigma")(h))[..., 0]
        out = {"static_sigma": static_sigma.astype(jnp.float32)}
        if sigma_only:
            return out

        hd = self.head_dtype if self.head_dtype is not None else jnp.float32
        final = dense(self.width, "xyz_encoding_final")(h)
        de = dir_emb.astype(self.dtype)
        dir_enc = nn.relu(SplitDense(self.width // 2, dtype=self.dtype,
                                     name="dir_encoding")(final, de))
        rgbfeat = dense(3 + self.feature_dim, "static_rgb")(dir_enc)
        out["static_rgb"] = rgbfeat[..., :3].astype(hd)
        out["static_feat"] = rgbfeat[..., 3:].astype(hd)

        if not (self.has_transient and output_transient):
            return out

        t = nn.relu(SplitDense(self.width // 2, dtype=self.dtype,
                               name="transient_encoding_1")(final, de))
        for i in range(1, 3):
            t = nn.relu(dense(self.width // 2, f"transient_encoding_{i + 1}")(t))
        out["transient_sigma"] = nn.softplus(
            dense(1, "transient_sigma")(t))[..., 0].astype(jnp.float32)
        out["transient_rgb"] = nn.sigmoid(
            dense(3, "transient_rgb")(t)).astype(hd)
        out["transient_beta"] = nn.softplus(
            dense(1, "transient_beta")(t))[..., 0].astype(jnp.float32)
        return out


class ExposureMLP(nn.Module):
    """Luminance-histogram -> 3x3 affine color kernel + bias.

    Replaces the tcnn FullyFusedMLP at reference nerfh_nff.py:512-521
    (10 -> 32x3 hidden ReLU -> 12). Input is the rounded luminance histogram
    density (percent per bin, 10 bins).
    """

    hidden: int = 32
    layers: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, hist: jnp.ndarray) -> jnp.ndarray:
        h = hist.astype(self.dtype)
        for i in range(self.layers):
            h = nn.relu(nn.Dense(self.hidden, name=f"hidden_{i}", dtype=self.dtype)(h))
        return nn.Dense(12, name="out", dtype=self.dtype)(h).astype(jnp.float32)


def affine_color_transform(embedding12: jnp.ndarray, rgb: jnp.ndarray) -> jnp.ndarray:
    """Apply the exposure affine map: sigmoid(K·rgb + b).

    embedding12: (B, 12) exposure MLP output; rgb: (B, N, 3) raw (pre-
    sigmoid) colors. Matches reference nerfh_nff.py:605-626.
    """
    kernel = embedding12[..., :9].reshape(*embedding12.shape[:-1], 3, 3)
    bias = embedding12[..., 9:]
    out = jnp.einsum("...ij,...nj->...ni", kernel, rgb) + bias[..., None, :]
    return nn.sigmoid(out)


class FusionNet(nn.Module):
    """4-layer CNN fusing rendered RGB + rendered features -> refined
    feature map (reference nerfh_nff.py:356-418).

    Input NHWC (B, H, W, 3 + feature_dim); RGB channels are ImageNet-
    normalized first (nerfh_nff.py:408-410). BatchNorm after the last conv
    (the reference default; ``no_bn`` disables it).
    """

    feature_dim: int = FEATURE_DIM
    residual: bool = False              # use_fusion_res
    no_bn: bool = False                 # no_fusion_BN
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        mean = jnp.asarray(IMAGENET_MEAN, dtype=x.dtype)
        std = jnp.asarray(IMAGENET_STD, dtype=x.dtype)
        rgb = (x[..., :3] - mean) / std
        h = jnp.concatenate([rgb, x[..., 3:]], axis=-1).astype(self.dtype)
        conv = lambda f, k, name: nn.Conv(f, (k, k), padding="SAME", name=name,
                                          dtype=self.dtype)
        h = nn.relu(conv(64, 3, "conv0")(h))
        h = nn.relu(conv(64, 3, "conv1")(h))
        h = nn.relu(conv(64, 3, "conv2")(h))
        h = conv(self.feature_dim, 5, "conv3")(h)
        if not self.no_bn:
            h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, name="bn", dtype=self.dtype)(h)
        h = h.astype(jnp.float32)
        if self.residual:
            h = x[..., 3:] + h
        return h
