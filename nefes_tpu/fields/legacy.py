"""Legacy/alternative field models — capability parity with the flag-
selectable models the paper configs don't use (SURVEY.md §2.4 last row).

  PlainNeRF  — the original NeRF MLP (reference script/models/nerf.py:
               D=8, W=256, skip at 4, sigma + view-dependent sigmoid RGB).
  NeRFW      — NeRF-Hist without the feature head (reference
               script/models/nerfh.py:369-520): coarse tower rgb-only,
               fine tower adds appearance-conditioned color and transient
               heads (appearance/transient latents from the luminance
               histogram or an image-index embedding).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


class PlainNeRF(nn.Module):
    """Original NeRF MLP (reference nerf.py)."""

    depth: int = 8
    width: int = 256
    skips: tuple[int, ...] = (4,)
    in_channels_xyz: int = 63
    in_channels_dir: int = 27
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xyz_emb, dir_emb=None, sigma_only: bool = False,
                 output_transient: bool = False):
        dense = lambda w, name: nn.Dense(w, name=name, dtype=self.dtype)
        x = xyz_emb.astype(self.dtype)
        h = x
        for i in range(self.depth):
            if i in self.skips:
                h = jnp.concatenate([x, h], axis=-1)
            h = nn.relu(dense(self.width, f"layer_{i + 1}")(h))
        sigma = nn.relu(dense(1, "sigma")(h))[..., 0]
        out = {"static_sigma": sigma.astype(jnp.float32)}
        if sigma_only:
            return out
        feat = dense(self.width, "feature")(h)
        d = jnp.concatenate([feat, dir_emb.astype(self.dtype)], axis=-1)
        d = nn.relu(dense(self.width // 2, "dir_branch")(d))
        rgb = nn.sigmoid(dense(3, "rgb")(d))
        out["static_rgb"] = rgb.astype(jnp.float32)
        # zero feature head keeps the compositor interface uniform
        out["static_feat"] = jnp.zeros(rgb.shape[:-1] + (0,), jnp.float32)
        return out


class NeRFW(nn.Module):
    """NeRF-W / NeRF-Hist tower without the 128-D feature head
    (reference nerfh.py:369-520). ``a_latent``/``t_latent`` are the
    appearance/transient embeddings (histogram-derived in NeRF-Hist)."""

    typ: str = "coarse"
    depth: int = 8
    width: int = 128
    skips: tuple[int, ...] = (4,)
    in_channels_xyz: int = 63
    in_channels_dir: int = 27
    in_channels_a: int = 50   # options.py:72
    in_channels_t: int = 20   # options.py:73
    beta_min: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xyz_emb, dir_emb=None, a_latent=None, t_latent=None,
                 sigma_only: bool = False, output_transient: bool = True):
        dense = lambda w, name: nn.Dense(w, name=name, dtype=self.dtype)
        x = xyz_emb.astype(self.dtype)
        h = x
        for i in range(self.depth):
            if i in self.skips:
                h = jnp.concatenate([x, h], axis=-1)
            h = nn.relu(dense(self.width, f"xyz_encoding_{i + 1}")(h))
        sigma = nn.softplus(dense(1, "static_sigma")(h))[..., 0]
        out = {"static_sigma": sigma.astype(jnp.float32)}
        if sigma_only:
            return out

        final = dense(self.width, "xyz_encoding_final")(h)
        parts = [final, dir_emb.astype(self.dtype)]
        if self.typ == "fine" and a_latent is not None:
            parts.append(jnp.broadcast_to(
                a_latent.astype(self.dtype),
                final.shape[:-1] + (a_latent.shape[-1],)))
        d = jnp.concatenate(parts, axis=-1)
        d = nn.relu(dense(self.width // 2, "dir_encoding")(d))
        out["static_rgb"] = nn.sigmoid(
            dense(3, "static_rgb")(d)).astype(jnp.float32)
        out["static_feat"] = jnp.zeros(d.shape[:-1] + (0,), jnp.float32)

        if not (self.typ == "fine" and output_transient):
            return out
        tparts = [final, dir_emb.astype(self.dtype)]
        if t_latent is not None:
            tparts.append(jnp.broadcast_to(
                t_latent.astype(self.dtype),
                final.shape[:-1] + (t_latent.shape[-1],)))
        t = jnp.concatenate(tparts, axis=-1)
        for i in range(3):
            t = nn.relu(dense(self.width // 2, f"transient_encoding_{i + 1}")(t))
        out["transient_sigma"] = nn.softplus(
            dense(1, "transient_sigma")(t))[..., 0].astype(jnp.float32)
        out["transient_rgb"] = nn.sigmoid(
            dense(3, "transient_rgb")(t)).astype(jnp.float32)
        out["transient_beta"] = nn.softplus(
            dense(1, "transient_beta")(t))[..., 0].astype(jnp.float32)
        return out
