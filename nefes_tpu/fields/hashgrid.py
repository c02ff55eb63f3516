"""Instant-NGP style hash-grid field — the tcnn-variant (``--tcnn``).

Reference: script/models/nerfh_tcnn.py:55-175 (tcnn HashGrid L=16, F=2,
T=2^19, base 16 -> 2048; fused sigma net 2x64 -> 1+W; SH degree-4 dir
encoding; color net 2x64; transient net; [-bound, bound] -> [0,1] input
norm at :151-156) and the multiresolution hash encoding of Müller et al.
2022 (instant-ngp, Eq. 3-4).

TPU design: the hash-table gather is a ``jnp.take`` per level (8 corner
gathers, trilinearly blended). Levels are unrolled statically (16 gathers
of (N, 8) indices each); XLA batches them into efficient dynamic-gathers.
Like tcnn, levels coarse enough to fit densely ((res+1)^3 <= T) index the
table directly, so converted tcnn checkpoints line up.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from nefes_tpu.fields.activation import trunc_exp

# instant-ngp spatial-hash primes (Eq. 4)
_PRIMES = (1, 2654435761, 805459861)


def spherical_harmonics_deg4(d: jnp.ndarray) -> jnp.ndarray:
    """Real SH basis up to degree 4 (16 coefficients) of unit dirs
    (..., 3) — replaces tcnn's SphericalHarmonics encoding
    (nerfh_tcnn.py:97-103). Matches the tcnn/instant-ngp basis ordering."""
    x, y, z = d[..., 0], d[..., 1], d[..., 2]
    xx, yy, zz = x * x, y * y, z * z
    xy, yz, xz = x * y, y * z, x * z
    return jnp.stack([
        jnp.full_like(x, 0.28209479177387814),
        -0.48860251190291987 * y,
        0.48860251190291987 * z,
        -0.48860251190291987 * x,
        1.0925484305920792 * xy,
        -1.0925484305920792 * yz,
        0.94617469575755997 * zz - 0.31539156525251999,
        -1.0925484305920792 * xz,
        0.54627421529603959 * (xx - yy),
        0.59004358992664352 * y * (-3.0 * xx + yy),
        2.8906114426405538 * xy * z,
        0.45704579946446572 * y * (1.0 - 5.0 * zz),
        0.3731763325901154 * z * (5.0 * zz - 3.0),
        0.45704579946446572 * x * (1.0 - 5.0 * zz),
        1.4453057213202769 * z * (xx - yy),
        0.59004358992664352 * x * (-xx + 3.0 * yy),
    ], axis=-1)


class HashGridEncoding(nn.Module):
    """Multiresolution hash encoding: (..., 3) in [0,1] -> (..., L·F).

    tcnn_exact=True reproduces tiny-cuda-nn's GridEncoding bit-layout so
    converted tcnn checkpoints line up: per-level scale s_l = b^l·base - 1
    with resolution ceil(s_l)+1, the +0.5 half-cell sample offset, dense
    levels indexed x-fastest (stride order), and table rows 8-aligned.
    The spatial hash (instant-ngp Eq. 4 primes) is shared by both modes.
    """

    n_levels: int = 16            # hash_level (options.py:49)
    features_per_level: int = 2
    log2_table_size: int = 19
    base_resolution: int = 16
    max_resolution: int = 2048
    tcnn_exact: bool = False
    dtype: Any = jnp.float32

    def setup(self):
        L, T = self.n_levels, 2 ** self.log2_table_size
        growth = np.exp(np.log(self.max_resolution / self.base_resolution)
                        / (L - 1))
        if self.tcnn_exact:
            scales = [growth ** l * self.base_resolution - 1.0
                      for l in range(L)]
            self.resolutions = tuple(int(np.ceil(s)) + 1 for s in scales)
            self.scales = tuple(scales)
            self.table_sizes = tuple(
                int(-(-min(r ** 3, T) // 8) * 8)      # next multiple of 8
                for r in self.resolutions)
        else:
            self.resolutions = tuple(
                int(np.floor(self.base_resolution * growth ** l))
                for l in range(L))
            self.scales = tuple(float(r) for r in self.resolutions)
            # per-level table rows: dense when the full grid fits
            self.table_sizes = tuple(min((r + 1) ** 3, T)
                                     for r in self.resolutions)
        self.tables = [
            self.param(f"level_{l}", nn.initializers.uniform(2e-4),
                       (self.table_sizes[l], self.features_per_level))
            for l in range(L)
        ]

    def _index(self, coords: jnp.ndarray, level: int) -> jnp.ndarray:
        """Integer corner coords (..., 3) -> table row indices."""
        res = self.resolutions[level]
        size = self.table_sizes[level]
        if self.tcnn_exact and size >= res ** 3:   # dense, x-fastest
            return (coords[..., 2] * res + coords[..., 1]) * res \
                + coords[..., 0]
        if not self.tcnn_exact and size == (res + 1) ** 3:  # dense level
            return (coords[..., 0] * (res + 1) + coords[..., 1]) * (res + 1) \
                + coords[..., 2]
        p1 = jnp.uint32(_PRIMES[1])
        p2 = jnp.uint32(_PRIMES[2])
        h = coords[..., 0]
        h = jnp.bitwise_xor(h, coords[..., 1] * p1)
        h = jnp.bitwise_xor(h, coords[..., 2] * p2)
        return jnp.remainder(h, jnp.uint32(size)).astype(jnp.int32)

    def __call__(self, x01: jnp.ndarray) -> jnp.ndarray:
        feats = []
        x01 = jnp.clip(x01, 0.0, 1.0)
        for l in range(self.n_levels):
            res = self.resolutions[l]
            if self.tcnn_exact:
                # tcnn: pos = x*scale + 0.5; corners floor(pos)+{0,1}
                # within a res-wide grid
                xs = x01 * self.scales[l] + 0.5
                x0 = jnp.minimum(jnp.floor(xs), res - 2).astype(jnp.uint32)
                frac = (xs - x0).astype(self.dtype)
                acc = 0.0
                for corner in range(8):
                    offs = jnp.asarray([(corner >> 2) & 1,
                                        (corner >> 1) & 1,
                                        corner & 1], jnp.uint32)
                    idx = self._index(x0 + offs, l)
                    w = jnp.prod(jnp.where(offs.astype(bool), frac,
                                           1.0 - frac), axis=-1)
                    acc = acc + w[..., None] * jnp.take(
                        self.tables[l].astype(self.dtype), idx, axis=0)
                feats.append(acc)
                continue
            xs = x01 * res
            # clamp the base cell to res-1 so the +1 corners stay in the
            # (res+1)-wide dense tables at x01 == 1.0 exactly — OOB rows
            # read as NaN (jnp.take fill mode) and 0*NaN poisons the lerp
            x0 = jnp.minimum(jnp.floor(xs), res - 1).astype(jnp.uint32)
            frac = (xs - x0).astype(self.dtype)          # (..., 3)
            acc = 0.0
            for corner in range(8):
                offs = jnp.asarray([(corner >> 2) & 1, (corner >> 1) & 1,
                                    corner & 1], jnp.uint32)
                idx = self._index(x0 + offs, l)
                w = jnp.prod(jnp.where(offs.astype(bool), frac, 1.0 - frac),
                             axis=-1)
                acc = acc + w[..., None] * jnp.take(
                    self.tables[l].astype(self.dtype), idx, axis=0)
            feats.append(acc)
        return jnp.concatenate(feats, axis=-1)


class NeRFHTcnn(nn.Module):
    """Hash-grid NeRF-W field (reference NeRF_TCNN, nerfh_tcnn.py).

    sigma net: hash(32) -> 64 -> 1+15 (trunc-exp-free: relu sigma as the
    reference's mod1, :124-149 use ReLU heads); color net: geo15 + SH16 +
    appearance(5) -> 64x2 -> sigmoid rgb; transient: geo15 + SH16 +
    t-latent(2) -> 64x3 -> [rgb sigmoid, sigma relu, beta relu].
    """

    bound: float = 25.0           # options.py:58
    geo_features: int = 15
    hidden: int = 64
    encode_transient: bool = True
    in_channels_a: int = 5
    in_channels_t: int = 2
    hash_level: int = 16
    tcnn_exact: bool = False      # bit-layout parity for converted ckpts
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xyz: jnp.ndarray, viewdir: jnp.ndarray | None = None,
                 a_latent: jnp.ndarray | None = None,
                 t_latent: jnp.ndarray | None = None,
                 sigma_only: bool = False, output_transient: bool = False):
        x01 = (xyz + self.bound) / (2 * self.bound)  # nerfh_tcnn.py:151-156
        enc = HashGridEncoding(n_levels=self.hash_level, dtype=self.dtype,
                               tcnn_exact=self.tcnn_exact,
                               name="encoder")(x01)
        h = nn.relu(nn.Dense(self.hidden, name="sigma_hidden",
                             dtype=self.dtype)(enc))
        h = nn.Dense(1 + self.geo_features, name="sigma_out",
                     dtype=self.dtype)(h)
        sigma = nn.relu(h[..., 0]).astype(jnp.float32)
        out = {"static_sigma": sigma}
        if sigma_only:
            return out
        geo = h[..., 1:]

        sh = spherical_harmonics_deg4(viewdir).astype(self.dtype)
        parts = [geo, sh]
        if a_latent is not None:
            parts.append(jnp.broadcast_to(
                a_latent.astype(self.dtype),
                geo.shape[:-1] + (a_latent.shape[-1],)))
        c = jnp.concatenate(parts, axis=-1)
        c = nn.relu(nn.Dense(self.hidden, name="color_hidden0",
                             dtype=self.dtype)(c))
        c = nn.relu(nn.Dense(self.hidden, name="color_hidden1",
                             dtype=self.dtype)(c))
        rgb = nn.sigmoid(nn.Dense(3, name="color_out", dtype=self.dtype)(c))
        out["static_rgb"] = rgb.astype(jnp.float32)
        out["static_feat"] = jnp.zeros(rgb.shape[:-1] + (0,), jnp.float32)

        if not (self.encode_transient and output_transient):
            return out
        tparts = [geo, sh]
        if t_latent is not None:
            tparts.append(jnp.broadcast_to(
                t_latent.astype(self.dtype),
                geo.shape[:-1] + (t_latent.shape[-1],)))
        t = jnp.concatenate(tparts, axis=-1)
        for i in range(3):
            t = nn.relu(nn.Dense(self.hidden, name=f"transient_hidden{i}",
                                 dtype=self.dtype)(t))
        t5 = nn.Dense(5, name="transient_out", dtype=self.dtype)(t)
        out["transient_rgb"] = nn.sigmoid(t5[..., :3]).astype(jnp.float32)
        out["transient_sigma"] = nn.relu(t5[..., 3]).astype(jnp.float32)
        out["transient_beta"] = nn.relu(t5[..., 4]).astype(jnp.float32)
        return out
