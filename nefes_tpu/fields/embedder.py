"""NeRF frequency (positional) encoding, plus the Nerfies windowed variant.

Replaces reference script/models/nerfh_nff.py:234-354 (Embedder /
get_embedder). Pure functions of static config — no per-call python loops
over frequency bands at trace time beyond building one constant table; the
embedding itself is a single broadcastd sin/cos over a (..., 3, F) tensor,
which XLA fuses into the consuming matmul.

Channel ORDER matches the reference exactly ([x, sin(f1·x), cos(f1·x),
sin(f2·x), ...] interleaved per frequency, reference nerfh_nff.py:257-261) so
that converted torch checkpoints hit the same input rows.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class EmbedConfig:
    num_freqs: int = 10          # 10 for xyz, 4 for viewdirs (options.py:105-106)
    max_freq_log2: float | None = None  # default num_freqs - 1
    include_input: bool = True
    log_sampling: bool = True
    input_dims: int = 3

    @property
    def freq_bands(self) -> np.ndarray:
        if self.num_freqs == 0:
            return np.zeros((0,), np.float32)
        mf = self.max_freq_log2 if self.max_freq_log2 is not None else self.num_freqs - 1
        if self.log_sampling:
            return (2.0 ** np.linspace(0.0, mf, self.num_freqs)).astype(np.float32)
        return np.linspace(2.0 ** 0.0, 2.0 ** mf, self.num_freqs).astype(np.float32)

    @property
    def out_dim(self) -> int:
        d = self.input_dims if self.include_input else 0
        return d + 2 * self.num_freqs * self.input_dims

    @classmethod
    def reduced(cls, multires: int) -> "EmbedConfig":
        """reduce_mode=0 of the reference (half the frequencies)."""
        return cls(num_freqs=multires // 2, max_freq_log2=(multires - 1) // 2)

    @classmethod
    def identity(cls) -> "EmbedConfig":
        """reduce_mode=1 — no frequencies, pass-through."""
        return cls(num_freqs=0, max_freq_log2=0)


@jax.custom_vjp
def _freq_encode(x: jnp.ndarray, freqs: jnp.ndarray) -> jnp.ndarray:
    """sin/cos bands of x (..., D) at freqs (F,) -> (..., 2·F·D) in the
    reference's interleave [sin(f1·x), cos(f1·x), sin(f2·x), ...].

    Computed directly in (F, D) order — the naive (D, F) order needs two
    swapaxes to reach the checkpoint layout, which XLA materializes as a
    split+copy on every refinement iteration (36 ms/frame of pure layout
    in PROFILE_r04). The custom VJP below reuses the forward's own sin/cos
    as the derivative pair (d sin(fx) = f·cos(fx), d cos(fx) = -f·sin(fx)),
    so the backward pass runs zero transcendentals and stores no extra
    residual beyond the tensors the consuming matmul already needs."""
    xf = x[..., None, :] * freqs[:, None]                    # (..., F, D)
    sc = jnp.stack([jnp.sin(xf), jnp.cos(xf)], axis=-2)      # (..., F, 2, D)
    return sc.reshape(*x.shape[:-1], 2 * freqs.shape[0] * x.shape[-1])


def _freq_encode_fwd(x, freqs):
    xf = x[..., None, :] * freqs[:, None]
    s, c = jnp.sin(xf), jnp.cos(xf)
    out = jnp.stack([s, c], axis=-2).reshape(
        *x.shape[:-1], 2 * freqs.shape[0] * x.shape[-1])
    return out, (s, c, freqs)


def _freq_encode_bwd(res, g):
    s, c, freqs = res
    F, D = s.shape[-2], s.shape[-1]
    gsc = g.reshape(*g.shape[:-1], F, 2, D)
    gs, gc = gsc[..., 0, :], gsc[..., 1, :]
    gx = ((gs * c - gc * s) * freqs[:, None]).sum(-2)
    # the frequency table is a static constant; custom_vjp still wants a
    # cotangent slot for it
    return gx, jnp.zeros_like(freqs)


_freq_encode.defvjp(_freq_encode_fwd, _freq_encode_bwd)


def embed(x: jnp.ndarray, cfg: EmbedConfig,
          window: jnp.ndarray | None = None) -> jnp.ndarray:
    """Frequency-encode (..., D) -> (..., out_dim).

    window: optional (num_freqs,) coarse-to-fine weights (Nerfies Eq. 8,
    reference embed_DNeRF nerfh_nff.py:282-297) applied to sin & cos of each
    band. None = all-ones (standard NeRF).
    """
    if cfg.num_freqs == 0:
        return x
    freqs = jnp.asarray(cfg.freq_bands, dtype=x.dtype)       # (F,)
    if window is None:
        flat = _freq_encode(x, freqs)
    else:
        # windowed (training, reduce_embedding=2) path: the window needs
        # its own cotangent, so use the plain autodiff formulation
        xf = x[..., None, :] * freqs[:, None]                # (..., F, D)
        s = jnp.sin(xf) * window[:, None]
        c = jnp.cos(xf) * window[:, None]
        sc = jnp.stack([s, c], axis=-2)                      # (..., F, 2, D)
        flat = sc.reshape(*x.shape[:-1],
                          2 * cfg.num_freqs * cfg.input_dims)
    if cfg.include_input:
        return jnp.concatenate([x, flat], axis=-1)
    return flat


def cosine_window(num_freqs: int, epoch: float, epochs_to_full: float) -> jnp.ndarray:
    """Nerfies Eq. 8 coarse-to-fine frequency window (reference
    get_embed_weight, nerfh_nff.py:272-280)."""
    alpha = num_freqs * epoch / epochs_to_full
    bands = jnp.arange(num_freqs, dtype=jnp.float32)
    t = jnp.clip(alpha - bands, 0.0, 1.0)
    return (1.0 - jnp.cos(jnp.pi * t)) * 0.5


def train_windows(epoch: float, xyz_cfg: EmbedConfig, dir_cfg: EmbedConfig,
                  epochs_to_full: float) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(xyz_window, dir_window) for reduce_embedding=2 at a given epoch —
    the pair the trainer threads through the jitted steps as TRACED arrays
    (the reference re-reads render_kwargs['i_epoch'] every epoch,
    run_nefes.py:370-371)."""
    return (cosine_window(xyz_cfg.num_freqs, epoch, epochs_to_full),
            cosine_window(dir_cfg.num_freqs, epoch, epochs_to_full))
