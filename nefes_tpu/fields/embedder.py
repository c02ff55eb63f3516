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


def embed(x: jnp.ndarray, cfg: EmbedConfig,
          window: jnp.ndarray | None = None) -> jnp.ndarray:
    """Frequency-encode (..., D) -> (..., out_dim).

    window: optional (num_freqs,) coarse-to-fine weights (Nerfies Eq. 8,
    reference embed_DNeRF nerfh_nff.py:282-297) applied to sin & cos of each
    band. None = all-ones (standard NeRF).
    """
    if cfg.num_freqs == 0:
        return x
    freqs = jnp.asarray(cfg.freq_bands)                      # (F,)
    xf = x[..., None] * freqs                                # (..., D, F)
    s, c = jnp.sin(xf), jnp.cos(xf)
    if window is not None:
        s = s * window
        c = c * window
    # interleave per-frequency [sin_f, cos_f] across the channel dim so the
    # flattened layout is [sin(f1·xyz), cos(f1·xyz), sin(f2·xyz), ...]
    sc = jnp.stack([s, c], axis=-1)                          # (..., D, F, 2)
    sc = jnp.swapaxes(sc, -3, -2)                            # (..., F, D, 2)
    sc = jnp.swapaxes(sc, -2, -1)                            # (..., F, 2, D)
    flat = sc.reshape(*x.shape[:-1], 2 * cfg.num_freqs * cfg.input_dims)
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
