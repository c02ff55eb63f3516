"""NeRF-W volume compositing with the NeFeS feature head.

Reference: ``raw2outputs_NeRFH_NFF`` (script/models/nerfh_nff.py:25-166).
Key semantics preserved exactly:

  * deltas with a 1e2 "infinity" tail (nerfh_nff.py:56 — NOT the classic
    1e10) and no direction-norm scaling (:58-59).
  * transient path: alphas from σ_s+σ_t, separate static/transient weights
    from the *joint* transmittance (:62-78).
  * feature maps composited with STOP-GRADIENT weights (:108-111,122-125,
    155-157 — Distilled-Feature-Fields rule: features never shape geometry).
  * β composed from transient weights then +beta_min AFTER composition
    (:133-137).
  * test-time static-only path recomputes transmittance from static alphas
    alone (:92-117).

Pure function over named head dicts; vmap/shard-friendly; all outputs f32.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

DELTA_INF = 1e2


def _weights(alphas: jnp.ndarray) -> jnp.ndarray:
    """alphas (R, S) -> compositing weights alpha_i * prod(1 - alpha_<i)."""
    shifted = jnp.concatenate(
        [jnp.ones_like(alphas[..., :1]), 1.0 - alphas[..., :-1]], axis=-1)
    transmittance = jnp.cumprod(shifted, axis=-1)
    return alphas * transmittance, transmittance


def composite(raw: dict[str, jnp.ndarray], z_vals: jnp.ndarray,
              raw_noise_std: float = 0.0,
              noise_rng: jax.Array | None = None,
              output_transient: bool = False,
              beta_min: float = 0.1,
              white_bkgd: bool = False,
              test_time: bool = False,
              transient_at_test: bool = False,
              sigma_only: bool = False) -> dict[str, Any]:
    """Composite per-sample field outputs along each ray.

    raw: head dict from NeRFHNFF with (R, S) / (R, S, C) arrays.
    z_vals: (R, S).

    Returns a dict with (per reference return tuple): rgb, feat, disp, acc,
    weights, depth, transient_sigmas, beta — entries None when not computed
    on that path.
    """
    deltas = z_vals[..., 1:] - z_vals[..., :-1]
    deltas = jnp.concatenate(
        [deltas, jnp.full_like(deltas[..., :1], DELTA_INF)], axis=-1)

    static_sigmas = raw["static_sigma"]

    if sigma_only:
        # coarse-at-test fast path (nerfh_nff.py:33-34,83-89): only weights
        # are needed to drive importance sampling.
        alphas = 1.0 - jnp.exp(-deltas * static_sigmas)
        weights, _ = _weights(alphas)
        return {"weights": weights, "acc": weights.sum(-1),
                "rgb": None, "feat": None, "disp": None, "depth": None,
                "transient_sigmas": None, "beta": None}

    static_rgbs = raw["static_rgb"]        # (R, S, 3)
    static_feats = raw["static_feat"]      # (R, S, F)

    if output_transient:
        transient_sigmas = raw["transient_sigma"]
        static_alphas = 1.0 - jnp.exp(-deltas * static_sigmas)
        transient_alphas = 1.0 - jnp.exp(-deltas * transient_sigmas)
        alphas = 1.0 - jnp.exp(-deltas * (static_sigmas + transient_sigmas))
    else:
        if raw_noise_std > 0.0 and noise_rng is not None:
            noise = jax.random.normal(noise_rng, static_sigmas.shape) * raw_noise_std
        else:
            noise = 0.0
        alphas = 1.0 - jnp.exp(-deltas * (static_sigmas + noise))
        transient_sigmas = None

    weights, transmittance = _weights(alphas)
    acc = weights.sum(-1)

    if output_transient:
        static_weights = static_alphas * transmittance
        transient_weights = transient_alphas * transmittance

        if test_time and not transient_at_test:
            # static-only re-composition (nerfh_nff.py:92-117)
            s_weights, _ = _weights(static_alphas)
            rgb = (s_weights[..., None] * static_rgbs).sum(-2)
            w_ng = jax.lax.stop_gradient(s_weights)
            feat = (w_ng[..., None] * static_feats).sum(-2)
            depth = (s_weights * z_vals).sum(-1)
            disp = 1.0 / jnp.maximum(1e-10, depth / s_weights.sum(-1))
            return {"rgb": rgb, "feat": feat, "disp": disp, "acc": acc,
                    "weights": s_weights, "depth": depth,
                    "transient_sigmas": transient_sigmas,
                    "beta": jnp.zeros_like(acc)}

        static_rgb_map = (static_weights[..., None] * static_rgbs).sum(-2)
        w_ng = jax.lax.stop_gradient(static_weights)
        feat = (w_ng[..., None] * static_feats).sum(-2)
        if white_bkgd:
            static_rgb_map = static_rgb_map + (1.0 - acc[..., None])
        transient_rgb_map = (transient_weights[..., None]
                             * raw["transient_rgb"]).sum(-2)
        beta = (transient_weights * raw["transient_beta"]).sum(-1) + beta_min
        rgb = static_rgb_map + transient_rgb_map
    else:
        rgb = (weights[..., None] * static_rgbs).sum(-2)
        w_ng = jax.lax.stop_gradient(weights)
        feat = (w_ng[..., None] * static_feats).sum(-2)
        beta = jnp.zeros_like(acc)

    depth = (weights * z_vals).sum(-1)
    disp = 1.0 / jnp.maximum(1e-10, depth / weights.sum(-1))
    return {"rgb": rgb, "feat": feat, "disp": disp, "acc": acc,
            "weights": weights, "depth": depth,
            "transient_sigmas": transient_sigmas, "beta": beta}
