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


def _contract(w: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Composite contraction sum_s w[...,s] * x[...,s,c] -> (..., C).

    Written as an einsum so a bf16 value tensor rides the MXU with f32
    accumulation instead of being cast up to a second full-size f32
    tensor first — the (R, S, 128) feature head is the largest array in
    the whole refinement iteration and this read dominates composite
    time (PROFILE_r04). For f32 inputs this is numerically the classic
    multiply-reduce."""
    return jnp.einsum("...s,...sc->...c", w.astype(x.dtype), x,
                      preferred_element_type=jnp.float32)


def _weights(alphas: jnp.ndarray) -> jnp.ndarray:
    """alphas (R, S) -> compositing weights alpha_i * prod(1 - alpha_<i)."""
    shifted = jnp.concatenate(
        [jnp.ones_like(alphas[..., :1]), 1.0 - alphas[..., :-1]], axis=-1)
    transmittance = jnp.cumprod(shifted, axis=-1)
    # flush vanishing transmittance to EXACT zero: with the reference's
    # 1e2 delta tail (DELTA_INF) the saturated-ray products land in the
    # f32 denormal band, and denormal weights propagating into the
    # (R, S, C) head contractions run ~100x slow on CPU backends (TPU
    # flushes denormals in hardware). 1e-24 is far below any weight that
    # could matter at f32 precision, so numerics are unchanged.
    transmittance = jnp.where(transmittance > 1e-24, transmittance, 0.0)
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

    # per-sample scalar heads are (R, S) — cast up front so the alpha/
    # transmittance chain runs f32 even when the field emits bf16 heads
    static_sigmas = raw["static_sigma"].astype(jnp.float32)

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
        transient_sigmas = raw["transient_sigma"].astype(jnp.float32)
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
            rgb = _contract(s_weights, static_rgbs)
            w_ng = jax.lax.stop_gradient(s_weights)
            feat = _contract(w_ng, static_feats)
            depth = (s_weights * z_vals).sum(-1)
            disp = 1.0 / jnp.maximum(1e-10, depth / s_weights.sum(-1))
            return {"rgb": rgb, "feat": feat, "disp": disp, "acc": acc,
                    "weights": s_weights, "depth": depth,
                    "transient_sigmas": transient_sigmas,
                    "beta": jnp.zeros_like(acc)}

        static_rgb_map = _contract(static_weights, static_rgbs)
        w_ng = jax.lax.stop_gradient(static_weights)
        feat = _contract(w_ng, static_feats)
        if white_bkgd:
            static_rgb_map = static_rgb_map + (1.0 - acc[..., None])
        transient_rgb_map = _contract(transient_weights, raw["transient_rgb"])
        beta = (transient_weights
                * raw["transient_beta"].astype(jnp.float32)).sum(-1) + beta_min
        rgb = static_rgb_map + transient_rgb_map
    else:
        rgb = _contract(weights, static_rgbs)
        w_ng = jax.lax.stop_gradient(weights)
        feat = _contract(w_ng, static_feats)
        beta = jnp.zeros_like(acc)

    depth = (weights * z_vals).sum(-1)
    disp = 1.0 / jnp.maximum(1e-10, depth / weights.sum(-1))
    return {"rgb": rgb, "feat": feat, "disp": disp, "acc": acc,
            "weights": weights, "depth": depth,
            "transient_sigmas": transient_sigmas, "beta": beta}
