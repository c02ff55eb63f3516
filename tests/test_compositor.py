"""Volume compositor parity against a numpy transliteration of the
reference's raw2outputs_NeRFH_NFF (script/models/nerfh_nff.py:25-166)."""

import jax.numpy as jnp
import numpy as np

from nefes_tpu.render import composite

rng = np.random.default_rng(0)


def ref_composite_np(static_rgbs, static_sigmas, z_vals,
                     transient_rgbs=None, transient_sigmas=None,
                     transient_betas=None, beta_min=0.1,
                     test_time=False, transient_at_test=False):
    """numpy transliteration of nerfh_nff.py:25-166 (output_transient path
    decided by whether transient_* are given). static_rgbs: (R,S,3+F)."""
    deltas = z_vals[:, 1:] - z_vals[:, :-1]
    deltas = np.concatenate([deltas, 1e2 * np.ones_like(deltas[:, :1])], -1)
    output_transient = transient_sigmas is not None

    if output_transient:
        static_alphas = 1 - np.exp(-deltas * static_sigmas)
        transient_alphas = 1 - np.exp(-deltas * transient_sigmas)
        alphas = 1 - np.exp(-deltas * (static_sigmas + transient_sigmas))
    else:
        alphas = 1 - np.exp(-deltas * static_sigmas)

    shifted = np.concatenate([np.ones_like(alphas[:, :1]), 1 - alphas], -1)
    transmittance = np.cumprod(shifted[:, :-1], -1)
    weights = alphas * transmittance
    acc = weights.sum(-1)

    if output_transient:
        static_weights = static_alphas * transmittance
        transient_weights = transient_alphas * transmittance
        if test_time and not transient_at_test:
            sshift = np.concatenate([np.ones_like(static_alphas[:, :1]),
                                     1 - static_alphas], -1)
            stran = np.cumprod(sshift[:, :-1], -1)
            sw = static_alphas * stran
            rgb = (sw[..., None] * static_rgbs[..., :3]).sum(1)
            feat = (sw[..., None] * static_rgbs[..., 3:]).sum(1)
            depth = (sw * z_vals).sum(-1)
            return rgb, feat, acc, depth, np.zeros_like(acc)
        rgb = (static_weights[..., None] * static_rgbs[..., :3]).sum(1)
        feat = (static_weights[..., None] * static_rgbs[..., 3:]).sum(1)
        rgb = rgb + (transient_weights[..., None] * transient_rgbs).sum(1)
        beta = (transient_weights * transient_betas).sum(-1) + beta_min
        depth = (weights * z_vals).sum(-1)
        return rgb, feat, acc, depth, beta

    rgb = (weights[..., None] * static_rgbs[..., :3]).sum(1)
    feat = (weights[..., None] * static_rgbs[..., 3:]).sum(1)
    depth = (weights * z_vals).sum(-1)
    return rgb, feat, acc, depth, np.zeros_like(acc)


def _random_raw(R=8, S=16, F=8, transient=False):
    raw = {
        "static_rgb": rng.uniform(0, 1, (R, S, 3)).astype(np.float32),
        "static_feat": rng.standard_normal((R, S, F)).astype(np.float32),
        "static_sigma": rng.uniform(0, 3, (R, S)).astype(np.float32),
    }
    if transient:
        raw["transient_rgb"] = rng.uniform(0, 1, (R, S, 3)).astype(np.float32)
        raw["transient_sigma"] = rng.uniform(0, 2, (R, S)).astype(np.float32)
        raw["transient_beta"] = rng.uniform(0, 1, (R, S)).astype(np.float32)
    z = np.sort(rng.uniform(0.2, 4.0, (R, S)).astype(np.float32), axis=-1)
    return raw, z


def test_static_only_matches_reference():
    raw, z = _random_raw()
    out = composite({k: jnp.asarray(v) for k, v in raw.items()}, jnp.asarray(z))
    rgb, feat, acc, depth, beta = ref_composite_np(
        np.concatenate([raw["static_rgb"], raw["static_feat"]], -1),
        raw["static_sigma"], z)
    np.testing.assert_allclose(np.asarray(out["rgb"]), rgb, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["feat"]), feat, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["acc"]), acc, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["depth"]), depth, atol=1e-5)


def test_transient_train_matches_reference():
    raw, z = _random_raw(transient=True)
    out = composite({k: jnp.asarray(v) for k, v in raw.items()}, jnp.asarray(z),
                    output_transient=True, beta_min=0.1)
    rgb, feat, acc, depth, beta = ref_composite_np(
        np.concatenate([raw["static_rgb"], raw["static_feat"]], -1),
        raw["static_sigma"], z, raw["transient_rgb"], raw["transient_sigma"],
        raw["transient_beta"])
    np.testing.assert_allclose(np.asarray(out["rgb"]), rgb, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["feat"]), feat, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["beta"]), beta, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["depth"]), depth, atol=1e-5)


def test_transient_testtime_static_only():
    raw, z = _random_raw(transient=True)
    out = composite({k: jnp.asarray(v) for k, v in raw.items()}, jnp.asarray(z),
                    output_transient=True, test_time=True)
    rgb, feat, acc, depth, beta = ref_composite_np(
        np.concatenate([raw["static_rgb"], raw["static_feat"]], -1),
        raw["static_sigma"], z, raw["transient_rgb"], raw["transient_sigma"],
        raw["transient_beta"], test_time=True)
    np.testing.assert_allclose(np.asarray(out["rgb"]), rgb, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["feat"]), feat, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["depth"]), depth, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["beta"]), 0.0, atol=0)


def test_feature_stop_gradient():
    """Gradients through feat must NOT reach sigma (the detached-weights
    rule, nerfh_nff.py:108-111); gradients through rgb MUST."""
    import jax
    raw, z = _random_raw()
    zj = jnp.asarray(z)

    def feat_loss(sigma):
        r = {**{k: jnp.asarray(v) for k, v in raw.items()},
             "static_sigma": sigma}
        return composite(r, zj)["feat"].sum()

    def rgb_loss(sigma):
        r = {**{k: jnp.asarray(v) for k, v in raw.items()},
             "static_sigma": sigma}
        return composite(r, zj)["rgb"].sum()

    g_feat = jax.grad(feat_loss)(jnp.asarray(raw["static_sigma"]))
    g_rgb = jax.grad(rgb_loss)(jnp.asarray(raw["static_sigma"]))
    assert float(jnp.abs(g_feat).max()) == 0.0
    assert float(jnp.abs(g_rgb).max()) > 0.0


def test_sigma_only_weights():
    raw, z = _random_raw()
    out = composite({"static_sigma": jnp.asarray(raw["static_sigma"])},
                    jnp.asarray(z), sigma_only=True)
    assert out["rgb"] is None
    full = composite({k: jnp.asarray(v) for k, v in raw.items()}, jnp.asarray(z))
    np.testing.assert_allclose(np.asarray(out["weights"]),
                               np.asarray(full["weights"]), atol=1e-6)


def test_opaque_wall_depth():
    """A single opaque slab should place all weight (and depth) at the slab."""
    R, S = 4, 32
    z = np.tile(np.linspace(0.0, 4.0, S), (R, 1)).astype(np.float32)
    sigma = np.zeros((R, S), np.float32)
    sigma[:, 16] = 1e4
    raw = {"static_rgb": np.ones((R, S, 3), np.float32) * 0.7,
           "static_feat": np.ones((R, S, 4), np.float32),
           "static_sigma": sigma}
    out = composite({k: jnp.asarray(v) for k, v in raw.items()}, jnp.asarray(z))
    np.testing.assert_allclose(np.asarray(out["depth"]), z[0, 16], atol=1e-3)
    np.testing.assert_allclose(np.asarray(out["rgb"]), 0.7, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out["acc"]), 1.0, atol=1e-4)
