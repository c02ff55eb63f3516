"""Numerics parity of the PRE-EMBEDDED Pallas fused field variant
(kernels/fused_field.py:fused_field_apply_pre) against the unfused flax
NeRFH-NFF path — forward and VJP, all three head modes — in interpret mode
on CPU with f32 packing (bit-comparable tolerances match
tests/test_fused_field.py). The pre variant consumes XLA-computed
embeddings (reference row order, pack_params(pre_embedded=True)) and
returns embedding cotangents, leaving the trig chain rule to XLA."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nefes_tpu.fields.embedder import EmbedConfig, embed
from nefes_tpu.fields.nerfh_nff import NeRFHNFF
from nefes_tpu.kernels.fused_field import (
    FieldSpec, fused_field_apply_pre, pack_params,
)

SPEC = FieldSpec(depth=4, width=32, skips=(2,), n_freqs_xyz=6, n_freqs_dir=3,
                 feature_dim=16, transient=True, dtype="float32", tile=8)
XE = EmbedConfig(num_freqs=SPEC.n_freqs_xyz)
DE = EmbedConfig(num_freqs=SPEC.n_freqs_dir)


@pytest.fixture(scope="module")
def setup():
    module = NeRFHNFF(typ="fine", depth=SPEC.depth, width=SPEC.width,
                      skips=SPEC.skips, in_channels_xyz=SPEC.emb_xyz,
                      in_channels_dir=SPEC.emb_dir,
                      feature_dim=SPEC.feature_dim)
    params = module.init(jax.random.key(0), jnp.zeros((1, SPEC.emb_xyz)),
                         jnp.zeros((1, SPEC.emb_dir)))["params"]
    weights = pack_params(params, SPEC, pre_embedded=True)
    k1, k2 = jax.random.split(jax.random.key(1))
    pts = jax.random.normal(k1, (20, 3))           # padded to 24 inside
    dirs = jax.random.normal(k2, (20, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    xe, de = embed(pts, XE), embed(dirs, DE)
    return module, params, weights, xe, de


@pytest.mark.parametrize("sigma_only,transient",
                         [(True, False), (False, False), (False, True)])
def test_forward_parity(setup, sigma_only, transient):
    module, params, weights, xe, de = setup
    got = fused_field_apply_pre(SPEC, weights, xe, de,
                                sigma_only=sigma_only,
                                output_transient=transient, interpret=True)
    want = module.apply({"params": params}, xe, None if sigma_only else de,
                        sigma_only, transient)
    assert set(got) == set(want)
    for k in want:
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(want[k]),
                                   rtol=2e-5, atol=2e-5, err_msg=k)


def _loss_pre(weights, xe, de, need_dw=True):
    out = fused_field_apply_pre(SPEC, weights, xe, de, sigma_only=False,
                                output_transient=True, need_dw=need_dw,
                                interpret=True)
    return (jnp.sum(out["static_sigma"] * 0.3)
            + jnp.sum(out["static_rgb"] * 1.7)
            + jnp.sum(out["static_feat"] ** 2) * 0.01
            + jnp.sum(out["transient_rgb"])
            + jnp.sum(out["transient_sigma"] * 0.5)
            + jnp.sum(out["transient_beta"] * 0.25))


def _loss_flax(module, params, xe, de):
    out = module.apply({"params": params}, xe, de, False, True)
    return (jnp.sum(out["static_sigma"] * 0.3)
            + jnp.sum(out["static_rgb"] * 1.7)
            + jnp.sum(out["static_feat"] ** 2) * 0.01
            + jnp.sum(out["transient_rgb"])
            + jnp.sum(out["transient_sigma"] * 0.5)
            + jnp.sum(out["transient_beta"] * 0.25))


def test_embedding_grad_parity(setup):
    module, params, weights, xe, de = setup
    ge, gd = jax.grad(_loss_pre, argnums=(1, 2))(weights, xe, de)
    we, wd = jax.grad(lambda e, d: _loss_flax(module, params, e, d),
                      argnums=(0, 1))(xe, de)
    np.testing.assert_allclose(np.asarray(ge), np.asarray(we),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gd), np.asarray(wd),
                               rtol=1e-4, atol=1e-4)


def test_weight_grad_parity(setup):
    module, params, weights, xe, de = setup
    got = jax.grad(lambda p: _loss_pre(
        pack_params(p, SPEC, pre_embedded=True), xe, de))(params)
    want = jax.grad(lambda p: _loss_flax(module, p, xe, de))(params)
    flat_g, _ = jax.tree.flatten(got)
    flat_w, _ = jax.tree.flatten(want)
    for g, w, path in zip(flat_g, flat_w,
                          jax.tree_util.tree_leaves_with_path(want)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=2e-4, atol=2e-4,
                                   err_msg=str(path[0]))


def test_need_dw_false_zeroes_weight_grads_but_keeps_emb_grads(setup):
    module, params, weights, xe, de = setup
    gw, ge = jax.grad(lambda w, e: _loss_pre(w, e, de, need_dw=False),
                      argnums=(0, 1))(weights, xe)
    assert all(float(jnp.max(jnp.abs(g))) == 0.0 for g in gw)
    we = jax.grad(lambda e: _loss_flax(module, params, e, de))(xe)
    np.testing.assert_allclose(np.asarray(ge), np.asarray(we),
                               rtol=1e-4, atol=1e-4)


def test_sigma_only_grad(setup):
    module, params, weights, xe, de = setup
    f = lambda e: jnp.sum(fused_field_apply_pre(
        SPEC, weights, e, None, sigma_only=True, need_dw=False,
        interpret=True)["static_sigma"] ** 2)
    g = lambda e: jnp.sum(module.apply({"params": params}, e, None, True,
                                       False)["static_sigma"] ** 2)
    np.testing.assert_allclose(np.asarray(jax.grad(f)(xe)),
                               np.asarray(jax.grad(g)(xe)),
                               rtol=1e-4, atol=1e-4)


def test_end_to_end_pose_grad_through_embed(setup):
    """pose-style chain: pts -> XLA embed -> pre kernel -> loss; d_pts must
    match the all-flax path (the gradient the refinement modes consume)."""
    module, params, weights, _, _ = setup
    k1, k2 = jax.random.split(jax.random.key(3))
    pts = jax.random.normal(k1, (20, 3))
    dirs = jax.random.normal(k2, (20, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)

    def loss_pre(p, d):
        return _loss_pre(weights, embed(p, XE), embed(d, DE), need_dw=False)

    def loss_flax(p, d):
        return _loss_flax(module, params, embed(p, XE), embed(d, DE))

    gp, gd = jax.grad(loss_pre, argnums=(0, 1))(pts, dirs)
    wp, wd = jax.grad(loss_flax, argnums=(0, 1))(pts, dirs)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(wp),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gd), np.asarray(wd),
                               rtol=1e-4, atol=1e-4)
