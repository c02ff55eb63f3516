"""Numerics parity of the Pallas fused field kernel (kernels/fused_field.py)
against the unfused flax NeRFH-NFF path — forward and VJP, all three head
modes — in interpret mode on CPU with f32 packing (bit-comparable)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nefes_tpu.fields.embedder import EmbedConfig, embed
from nefes_tpu.fields.nerfh_nff import NeRFHNFF
from nefes_tpu.kernels.fused_field import (
    FieldSpec, fused_field_apply, pack_params,
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
    weights = pack_params(params, SPEC)
    k1, k2 = jax.random.split(jax.random.key(1))
    pts = jax.random.normal(k1, (20, 3))           # padded to 24 inside
    dirs = jax.random.normal(k2, (20, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    return module, params, weights, pts, dirs


def flax_heads(module, params, pts, dirs, sigma_only, output_transient):
    xe = embed(pts, XE)
    de = None if sigma_only else embed(dirs, DE)
    return module.apply({"params": params}, xe, de, sigma_only,
                        output_transient)


@pytest.mark.parametrize("sigma_only,transient",
                         [(True, False), (False, False), (False, True)])
def test_forward_parity(setup, sigma_only, transient):
    module, params, weights, pts, dirs = setup
    got = fused_field_apply(SPEC, weights, pts, dirs, sigma_only=sigma_only,
                            output_transient=transient, interpret=True)
    want = flax_heads(module, params, pts, dirs, sigma_only, transient)
    assert set(got) == set(want)
    for k in want:
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(want[k]),
                                   rtol=2e-5, atol=2e-5, err_msg=k)


def _loss_fused(weights, pts, dirs, need_dw=True):
    out = fused_field_apply(SPEC, weights, pts, dirs, sigma_only=False,
                            output_transient=True, need_dw=need_dw,
                            interpret=True)
    return (jnp.sum(out["static_sigma"] * 0.3)
            + jnp.sum(out["static_rgb"] * 1.7)
            + jnp.sum(out["static_feat"] ** 2) * 0.01
            + jnp.sum(out["transient_rgb"])
            + jnp.sum(out["transient_sigma"] * 0.5)
            + jnp.sum(out["transient_beta"] * 0.25))


def _loss_flax(module, params, pts, dirs):
    out = flax_heads(module, params, pts, dirs, False, True)
    return (jnp.sum(out["static_sigma"] * 0.3)
            + jnp.sum(out["static_rgb"] * 1.7)
            + jnp.sum(out["static_feat"] ** 2) * 0.01
            + jnp.sum(out["transient_rgb"])
            + jnp.sum(out["transient_sigma"] * 0.5)
            + jnp.sum(out["transient_beta"] * 0.25))


def test_input_grad_parity(setup):
    module, params, weights, pts, dirs = setup
    gp, gd = jax.grad(_loss_fused, argnums=(1, 2))(weights, pts, dirs)
    wp, wd = jax.grad(lambda p, d: _loss_flax(module, params, p, d),
                      argnums=(0, 1))(pts, dirs)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(wp),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gd), np.asarray(wd),
                               rtol=1e-4, atol=1e-4)


def test_weight_grad_parity(setup):
    module, params, weights, pts, dirs = setup
    # grads wrt the FLAX param tree, routed through pack_params + kernel,
    # must match the all-flax gradient
    got = jax.grad(lambda p: _loss_fused(pack_params(p, SPEC), pts, dirs))(
        params)
    want = jax.grad(lambda p: _loss_flax(module, p, pts, dirs))(params)
    flat_g, _ = jax.tree.flatten(got)
    flat_w, tree = jax.tree.flatten(want)
    for g, w, path in zip(flat_g, flat_w,
                          jax.tree_util.tree_leaves_with_path(want)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=2e-4, atol=2e-4,
                                   err_msg=str(path[0]))


def test_need_dw_false_zeroes_weight_grads_but_keeps_input_grads(setup):
    module, params, weights, pts, dirs = setup
    gw, gp = jax.grad(lambda w, p: _loss_fused(w, p, dirs, need_dw=False),
                      argnums=(0, 1))(weights, pts)
    assert all(float(jnp.max(jnp.abs(g))) == 0.0 for g in gw)
    wp = jax.grad(lambda p: _loss_flax(module, params, p, dirs))(pts)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(wp),
                               rtol=1e-4, atol=1e-4)


def test_sigma_only_grad(setup):
    module, params, weights, pts, dirs = setup
    f = lambda p: jnp.sum(fused_field_apply(
        SPEC, weights, p, None, sigma_only=True, interpret=True)
        ["static_sigma"] ** 2)
    g = lambda p: jnp.sum(flax_heads(module, params, p, dirs, True, False)
                          ["static_sigma"] ** 2)
    np.testing.assert_allclose(np.asarray(jax.grad(f)(pts)),
                               np.asarray(jax.grad(g)(pts)),
                               rtol=1e-4, atol=1e-4)
