"""End-to-end render parity: renderer with cfg.fused=True (Pallas kernel,
interpret mode) vs the unfused flax path, including gradients wrt the
camera pose translation — the refinement gradient path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nefes_tpu.render.renderer import RenderConfig, render_rays
from nefes_tpu.train.model import ModelConfig, NeFeSModel

CFG = ModelConfig.tiny()
MODEL = NeFeSModel(CFG)


@pytest.fixture(scope="module")
def setup():
    variables = MODEL.init_variables(jax.random.key(0))
    params = variables["params"]
    packed = MODEL.pack_fused(params)
    k = jax.random.key(1)
    rays_o = jax.random.normal(k, (12, 3)) * 0.1
    rays_d = jax.random.normal(jax.random.key(2), (12, 3))
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    return params, packed, rays_o, rays_d


def both(params, packed, rays_o, rays_d, **cfg_kw):
    cfg = CFG.render_config(n_samples=8, n_importance=8, perturb=False,
                            **cfg_kw)
    out = render_rays(MODEL.coarse_fn, MODEL.fine_fn, params, params,
                      rays_o, rays_d, 0.1, 4.0, None, cfg)
    fcfg = cfg.__class__(**{**cfg.__dict__, "fused": True,
                            "fused_need_dw": False})
    pc, pf = packed
    fout = render_rays(MODEL.coarse_raw_fn(need_dw=False, interpret=True),
                       MODEL.fine_raw_fn(need_dw=False, interpret=True),
                       pc, pf, rays_o, rays_d, 0.1, 4.0, None, fcfg)
    return out, fout


@pytest.mark.parametrize("cfg_kw", [
    {"test_time": True, "output_transient": False},   # refinement config
    {"test_time": False, "output_transient": True},   # training config
])
def test_fused_render_matches_unfused(setup, cfg_kw):
    params, packed, rays_o, rays_d = setup
    out, fout = both(params, packed, rays_o, rays_d, **cfg_kw)
    for k in out:
        if out[k] is None:
            continue
        np.testing.assert_allclose(np.asarray(fout[k]), np.asarray(out[k]),
                                   rtol=2e-4, atol=2e-5, err_msg=k)


def test_fused_pose_gradient_matches(setup):
    params, packed, rays_o, rays_d = setup
    cfg = CFG.render_config(n_samples=8, n_importance=8, perturb=False,
                            test_time=True, output_transient=False)
    fcfg = cfg.__class__(**{**cfg.__dict__, "fused": True,
                            "fused_need_dw": False})
    pc, pf = packed

    def loss_unfused(shift):
        out = render_rays(MODEL.coarse_fn, MODEL.fine_fn, params, params,
                          rays_o + shift, rays_d, 0.1, 4.0, None, cfg)
        return jnp.sum(out["feat"] ** 2) + jnp.sum(out["rgb"])

    def loss_fused(shift):
        out = render_rays(MODEL.coarse_raw_fn(need_dw=False, interpret=True),
                          MODEL.fine_raw_fn(need_dw=False, interpret=True),
                          pc, pf, rays_o + shift, rays_d, 0.1, 4.0, None,
                          fcfg)
        return jnp.sum(out["feat"] ** 2) + jnp.sum(out["rgb"])

    g0 = jax.grad(loss_unfused)(jnp.zeros(3))
    g1 = jax.grad(loss_fused)(jnp.zeros(3))
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                               rtol=5e-4, atol=5e-5)


# --- pre-embedded variant (cfg.fused_pre): XLA embeds, kernel runs the
# tower; the renderer's standard embed branch drives the pre fns ---

def both_pre(params, rays_o, rays_d, **cfg_kw):
    cfg = CFG.render_config(n_samples=8, n_importance=8, perturb=False,
                            **cfg_kw)
    out = render_rays(MODEL.coarse_fn, MODEL.fine_fn, params, params,
                      rays_o, rays_d, 0.1, 4.0, None, cfg)
    fcfg = cfg.__class__(**{**cfg.__dict__, "fused": True,
                            "fused_pre": True, "fused_need_dw": False})
    pc, pf = MODEL.pack_fused_pre(params)
    fout = render_rays(MODEL.coarse_pre_fn(need_dw=False, interpret=True),
                       MODEL.fine_pre_fn(need_dw=False, interpret=True),
                       pc, pf, rays_o, rays_d, 0.1, 4.0, None, fcfg)
    return out, fout


@pytest.mark.parametrize("cfg_kw", [
    {"test_time": True, "output_transient": False},   # refinement config
    {"test_time": False, "output_transient": True},   # training config
])
def test_fused_pre_render_matches_unfused(setup, cfg_kw):
    params, _, rays_o, rays_d = setup
    out, fout = both_pre(params, rays_o, rays_d, **cfg_kw)
    for k in out:
        if out[k] is None:
            continue
        np.testing.assert_allclose(np.asarray(fout[k]), np.asarray(out[k]),
                                   rtol=2e-4, atol=2e-5, err_msg=k)


def test_fused_pre_pose_gradient_matches(setup):
    params, _, rays_o, rays_d = setup
    cfg = CFG.render_config(n_samples=8, n_importance=8, perturb=False,
                            test_time=True, output_transient=False)
    fcfg = cfg.__class__(**{**cfg.__dict__, "fused": True,
                            "fused_pre": True, "fused_need_dw": False})
    pc, pf = MODEL.pack_fused_pre(params)

    def loss_unfused(shift):
        out = render_rays(MODEL.coarse_fn, MODEL.fine_fn, params, params,
                          rays_o + shift, rays_d, 0.1, 4.0, None, cfg)
        return jnp.sum(out["feat"] ** 2) + jnp.sum(out["rgb"])

    def loss_fused(shift):
        out = render_rays(MODEL.coarse_pre_fn(need_dw=False, interpret=True),
                          MODEL.fine_pre_fn(need_dw=False, interpret=True),
                          pc, pf, rays_o + shift, rays_d, 0.1, 4.0, None,
                          fcfg)
        return jnp.sum(out["feat"] ** 2) + jnp.sum(out["rgb"])

    g0 = jax.grad(loss_unfused)(jnp.zeros(3))
    g1 = jax.grad(loss_fused)(jnp.zeros(3))
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                               rtol=5e-4, atol=5e-5)
