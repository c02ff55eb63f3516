"""Composite-fused render kernel vs the unfused field+compositor path
(interpret mode, f32): forward parity for every output AND gradient
parity w.r.t. pts, dirs and z_vals — including the stop-gradient feature
rule (feature channels must contribute NO weight gradient)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nefes_tpu.fields.embedder import EmbedConfig, embed
from nefes_tpu.kernels.fused_field import FieldSpec, pack_params
from nefes_tpu.kernels.fused_render import fused_render_apply
from nefes_tpu.render.compositor import composite
from nefes_tpu.train.model import ModelConfig, NeFeSModel

R, S = 16, 128


@pytest.fixture(scope="module")
def setup():
    cfg = ModelConfig(depth=4, width=128, feature_dim=16, skips=(2,),
                      dtype=jnp.float32)
    model = NeFeSModel(cfg)
    params = model.init_variables(jax.random.key(0))["params"]
    spec = FieldSpec.from_model(cfg, "fine", dtype="float32", tile=1024)
    weights = pack_params(params["fine"], spec)

    rng = np.random.default_rng(0)
    rays_o = jnp.asarray(rng.normal(0, 0.1, (R, 3)).astype(np.float32))
    rays_d = jnp.asarray(
        (rng.normal(0, 0.2, (R, 3)) + [0, 0, -1.0]).astype(np.float32))
    viewdirs = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    z = jnp.sort(jnp.asarray(
        rng.uniform(0.3, 4.0, (R, S)).astype(np.float32)), axis=-1)
    pts = rays_o[:, None, :] + rays_d[:, None, :] * z[..., None]
    return cfg, model, params, spec, weights, pts, viewdirs, z


def _reference(cfg, model, params, pts, viewdirs, z):
    """The unfused path: embed -> flax field -> compositor (test-time,
    no transient — the refinement fine pass)."""
    xyz_emb = embed(pts, cfg.xyz_embed)
    dirs = jnp.broadcast_to(viewdirs[:, None, :], pts.shape)
    dir_emb = embed(dirs, cfg.dir_embed)
    raw = model.fine_fn(params, xyz_emb, dir_emb, False, False)
    return composite(raw, z, output_transient=False, test_time=True)


def test_forward_parity(setup):
    cfg, model, params, spec, weights, pts, viewdirs, z = setup
    ref = _reference(cfg, model, params, pts, viewdirs, z)
    out = fused_render_apply(spec, weights, pts, viewdirs, z,
                             interpret=True)
    for k in ("rgb", "feat", "depth", "acc", "disp"):
        np.testing.assert_allclose(np.asarray(out[k]),
                                   np.asarray(ref[k]),
                                   rtol=2e-4, atol=2e-5, err_msg=k)


def test_forward_parity_padded_rays(setup):
    """R not a multiple of the ray tile exercises the pad/crop path."""
    cfg, model, params, spec, weights, pts, viewdirs, z = setup
    r = 11
    ref = _reference(cfg, model, params, pts[:r], viewdirs[:r], z[:r])
    out = fused_render_apply(spec, weights, pts[:r], viewdirs[:r], z[:r],
                             interpret=True)
    np.testing.assert_allclose(np.asarray(out["rgb"]),
                               np.asarray(ref["rgb"]),
                               rtol=2e-4, atol=2e-5)


def test_gradient_parity(setup):
    """d loss / d (pts, dirs, z) matches XLA autodiff of the unfused
    path, with a loss touching rgb + feat + depth + acc."""
    cfg, model, params, spec, weights, pts, viewdirs, z = setup

    def loss_ref(pts, viewdirs, z):
        o = _reference(cfg, model, params, pts, viewdirs, z)
        return (jnp.sum(o["rgb"] ** 2) + 0.1 * jnp.sum(o["feat"] ** 2)
                + 0.05 * jnp.sum(o["depth"]) + 0.02 * jnp.sum(o["acc"]))

    def loss_kern(pts, viewdirs, z):
        o = fused_render_apply(spec, weights, pts, viewdirs, z,
                               interpret=True)
        return (jnp.sum(o["rgb"] ** 2) + 0.1 * jnp.sum(o["feat"] ** 2)
                + 0.05 * jnp.sum(o["depth"]) + 0.02 * jnp.sum(o["acc"]))

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(pts, viewdirs, z)
    g_k = jax.grad(loss_kern, argnums=(0, 1, 2))(pts, viewdirs, z)
    # d_pts tolerance is loose by necessity: the embedding chain rule sums
    # +-O(2^9 * cotangent) band terms that cancel to a small net — at
    # n_freqs=10 both f32 implementations carry ~1e-3-relative rounding
    # noise in that cancellation (verified: feeding IDENTICAL cotangents
    # through the flax VJP and the kernel VJP reproduces the same ~5e-3
    # spread; an f64 oracle would sit between them). d_dirs (4 bands) and
    # d_z (no bands) are tight.
    tols = {"pts": dict(rtol=3e-2, atol=1e-2),
            "dirs": dict(rtol=1e-4, atol=1e-5),
            "z": dict(rtol=1e-4, atol=1e-5)}
    for a, b, name in zip(g_k, g_ref, ("pts", "dirs", "z")):
        scale = max(float(jnp.abs(b).max()), 1e-3)
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b) / scale,
                                   err_msg=name, **tols[name])


def test_stop_gradient_feature_rule(setup):
    """A feature-only loss must produce gradients through the feature
    HEAD values but none through the weights/sigma path — same zeros the
    XLA compositor's stop_gradient produces. Checked via d_z: features
    reach z only through the weights, so a feat-only loss must give
    d_z ~= 0 except the depth/none terms (exactly as the reference)."""
    cfg, model, params, spec, weights, pts, viewdirs, z = setup

    def dz_of(fn):
        def loss(z):
            return jnp.sum(fn(z)["feat"] ** 2)
        return jax.grad(loss)(z)

    dz_ref = dz_of(lambda z: _reference(cfg, model, params, pts,
                                        viewdirs, z))
    dz_k = dz_of(lambda z: fused_render_apply(spec, weights, pts,
                                              viewdirs, z, interpret=True))
    # both must agree AND reflect the stop-grad rule: z only enters feat
    # through pts (= o + d*z), never through the weights
    np.testing.assert_allclose(np.asarray(dz_k), np.asarray(dz_ref),
                               rtol=2e-3, atol=2e-4)


def test_render_rays_fused_render_path():
    """render_rays with cfg.fused_render: the composite-fused fine pass
    slots into the full renderer (coarse sigma kernel -> PDF sampling ->
    fused fine+composite) and matches the unfused pipeline end-to-end,
    including the pose-translation gradient (the refinement grad path)."""
    from nefes_tpu.render.renderer import render_rays

    cfg_m = ModelConfig.tiny()
    model = NeFeSModel(cfg_m)
    params = model.init_variables(jax.random.key(0))["params"]
    pc, pf = model.pack_fused(params)
    k = jax.random.key(1)
    rays_o = jax.random.normal(k, (12, 3)) * 0.1
    rays_d = jax.random.normal(jax.random.key(2), (12, 3))
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    cfg = cfg_m.render_config(n_samples=8, n_importance=8, perturb=False,
                              test_time=True, output_transient=False)

    def unfused(o):
        return render_rays(model.coarse_fn, model.fine_fn, params, params,
                           o, rays_d, 0.1, 4.0, None, cfg)

    fcfg = cfg.__class__(**{**cfg.__dict__, "fused": True,
                            "fused_need_dw": False, "fused_render": True})

    def fused(o):
        return render_rays(
            model.coarse_raw_fn(need_dw=False, interpret=True),
            model.fine_render_raw_fn(interpret=True),
            pc, pf, o, rays_d, 0.1, 4.0, None, fcfg)

    out, fout = unfused(rays_o), fused(rays_o)
    for key in ("rgb", "feat", "disp", "acc", "depth"):
        np.testing.assert_allclose(np.asarray(fout[key]),
                                   np.asarray(out[key]),
                                   rtol=2e-4, atol=2e-5, err_msg=key)

    loss_u = lambda o: jnp.sum(unfused(o)["feat"] ** 2) \
        + jnp.sum(unfused(o)["rgb"] ** 2)
    loss_f = lambda o: jnp.sum(fused(o)["feat"] ** 2) \
        + jnp.sum(fused(o)["rgb"] ** 2)
    gu = np.asarray(jax.grad(loss_u)(rays_o))
    gf = np.asarray(jax.grad(loss_f)(rays_o))
    scale = max(np.abs(gu).max(), 1e-3)
    np.testing.assert_allclose(gf / scale, gu / scale, rtol=3e-3,
                               atol=1e-3)


# --- PRE-EMBEDDED composite-fused render (fused_render_apply_pre) ---

def _embeds(cfg, pts, viewdirs):
    xyz_emb = embed(pts, cfg.xyz_embed)
    dirs = jnp.broadcast_to(viewdirs[:, None, :], pts.shape)
    return xyz_emb, embed(dirs, cfg.dir_embed)


def test_pre_forward_parity(setup):
    cfg, model, params, spec, _, pts, viewdirs, z = setup
    from nefes_tpu.kernels.fused_render import fused_render_apply_pre
    weights = pack_params(params["fine"], spec, pre_embedded=True)
    ref = _reference(cfg, model, params, pts, viewdirs, z)
    xe, de = _embeds(cfg, pts, viewdirs)
    out = fused_render_apply_pre(spec, weights, xe, de, z, interpret=True)
    for k in ("rgb", "feat", "depth", "acc", "disp"):
        np.testing.assert_allclose(np.asarray(out[k]),
                                   np.asarray(ref[k]),
                                   rtol=2e-4, atol=2e-5, err_msg=k)


def test_pre_gradient_parity(setup):
    """d loss / d (pts, dirs, z) through XLA embed + pre kernel matches
    the unfused path — the exact refinement gradient route (pose -> pts
    -> embed -> kernel -> per-ray loss)."""
    cfg, model, params, spec, _, pts, viewdirs, z = setup
    from nefes_tpu.kernels.fused_render import fused_render_apply_pre
    weights = pack_params(params["fine"], spec, pre_embedded=True)

    def loss_ref(pts, viewdirs, z):
        o = _reference(cfg, model, params, pts, viewdirs, z)
        return (jnp.sum(o["rgb"] ** 2) + 0.1 * jnp.sum(o["feat"] ** 2)
                + 0.05 * jnp.sum(o["depth"]) + 0.02 * jnp.sum(o["acc"]))

    def loss_kern(pts, viewdirs, z):
        xe, de = _embeds(cfg, pts, viewdirs)
        o = fused_render_apply_pre(spec, weights, xe, de, z,
                                   interpret=True)
        return (jnp.sum(o["rgb"] ** 2) + 0.1 * jnp.sum(o["feat"] ** 2)
                + 0.05 * jnp.sum(o["depth"]) + 0.02 * jnp.sum(o["acc"]))

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(pts, viewdirs, z)
    g_k = jax.grad(loss_kern, argnums=(0, 1, 2))(pts, viewdirs, z)
    # d_pts goes through the SAME XLA embed VJP on both sides here, so it
    # is tight — unlike the raw kernel whose in-kernel trig chain carries
    # ~1e-3 relative cancellation noise (see test_gradient_parity)
    tols = {"pts": dict(rtol=2e-4, atol=2e-5),
            "dirs": dict(rtol=1e-4, atol=1e-5),
            "z": dict(rtol=1e-4, atol=1e-5)}
    for a, b, name in zip(g_k, g_ref, ("pts", "dirs", "z")):
        scale = max(float(jnp.abs(b).max()), 1e-3)
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b) / scale,
                                   err_msg=name, **tols[name])


def test_pre_stop_gradient_feature_rule(setup):
    cfg, model, params, spec, _, pts, viewdirs, z = setup
    from nefes_tpu.kernels.fused_render import fused_render_apply_pre
    weights = pack_params(params["fine"], spec, pre_embedded=True)
    xe, de = _embeds(cfg, pts, viewdirs)

    def dz_of(fn):
        def loss(z):
            return jnp.sum(fn(z)["feat"] ** 2)
        return jax.grad(loss)(z)

    dz_ref = dz_of(lambda z: _reference(cfg, model, params, pts,
                                        viewdirs, z))
    dz_k = dz_of(lambda z: fused_render_apply_pre(spec, weights, xe, de,
                                                  z, interpret=True))
    np.testing.assert_allclose(np.asarray(dz_k), np.asarray(dz_ref),
                               rtol=2e-3, atol=2e-4)


def test_render_rays_fused_render_pre_path():
    """render_rays with cfg.fused_render + cfg.fused_pre: coarse pre
    sigma kernel -> PDF sampling -> pre composite-fused fine pass, vs the
    unfused pipeline end-to-end incl. the pose-translation gradient."""
    from nefes_tpu.render.renderer import render_rays

    cfg_m = ModelConfig.tiny()
    model = NeFeSModel(cfg_m)
    params = model.init_variables(jax.random.key(0))["params"]
    pc, pf = model.pack_fused_pre(params)
    k = jax.random.key(1)
    rays_o = jax.random.normal(k, (12, 3)) * 0.1
    rays_d = jax.random.normal(jax.random.key(2), (12, 3))
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    cfg = cfg_m.render_config(n_samples=8, n_importance=8, perturb=False,
                              test_time=True, output_transient=False)

    def unfused(o):
        return render_rays(model.coarse_fn, model.fine_fn, params, params,
                           o, rays_d, 0.1, 4.0, None, cfg)

    fcfg = cfg.__class__(**{**cfg.__dict__, "fused": True,
                            "fused_pre": True, "fused_need_dw": False,
                            "fused_render": True})

    def fused(o):
        return render_rays(
            model.coarse_pre_fn(need_dw=False, interpret=True),
            model.fine_render_pre_fn(interpret=True),
            pc, pf, o, rays_d, 0.1, 4.0, None, fcfg)

    out, fout = unfused(rays_o), fused(rays_o)
    for key in ("rgb", "feat", "disp", "acc", "depth"):
        np.testing.assert_allclose(np.asarray(fout[key]),
                                   np.asarray(out[key]),
                                   rtol=2e-4, atol=2e-5, err_msg=key)

    loss_u = lambda o: jnp.sum(unfused(o)["feat"] ** 2) \
        + jnp.sum(unfused(o)["rgb"] ** 2)
    loss_f = lambda o: jnp.sum(fused(o)["feat"] ** 2) \
        + jnp.sum(fused(o)["rgb"] ** 2)
    gu = np.asarray(jax.grad(loss_u)(rays_o))
    gf = np.asarray(jax.grad(loss_f)(rays_o))
    scale = max(np.abs(gu).max(), 1e-3)
    np.testing.assert_allclose(gf / scale, gu / scale, rtol=3e-3,
                               atol=1e-3)
