"""End-to-end renderer tests on analytic fields and on the real model."""

import jax
import jax.numpy as jnp
import numpy as np

from nefes_tpu.fields import EmbedConfig, NeRFHNFF
from nefes_tpu.render import RenderConfig, render_rays, render_image

TINY = RenderConfig(n_samples=32, n_importance=32,
                    xyz_embed=EmbedConfig(num_freqs=4),
                    dir_embed=EmbedConfig(num_freqs=2))


def analytic_sphere_field(params, xyz_emb, dir_emb=None, sigma_only=False,
                          output_transient=False):
    """Opaque unit sphere at origin, red-ish color; ignores params.
    xyz_emb starts with the raw xyz (include_input=True)."""
    xyz = xyz_emb[..., :3]
    inside = (jnp.linalg.norm(xyz, axis=-1) < 1.0).astype(jnp.float32)
    out = {"static_sigma": inside * 500.0}
    if sigma_only:
        return out
    color = jnp.stack([jnp.ones_like(inside) * 0.8,
                       jnp.ones_like(inside) * 0.2,
                       jnp.ones_like(inside) * 0.1], -1)
    out["static_rgb"] = color
    out["static_feat"] = jnp.ones(xyz.shape[:-1] + (4,)) * inside[..., None]
    return out


def test_sphere_depth_and_color():
    # camera at z=3 looking down -z (OpenGL), sphere radius 1 at origin
    c2w = jnp.asarray([[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, 3.0]])
    cfg = RenderConfig(n_samples=128, n_importance=0, perturb=False,
                       output_transient=False, test_time=True,
                       xyz_embed=EmbedConfig(num_freqs=4),
                       dir_embed=EmbedConfig(num_freqs=2))
    out = render_image(analytic_sphere_field, None, None, None,
                       H=9, W=9, focal=20.0, c2w=c2w, near=0.5, far=5.0,
                       cfg=cfg)
    # central ray hits sphere front at depth 2
    assert abs(float(out["depth"][4, 4]) - 2.0) < 0.1
    np.testing.assert_allclose(np.asarray(out["rgb"][4, 4]),
                               [0.8, 0.2, 0.1], atol=1e-2)
    # corner rays (focal 20, 9px) still hit the sphere — acc ~ 1
    assert float(out["acc"].min()) > 0.9


def _init_models():
    coarse = NeRFHNFF(typ="coarse", depth=2, width=32,
                      in_channels_xyz=TINY.xyz_embed.out_dim,
                      in_channels_dir=TINY.dir_embed.out_dim,
                      feature_dim=8, skips=(1,))
    fine = NeRFHNFF(typ="fine", depth=2, width=32,
                    in_channels_xyz=TINY.xyz_embed.out_dim,
                    in_channels_dir=TINY.dir_embed.out_dim,
                    feature_dim=8, skips=(1,))
    xe = jnp.zeros((1, TINY.xyz_embed.out_dim))
    de = jnp.zeros((1, TINY.dir_embed.out_dim))
    pc = coarse.init(jax.random.key(0), xe, de)
    pf = fine.init(jax.random.key(1), xe, de)
    return coarse, fine, pc, pf


def test_render_rays_train_outputs():
    coarse, fine, pc, pf = _init_models()
    rays_o = jnp.zeros((16, 3))
    rays_d = jnp.concatenate([jnp.zeros((16, 2)), -jnp.ones((16, 1))], -1)
    out = render_rays(coarse.apply, fine.apply, pc, pf, rays_o, rays_d,
                      near=0.5, far=4.0, rng=jax.random.key(2), cfg=TINY)
    assert out["rgb"].shape == (16, 3)
    assert out["feat"].shape == (16, 8)
    assert out["rgb0"].shape == (16, 3)
    assert out["beta"].shape == (16,)
    assert out["transient_sigmas"].shape == (16, 64)  # 32+32 union samples
    assert np.all(np.isfinite(np.asarray(out["rgb"])))


def test_render_rays_test_mode():
    coarse, fine, pc, pf = _init_models()
    rays_o = jnp.zeros((8, 3))
    rays_d = jnp.concatenate([jnp.zeros((8, 2)), -jnp.ones((8, 1))], -1)
    out = render_rays(coarse.apply, fine.apply, pc, pf, rays_o, rays_d,
                      near=0.5, far=4.0, rng=None, cfg=TINY.test())
    assert "rgb0" not in out
    assert out["rgb"].shape == (8, 3)


def test_render_gradients_flow_to_pose():
    """The refinement mode-3 requirement: d(render)/d(pose) exists & finite.
    Gradient flows pose -> rays -> sample points -> MLP -> compositor."""
    from nefes_tpu.geometry import learn_pose, get_rays
    coarse, fine, pc, pf = _init_models()
    init = jnp.asarray([[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, 2.0]])[None]

    def loss(r, t):
        pose = learn_pose(r, t, init)[0, :3, :4]
        ro, rd = get_rays(4, 4, 8.0, pose)
        out = render_rays(coarse.apply, fine.apply, pc, pf,
                          ro.reshape(-1, 3), rd.reshape(-1, 3),
                          near=0.5, far=4.0, rng=None, cfg=TINY.test())
        return jnp.mean(out["feat"] ** 2) + jnp.mean(out["rgb"] ** 2)

    gr, gt = jax.grad(loss, argnums=(0, 1))(jnp.zeros((1, 3)), jnp.zeros((1, 3)))
    assert np.all(np.isfinite(np.asarray(gr)))
    assert np.all(np.isfinite(np.asarray(gt)))
    assert float(jnp.abs(gr).sum() + jnp.abs(gt).sum()) > 0


def test_render_image_blocked_equals_unblocked():
    coarse, fine, pc, pf = _init_models()
    c2w = jnp.asarray([[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, 2.0]])
    kw = dict(H=6, W=8, focal=10.0, c2w=c2w, near=0.5, far=4.0,
              cfg=TINY.test())
    a = render_image(coarse.apply, fine.apply, pc, pf, **kw)
    b = render_image(coarse.apply, fine.apply, pc, pf, block_rays=16, **kw)
    np.testing.assert_allclose(np.asarray(a["rgb"]), np.asarray(b["rgb"]),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(a["feat"]), np.asarray(b["feat"]),
                               atol=1e-5)


def test_render_rays_jits():
    coarse, fine, pc, pf = _init_models()

    @jax.jit
    def go(pc, pf, ro, rd):
        return render_rays(coarse.apply, fine.apply, pc, pf, ro, rd,
                           near=0.5, far=4.0, rng=None, cfg=TINY.test())["rgb"]

    ro = jnp.zeros((4, 3))
    rd = jnp.concatenate([jnp.zeros((4, 2)), -jnp.ones((4, 1))], -1)
    out = go(pc, pf, ro, rd)
    assert out.shape == (4, 3)
