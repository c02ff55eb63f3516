"""Field module tests: shapes, parameter counts vs the reference
architecture, embedder channel order, exposure transform, fusion CNN."""

import jax
import jax.numpy as jnp
import numpy as np

from nefes_tpu.fields import (
    EmbedConfig, embed, cosine_window, NeRFHNFF, ExposureMLP, FusionNet,
    affine_color_transform,
)


def ref_embed_np(x, num_freqs):
    """Transliteration of reference Embedder (nerfh_nff.py:241-270):
    [x, sin(f1 x), cos(f1 x), sin(f2 x), ...], log-sampled bands."""
    outs = [x]
    freqs = 2.0 ** np.linspace(0.0, num_freqs - 1, num_freqs)
    for f in freqs:
        outs.append(np.sin(x * f))
        outs.append(np.cos(x * f))
    return np.concatenate(outs, -1)


def test_embed_matches_reference_order():
    x = np.random.default_rng(0).standard_normal((32, 3)).astype(np.float32)
    for nf in (10, 4):
        cfg = EmbedConfig(num_freqs=nf)
        ours = np.asarray(embed(jnp.asarray(x), cfg))
        ref = ref_embed_np(x, nf)
        assert cfg.out_dim == ref.shape[-1] == 3 + 6 * nf
        np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_embed_window():
    x = jnp.ones((4, 3))
    w = cosine_window(10, epoch=0, epochs_to_full=100)
    out = np.asarray(embed(x, EmbedConfig(num_freqs=10), window=w))
    # epoch 0 -> all windows 0 -> sin/cos channels all zero, input passthrough
    np.testing.assert_allclose(out[:, 3:], 0.0, atol=1e-6)
    np.testing.assert_allclose(out[:, :3], 1.0, atol=0)
    w_full = cosine_window(10, epoch=100, epochs_to_full=100)
    np.testing.assert_allclose(np.asarray(w_full), 1.0, atol=1e-6)


def test_embed_custom_vjp_matches_autodiff():
    """The window=None fast path runs a custom VJP that reuses the
    forward's sin/cos as the derivative pair; an all-ones window takes the
    plain-autodiff formulation of the SAME math — values and gradients
    must agree."""
    x = jnp.asarray(np.random.default_rng(1)
                    .standard_normal((64, 3)).astype(np.float32))
    cfg = EmbedConfig(num_freqs=10)
    ones = jnp.ones(10)

    def loss_fast(x):
        e = embed(x, cfg)
        return jnp.sum(jnp.sin(e * 0.7) * jnp.cos(e))

    def loss_ref(x):
        e = embed(x, cfg, window=ones)
        return jnp.sum(jnp.sin(e * 0.7) * jnp.cos(e))

    np.testing.assert_allclose(np.asarray(embed(x, cfg)),
                               np.asarray(embed(x, cfg, window=ones)),
                               atol=1e-6)
    g_fast = jax.grad(loss_fast)(x)
    g_ref = jax.grad(loss_ref)(x)
    np.testing.assert_allclose(np.asarray(g_fast), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-3)


def _count(params):
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))


def test_coarse_param_count():
    """Param count must match the torch NeRFH_NFF coarse tower exactly
    (D=8, W=128, skip at 4, heads sigma + rgbfeat 131):
      xyz layers: 63*128+128, 3*(128*128+128), (128+63)*128+128, 3*(...)
      final 128*128+128, dir (128+27)*64+64, sigma 128*1+1, rgb 64*131+131.
    """
    m = NeRFHNFF(typ="coarse")
    params = m.init(jax.random.key(0), jnp.zeros((1, 63)), jnp.zeros((1, 27)))
    expected = 0
    expected += 63 * 128 + 128                       # layer 1
    expected += 3 * (128 * 128 + 128)                # layers 2-4
    expected += (128 + 63) * 128 + 128               # layer 5 (skip)
    expected += 3 * (128 * 128 + 128)                # layers 6-8
    expected += 128 * 128 + 128                      # xyz_encoding_final
    expected += (128 + 27) * 64 + 64                 # dir_encoding
    expected += 128 * 1 + 1                          # static_sigma
    expected += 64 * 131 + 131                       # static_rgb (3+128)
    assert _count(params) == expected


def test_fine_heads_and_shapes():
    m = NeRFHNFF(typ="fine")
    x = jnp.zeros((5, 7, 63))
    d = jnp.zeros((5, 7, 27))
    params = m.init(jax.random.key(0), x, d)
    out = m.apply(params, x, d, output_transient=True)
    assert out["static_rgb"].shape == (5, 7, 3)
    assert out["static_feat"].shape == (5, 7, 128)
    assert out["static_sigma"].shape == (5, 7)
    assert out["transient_rgb"].shape == (5, 7, 3)
    assert out["transient_sigma"].shape == (5, 7)
    assert out["transient_beta"].shape == (5, 7)
    # softplus heads are nonnegative; transient rgb sigmoid in [0,1]
    assert float(out["static_sigma"].min()) >= 0
    assert float(out["transient_rgb"].min()) >= 0
    out2 = m.apply(params, x, d, output_transient=False)
    assert "transient_rgb" not in out2


def test_sigma_only_path():
    m = NeRFHNFF(typ="coarse")
    x = jnp.zeros((3, 63))
    params = m.init(jax.random.key(0), x, jnp.zeros((3, 27)))
    out = m.apply(params, x, sigma_only=True)
    assert set(out) == {"static_sigma"}


def test_exposure_affine_transform():
    m = ExposureMLP()
    hist = jnp.asarray(np.random.default_rng(0).uniform(0, 30, (2, 10)),
                       dtype=jnp.float32)
    params = m.init(jax.random.key(0), hist)
    emb = m.apply(params, hist)
    assert emb.shape == (2, 12)
    rgb = jnp.asarray(np.random.default_rng(1).standard_normal((2, 100, 3)),
                      dtype=jnp.float32)
    out = affine_color_transform(emb, rgb)
    assert out.shape == (2, 100, 3)
    assert float(out.min()) >= 0 and float(out.max()) <= 1
    # identity kernel, zero bias -> sigmoid(rgb)
    ident = jnp.asarray(np.concatenate([np.eye(3).ravel(), np.zeros(3)])[None],
                        dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(affine_color_transform(ident, rgb[0:1])),
                               np.asarray(jax.nn.sigmoid(rgb[0:1])), atol=2e-6)


def test_fusion_net_shapes_and_bn():
    m = FusionNet(feature_dim=16)
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (2, 16, 24, 19)),
                    dtype=jnp.float32)
    variables = m.init(jax.random.key(0), x)
    out, mut = m.apply(variables, x, train=True, mutable=["batch_stats"])
    assert out.shape == (2, 16, 24, 16)
    assert "batch_stats" in mut
    out_eval = m.apply(variables, x, train=False)
    assert out_eval.shape == (2, 16, 24, 16)


def test_fusion_net_residual():
    m = FusionNet(feature_dim=16, residual=True, no_bn=True)
    x = jnp.zeros((1, 8, 8, 19))
    variables = m.init(jax.random.key(0), x)
    out = m.apply(variables, x, train=False)
    assert out.shape == (1, 8, 8, 16)
