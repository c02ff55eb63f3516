"""FusionNet-collapse diagnostics: the failure mode where a conv layer's
ReLUs train fully dead, the fused output degenerates to a constant, and
the refinement DFM gradient is exactly zero (observed in a real harness
run; see train/diagnostics.py). The liveness probe must (a) report ~50%
live activations for a healthy random init, (b) report 0.0 for a dead
layer, and (c) the dead state must indeed zero the pose gradient — the
property that makes silent collapse dangerous."""

import jax
import jax.numpy as jnp
import numpy as np

from nefes_tpu.fields.nerfh_nff import FusionNet
from nefes_tpu.train.diagnostics import fusion_conv_liveness


def _init(key=0, f_dim=8):
    fus = FusionNet(feature_dim=f_dim)
    x = jnp.zeros((1, 12, 16, 3 + f_dim))
    v = fus.init(jax.random.key(key), x)
    return fus, v


def test_textured_scene_has_interior_structure():
    """texture_amp>0 must add real image-space structure INSIDE blob
    regions (what gives VGG features spatial contrast — the flat scene's
    lack of it is what made the constant fusion output optimal), while
    texture_amp=0 stays bit-identical to the historical GT."""
    from nefes_tpu.data.synthetic import make_synthetic_scene
    kw = dict(n_views=1, H=48, W=64, focal=73.6)
    flat = make_synthetic_scene(**kw)
    tex = make_synthetic_scene(texture_amp=0.6, **kw)
    assert np.array_equal(flat.images,
                          make_synthetic_scene(texture_amp=0.0, **kw).images)
    # central-blob interior crop: mean |horizontal gradient|
    def interior_grad(s):
        c = s.images[0][15:33, 22:42].mean(-1)
        return float(np.abs(np.diff(c, axis=1)).mean())
    assert interior_grad(tex) > 3.0 * interior_grad(flat)


def test_healthy_init_is_live():
    fus, v = _init()
    rgb = jax.random.uniform(jax.random.key(1), (12, 16, 3))
    feat = jax.random.normal(jax.random.key(2), (12, 16, 8))
    live = fusion_conv_liveness(v["params"], rgb, feat)
    assert set(live) == {"conv0", "conv1", "conv2"}
    for name, frac in live.items():
        assert 0.05 < frac < 0.95, (name, frac)


def test_dead_layer_detected_and_gradient_dead():
    fus, v = _init()
    # kill conv2: hugely negative bias -> every ReLU output is 0
    p = jax.tree.map(lambda x: x, v["params"])
    p["conv2"]["bias"] = p["conv2"]["bias"] - 1e6
    rgb = jax.random.uniform(jax.random.key(1), (12, 16, 3))
    feat = jax.random.normal(jax.random.key(2), (12, 16, 8))
    live = fusion_conv_liveness(p, rgb, feat)
    assert live["conv2"] == 0.0
    assert live["conv0"] > 0.0  # upstream layers still alive

    # the collapsed fused output must be input-independent => zero grad
    vars_dead = {"params": {"fusion": p},
                 "batch_stats": {"fusion": v["batch_stats"]}}

    def fused_mean(feat_in):
        x = jnp.concatenate([rgb, feat_in], axis=-1)[None]
        out = fus.apply({"params": p,
                         "batch_stats": v["batch_stats"]}, x, train=False)
        return jnp.sum(out ** 2)

    g = jax.grad(fused_mean)(feat)
    assert float(jnp.max(jnp.abs(g))) == 0.0

    # healthy params: the same gradient is nonzero
    g2 = jax.grad(lambda f: jnp.sum(fus.apply(
        v, jnp.concatenate([rgb, f], axis=-1)[None], train=False) ** 2))(feat)
    assert float(jnp.max(jnp.abs(g2))) > 0.0
