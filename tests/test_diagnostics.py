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
