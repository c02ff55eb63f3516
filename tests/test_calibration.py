"""Fusion trailing-BN calibration (train/calibration.py).

The closed-form affine must (a) realize the least-squares per-channel map
pre_bn -> target exactly under "running" statistics, (b) approximately
under "batch" statistics on inputs drawn from the calibration
distribution, and (c) never increase the L1 fusion error on the
calibration views.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nefes_tpu.train import ModelConfig, NeFeSModel, calibrate_fusion_bn
from nefes_tpu.train.calibration import fusion_pre_bn


@pytest.fixture(scope="module")
def model_and_vars():
    cfg = ModelConfig(depth=2, width=32, feature_dim=16)
    model = NeFeSModel(cfg)
    variables = model.init_variables(jax.random.key(0))
    return model, variables


def _inputs(key, n=3, h=10, w=12, fdim=16):
    k1, k2, k3 = jax.random.split(key, 3)
    rgb = jax.random.uniform(k1, (n, h, w, 3))
    raw = jax.random.normal(k2, (n, h, w, fdim))
    return rgb, raw, k3


def test_running_mode_realizes_the_affine_exactly(model_and_vars):
    model, variables = model_and_vars
    rgb, raw, k = _inputs(jax.random.key(1))
    pre = fusion_pre_bn(model, variables, rgb, raw)
    # target = known affine of pre + noise: the LSQ fit must recover it
    a_true = jnp.linspace(0.5, 2.0, pre.shape[-1])
    b_true = jnp.linspace(-1.0, 1.0, pre.shape[-1])
    tgt = pre * a_true + b_true + 0.01 * jax.random.normal(k, pre.shape)

    new_vars, stats = calibrate_fusion_bn(model, variables, rgb, raw, tgt)
    fused_run, _ = model.apply_fusion(new_vars, rgb, raw,
                                      bn_stats="running")
    want = pre * a_true + b_true
    assert float(jnp.max(jnp.abs(fused_run - want))) < 0.05
    assert stats["corr_median"] > 0.99


def test_batch_mode_close_on_calibration_distribution(model_and_vars):
    model, variables = model_and_vars
    rgb, raw, k = _inputs(jax.random.key(2), n=4)
    pre = fusion_pre_bn(model, variables, rgb, raw)
    tgt = pre * 1.3 - 0.4

    new_vars, _ = calibrate_fusion_bn(model, variables, rgb, raw, tgt)
    # a FRESH draw from the same distribution: per-image batch stats are
    # close to (not identical to) the calibration population stats
    rgb2, raw2, _ = _inputs(jax.random.key(3), n=1)
    pre2 = fusion_pre_bn(model, variables, rgb2, raw2)
    fused_b, _ = model.apply_fusion(new_vars, rgb2, raw2,
                                    bn_stats="batch")
    want = pre2 * 1.3 - 0.4
    denom = float(jnp.mean(jnp.abs(want))) + 1e-6
    rel = float(jnp.mean(jnp.abs(fused_b - want))) / denom
    assert rel < 0.25


def test_calibration_never_hurts_l1_on_calib_views(model_and_vars):
    model, variables = model_and_vars
    rgb, raw, k = _inputs(jax.random.key(4))
    tgt = jax.random.normal(k, raw.shape) * 2.0 + 1.5

    fused0, _ = model.apply_fusion(variables, rgb, raw, bn_stats="batch")
    l1_before = float(jnp.mean(jnp.abs(fused0 - tgt)))
    new_vars, stats = calibrate_fusion_bn(model, variables, rgb, raw, tgt)
    fused1, _ = model.apply_fusion(new_vars, rgb, raw, bn_stats="running")
    l1_after = float(jnp.mean(jnp.abs(fused1 - tgt)))
    assert l1_after <= l1_before + 1e-6
    assert stats["l1_post"] == pytest.approx(l1_after, rel=0.05)


def test_non_bn_params_and_other_subtrees_untouched(model_and_vars):
    model, variables = model_and_vars
    rgb, raw, k = _inputs(jax.random.key(5))
    tgt = jax.random.normal(k, raw.shape)
    new_vars, _ = calibrate_fusion_bn(model, variables, rgb, raw, tgt)
    for key in variables["params"]:
        if key == "fusion":
            continue
        assert variables["params"][key] is new_vars["params"][key]
    for conv in ("conv0", "conv1", "conv2", "conv3"):
        old = variables["params"]["fusion"][conv]["kernel"]
        new = new_vars["params"]["fusion"][conv]["kernel"]
        np.testing.assert_array_equal(np.asarray(old), np.asarray(new))
