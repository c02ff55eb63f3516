"""sample_pdf / stratified sampling parity with the reference algorithm.

The reference keeps a seeded-numpy hook (`sample_pdf(pytest=True)`,
rendering.py:38-47) precisely for this kind of test; we use the same trick:
inject identical uniforms into both a numpy transliteration of the torch
code and our jnp implementation and require bit-level agreement.
"""

import jax.numpy as jnp
import numpy as np

from nefes_tpu.render import sample_pdf, stratified_samples, hierarchical_samples


def reference_sample_pdf_np(bins, weights, u):
    """Direct numpy transliteration of reference rendering.py:23-66."""
    weights = weights + 1e-5
    pdf = weights / weights.sum(-1, keepdims=True)
    cdf = np.cumsum(pdf, -1)
    cdf = np.concatenate([np.zeros_like(cdf[..., :1]), cdf], -1)
    inds = np.stack([np.searchsorted(cdf[i], u[i], side="right")
                     for i in range(len(cdf))])
    below = np.maximum(0, inds - 1)
    above = np.minimum(cdf.shape[-1] - 1, inds)
    cdf_b = np.take_along_axis(cdf, below, -1)
    cdf_a = np.take_along_axis(cdf, above, -1)
    bins_b = np.take_along_axis(bins, below, -1)
    bins_a = np.take_along_axis(bins, above, -1)
    denom = cdf_a - cdf_b
    denom = np.where(denom < 1e-5, 1.0, denom)
    t = (u - cdf_b) / denom
    return bins_b + t * (bins_a - bins_b)


def test_sample_pdf_matches_reference_algorithm():
    rng = np.random.default_rng(0)
    R, B, N = 16, 63, 64
    bins = np.sort(rng.uniform(0, 4, (R, B + 1)).astype(np.float32), axis=-1)
    weights = rng.uniform(0, 1, (R, B)).astype(np.float32)
    u = rng.uniform(0, 1, (R, N)).astype(np.float32)
    ref = reference_sample_pdf_np(bins, weights, u)
    ours = np.asarray(sample_pdf(None, jnp.asarray(bins), jnp.asarray(weights),
                                 N, u_override=jnp.asarray(u)))
    # f32 cumsum association differs slightly between np and XLA
    np.testing.assert_allclose(ours, ref, atol=5e-5)


def test_sample_pdf_det_linspace():
    bins = jnp.linspace(0, 1, 11)[None].repeat(4, 0)
    weights = jnp.ones((4, 10))
    out = np.asarray(sample_pdf(None, bins, weights, 8, det=True))
    assert out.shape == (4, 8)
    # uniform weights + det u -> samples spread linearly over [0, 1]
    np.testing.assert_allclose(out[:, 0], 0.0, atol=1e-4)
    np.testing.assert_allclose(out[:, -1], 1.0, atol=1e-4)
    assert np.all(np.diff(out, axis=-1) > 0)


def test_sample_pdf_concentrates_on_peak():
    rng_np = np.random.default_rng(1)
    bins = jnp.linspace(0, 1, 65)[None].repeat(8, 0)
    w = np.full((8, 64), 1e-4, np.float32)
    w[:, 30:34] = 10.0  # peak near z=0.5
    u = rng_np.uniform(0, 1, (8, 64)).astype(np.float32)
    out = np.asarray(sample_pdf(None, bins, jnp.asarray(w), 64,
                                u_override=jnp.asarray(u)))
    assert np.median(out) > 0.4 and np.median(out) < 0.6


def test_stratified_bounds_and_monotonic():
    import jax
    z = np.asarray(stratified_samples(jax.random.key(0), 32, 64, 0.5, 4.0,
                                      perturb=True))
    assert z.shape == (32, 64)
    assert z.min() >= 0.5 - 1e-5 and z.max() <= 4.0 + 1e-5
    assert np.all(np.diff(z, axis=-1) > 0)
    z_det = np.asarray(stratified_samples(None, 4, 8, 1.0, 2.0, perturb=False))
    np.testing.assert_allclose(z_det[0], np.linspace(1, 2, 8), atol=1e-6)


def test_stratified_lindisp():
    z = np.asarray(stratified_samples(None, 2, 5, 1.0, 4.0, lindisp=True,
                                      perturb=False))
    np.testing.assert_allclose(1.0 / z[0], np.linspace(1.0, 0.25, 5), atol=1e-6)


def test_hierarchical_union_sorted():
    import jax
    z = stratified_samples(None, 8, 64, 0.0, 4.0, perturb=False)
    w = jnp.ones((8, 64))
    z2 = np.asarray(hierarchical_samples(jax.random.key(1), z, w, 64))
    assert z2.shape == (8, 128)
    assert np.all(np.diff(z2, axis=-1) >= 0)
