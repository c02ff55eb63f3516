"""Aux-loss zoo semantics tests vs in-test torch twins
(reference script/models/losses.py:175-366)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from nefes_tpu.train.aux_losses import (
    compute_depth_loss, compute_smooth_loss, depth_loss_dpt,
    embeddings_l1_loss, sigma_sparsity_loss, sigma_sparsity_loss2,
    total_variation_loss,
)


def test_compute_depth_loss_matches_torch():
    rng = np.random.default_rng(0)
    pred = rng.uniform(0.1, 5.0, (37,)).astype(np.float32)
    gt = rng.uniform(0.1, 5.0, (37,)).astype(np.float32)

    tp, tg = torch.tensor(pred), torch.tensor(gt)
    t_pred = torch.median(tp)
    s_pred = torch.mean(torch.abs(tp - t_pred))
    t_gt = torch.median(tg)
    s_gt = torch.mean(torch.abs(tg - t_gt))
    want = torch.mean(((tp - t_pred) / s_pred - (tg - t_gt) / s_gt) ** 2)

    got = compute_depth_loss(jnp.asarray(pred), jnp.asarray(gt))
    # torch.median picks the lower middle element; jnp.median averages the
    # two middles — use odd length so they agree exactly
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)


def test_depth_loss_dpt_weighted():
    rng = np.random.default_rng(1)
    pred = rng.uniform(0.1, 5.0, (9, 9)).astype(np.float32)
    gt = pred * 3.0 + 2.0   # scale/shift invariant -> ~0
    w = rng.uniform(size=(9, 9)).astype(np.float32)
    assert float(depth_loss_dpt(jnp.asarray(pred), jnp.asarray(gt),
                                jnp.asarray(w))) < 1e-8
    assert float(depth_loss_dpt(jnp.asarray(pred),
                                jnp.asarray(gt[::-1]))) > 1e-3


def test_sigma_sparsity_losses_match_torch():
    rng = np.random.default_rng(2)
    s = rng.uniform(0, 3, (5, 11)).astype(np.float32)
    want = torch.log(1.0 + 2 * torch.tensor(s) ** 2).sum(dim=-1)
    got = sigma_sparsity_loss(jnp.asarray(s))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=1e-5)
    np.testing.assert_allclose(
        float(sigma_sparsity_loss2(jnp.asarray(s))),
        float(0.01 * torch.tensor(s).mean()), rtol=1e-6)


def test_smooth_loss_matches_torch():
    rng = np.random.default_rng(3)
    depth = rng.uniform(0.5, 2.0, (2, 8, 10, 1)).astype(np.float32)
    img = rng.uniform(size=(2, 8, 10, 3)).astype(np.float32)

    # torch twin (NCHW, reference losses.py:316-341)
    disp = torch.tensor(depth).permute(0, 3, 1, 2)
    tim = torch.tensor(img).permute(0, 3, 1, 2)
    mean_disp = disp.mean(2, True).mean(3, True)
    nd = disp / (mean_disp + 1e-7)
    gdx = torch.abs(nd[:, :, :, :-1] - nd[:, :, :, 1:])
    gdy = torch.abs(nd[:, :, :-1, :] - nd[:, :, 1:, :])
    gix = torch.mean(torch.abs(tim[:, :, :, :-1] - tim[:, :, :, 1:]), 1,
                     keepdim=True)
    giy = torch.mean(torch.abs(tim[:, :, :-1, :] - tim[:, :, 1:, :]), 1,
                     keepdim=True)
    want = (gdx * torch.exp(-gix)).mean() + (gdy * torch.exp(-giy)).mean()

    got = compute_smooth_loss(jnp.asarray(depth), jnp.asarray(img))
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)


def test_tv_loss_on_analytic_density():
    # a smooth density must have (much) lower TV than a noisy one
    smooth = lambda x: jnp.sum(x, axis=-1)
    key = jax.random.key(0)
    noisy = lambda x: jax.random.uniform(
        jax.random.fold_in(key, 1), (x.shape[0],)) * 50.0
    res = (40, 30, 40)
    tv_smooth = float(total_variation_loss(jax.random.key(1), smooth,
                                           smooth, res))
    tv_noisy = float(total_variation_loss(jax.random.key(1), noisy, noisy,
                                          res))
    assert np.isfinite(tv_smooth) and np.isfinite(tv_noisy)
    assert tv_smooth < tv_noisy


def test_embeddings_l1_on_hashgrid_field():
    from nefes_tpu.fields.hashgrid import HashGridEncoding
    enc = HashGridEncoding(n_levels=4, log2_table_size=8,
                           base_resolution=4, max_resolution=32)
    params = enc.init(jax.random.key(0), jnp.zeros((1, 3)))
    fn = lambda x: enc.apply(params, x)
    loss = float(embeddings_l1_loss(fn, fn))
    want = 2.0  # two encoders
    assert loss > 0.0
    # mean |emb| of uniform-initialised table entries is small
    assert loss < want
