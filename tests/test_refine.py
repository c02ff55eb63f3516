"""Refinement-engine tests.

The functional gate: with an analytic field standing in for a trained
NeFeS (same forward pipeline), mode-3 refinement must recover a perturbed
camera pose by descending the DFM cosine loss through the renderer.
"""

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nefes_tpu.data.synthetic import blob_field, look_at_pose
from nefes_tpu.fields.embedder import EmbedConfig
from nefes_tpu.geometry import rotation_angle
from nefes_tpu.refine import (
    RefineConfig, feature_cosine_loss, masked_feature_cosine_loss,
    refine_pose_single, refine_poses_batch, render_feature_image,
    apply_verification,
)
from nefes_tpu.render.renderer import RenderConfig


@dataclass(frozen=True)
class AnalyticModel:
    """Duck-typed NeFeSModel whose field is the analytic blob scene —
    exercises the full refinement machinery without training."""

    def coarse_fn(self, params, xyz_emb, dir_emb=None, sigma_only=False,
                  output_transient=False):
        return blob_field(params, xyz_emb, dir_emb, sigma_only)

    fine_fn = coarse_fn

    def apply_exposure(self, params, hist, rgb):
        return jax.nn.sigmoid(rgb)

    def apply_fusion(self, variables, rgb_img, feat_img, train=False,
                     bn_stats="batch"):
        return feat_img, None


CFG = RenderConfig(n_samples=48, n_importance=24, perturb=False,
                   output_transient=False, test_time=True,
                   xyz_embed=EmbedConfig(num_freqs=1),
                   dir_embed=EmbedConfig(num_freqs=1))
HWF = (20, 24, 22.0)
WS_VEC = jnp.asarray([1.0, 1.0, 0.0, 0.0, 0.0])
NEAR, FAR = 0.5, 5.0


def _gt_and_perturbed(seed=0):
    gt = look_at_pose(np.array([0.0, 0.3, 2.4], np.float32))
    rng = np.random.default_rng(seed)
    dr = rng.normal(0, 0.03, 3).astype(np.float32)   # ~2 deg
    dt = rng.normal(0, 0.05, 3).astype(np.float32)   # 5 cm
    from nefes_tpu.geometry import learn_pose
    pert = np.asarray(learn_pose(jnp.asarray(dr), jnp.asarray(dt),
                                 jnp.asarray(gt)))[:3, :4]
    return jnp.asarray(gt), jnp.asarray(pert.astype(np.float32))


def _pose_err(a, b):
    t = float(jnp.linalg.norm(a[:3, 3] - b[:3, 3]))
    r = float(rotation_angle((a[:3, :3] @ b[:3, :3].T)[None])[0])
    return t, r


def test_cosine_loss_matches_torch_semantics():
    rng = np.random.default_rng(0)
    fr = rng.standard_normal((6, 8, 16)).astype(np.float32)
    ft = rng.standard_normal((6, 8, 16)).astype(np.float32)
    # reference: reshape to (C, H*W), cosine along dim=1, 1 - mean
    frr = fr.reshape(-1, 16).T  # (C, HW)
    ftt = ft.reshape(-1, 16).T
    cos = (frr * ftt).sum(1) / (np.linalg.norm(frr, axis=1)
                                * np.linalg.norm(ftt, axis=1))
    expected = 1.0 - cos.mean()
    ours = float(feature_cosine_loss(jnp.asarray(fr), jnp.asarray(ft)))
    assert ours == pytest.approx(expected, abs=1e-5)
    # identical features -> loss 0
    assert float(feature_cosine_loss(jnp.asarray(fr), jnp.asarray(fr))) \
        == pytest.approx(0.0, abs=1e-6)


def test_masked_cosine_loss():
    rng = np.random.default_rng(1)
    fr = rng.standard_normal((4, 4, 8)).astype(np.float32)
    ft = fr.copy()
    ft[0, 0] = -ft[0, 0] * 3  # corrupt one pixel
    mask = np.ones((4, 4), np.float32)
    full = float(masked_feature_cosine_loss(jnp.asarray(fr), jnp.asarray(ft),
                                            jnp.asarray(mask)))
    mask[0, 0] = 0.0  # mask out the corrupted pixel
    masked = float(masked_feature_cosine_loss(jnp.asarray(fr), jnp.asarray(ft),
                                              jnp.asarray(mask)))
    assert masked < full
    assert masked == pytest.approx(0.0, abs=1e-5)


def test_mode3_recovers_perturbed_pose():
    model = AnalyticModel()
    variables = {"params": {}}
    gt, pert = _gt_and_perturbed()
    hist = jnp.zeros(10)
    _, target_feat = render_feature_image(model, variables, gt, hist, HWF,
                                          NEAR, FAR, CFG)
    rcfg = RefineConfig(opt_iter=50, lr_r=0.001, lr_t=0.001, per_pixel=True)
    t0, r0 = _pose_err(pert, gt)
    refined, losses = refine_pose_single(
        model, variables, pert, jax.lax.stop_gradient(target_feat), hist,
        WS_VEC, HWF, NEAR, FAR, CFG, rcfg)
    t1, r1 = _pose_err(refined, gt)
    assert np.isfinite(np.asarray(losses)).all()
    assert float(losses[-1]) < float(losses[0])
    assert t1 < t0, (t0, t1)
    assert r1 < 0.6 * r0, (r0, r1)


def test_mode3_batch_vmap():
    model = AnalyticModel()
    variables = {"params": {}}
    gt, pert = _gt_and_perturbed()
    gt2, pert2 = _gt_and_perturbed(seed=3)
    hists = jnp.zeros((2, 10))
    feats = []
    for g in (gt, gt2):
        _, f = render_feature_image(model, variables, g, hists[0], HWF,
                                    NEAR, FAR, CFG)
        feats.append(f)
    from nefes_tpu.geometry.transforms import WorldSetup
    ws = WorldSetup(near=NEAR, far=FAR, pose_scale=1.0, pose_scale2=1.0,
                    move_all_cam_vec=(0.0, 0.0, 0.0))
    rcfg = RefineConfig(opt_iter=5, lr_r=0.005, lr_t=0.005)
    refined, losses = refine_poses_batch(
        model, variables, jnp.stack([pert, pert2]),
        jax.lax.stop_gradient(jnp.stack(feats)), hists, ws, HWF, CFG, rcfg)
    assert refined.shape == (2, 3, 4)
    assert losses.shape == (2, 5)
    assert np.isfinite(np.asarray(losses)).all()

    # the one-launch serving scan (cli/refine.py scan_frames) must refine
    # each frame identically to the vmapped path — serial lax.scan vs
    # vmap is pure execution-order choice, not semantics
    from nefes_tpu.refine.pose_opt import refine_poses_scanned
    scanned = refine_poses_scanned(
        model, variables, jnp.stack([pert, pert2]),
        jax.lax.stop_gradient(jnp.stack(feats)), hists, ws, HWF, CFG, rcfg)
    np.testing.assert_allclose(np.asarray(scanned), np.asarray(refined),
                               rtol=1e-4, atol=1e-5)

    # the traced-index serving launch (cli/refine.py device-resident fast
    # path) must emit the same refined pose per frame
    from nefes_tpu.refine.pose_opt import refine_pose_indexed
    for i in range(2):
        indexed = refine_pose_indexed(
            model, variables, jnp.stack([pert, pert2]),
            jax.lax.stop_gradient(jnp.stack(feats)), hists, i,
            WS_VEC, HWF, NEAR, FAR, CFG, rcfg)
        np.testing.assert_allclose(np.asarray(indexed),
                                   np.asarray(refined[i]),
                                   rtol=1e-4, atol=1e-5)


def test_mode2_apr_refinement_smoke():
    """Mode-2 (APR-weight) loop end-to-end with a real DFNet on a small
    image + analytic field: runs, finite, produces both poses + metrics."""
    from nefes_tpu.features.dfnet import DFNet, extract_target_features
    from nefes_tpu.refine import refine_apr_single

    model = AnalyticModel()
    variables = {"params": {}}
    dfnet = DFNet()
    rng = np.random.default_rng(7)
    image = jnp.asarray(rng.uniform(0, 1, (48, 64, 3)).astype(np.float32))
    dfnet_vars = dfnet.init(jax.random.key(0), image[None])
    dfnet_vars = {"params": dfnet_vars["params"],
                  "batch_stats": dfnet_vars["batch_stats"]}
    # slice DFNet's 128-ch target to the analytic field's 8 feature chans
    target_feat = extract_target_features(dfnet, dfnet_vars, image[None],
                                          48, 64)[0][..., :8]
    rcfg = RefineConfig(opt_iter=2, learning_rate=1e-5)
    out = refine_apr_single(
        model, variables, dfnet, dfnet_vars, image,
        jax.lax.stop_gradient(target_feat), jnp.zeros(10), WS_VEC,
        (12, 16, 22.0 / 4), (48, 64, 22.0), NEAR, FAR, CFG, rcfg)
    assert out["refined_pose"].shape == (3, 4)
    assert np.isfinite(np.asarray(out["losses"])).all()
    assert np.isfinite(float(out["init_psnr"]))
    # refined differs from initial (gradient actually flowed into the APR)
    assert not np.allclose(np.asarray(out["refined_pose"]),
                           np.asarray(out["initial_pose"]))
    final = apply_verification(out)
    assert final.shape == (3, 4)


def test_verification_retreat_logic():
    good = {"refined_pose": jnp.ones((3, 4)), "initial_pose": jnp.zeros((3, 4)),
            "init_psnr": jnp.asarray(10.0), "end_psnr": jnp.asarray(15.0),
            "init_ssim": jnp.asarray(0.5), "end_ssim": jnp.asarray(0.7)}
    np.testing.assert_allclose(np.asarray(apply_verification(good)), 1.0)
    bad_psnr = {**good, "end_psnr": jnp.asarray(5.0)}
    np.testing.assert_allclose(np.asarray(apply_verification(bad_psnr)), 0.0)
    bad_ssim = {**good, "end_ssim": jnp.asarray(0.2)}
    np.testing.assert_allclose(np.asarray(apply_verification(bad_ssim)), 0.0)


def test_verification_metric_variants():
    base = {"refined_pose": jnp.ones((3, 4)), "initial_pose": jnp.zeros((3, 4)),
            "init_psnr": jnp.asarray(10.0), "end_psnr": jnp.asarray(15.0),
            "init_ssim": jnp.asarray(0.5), "end_ssim": jnp.asarray(0.7),
            "losses": jnp.asarray([0.5, 0.4, 0.3])}
    # DFM loss improved -> keep, regardless of metric
    for m in ("psnr_ssim", "dfm", "either"):
        np.testing.assert_allclose(
            np.asarray(apply_verification(base, m)), 1.0)
    # DFM loss degraded but PSNR/SSIM fine: only dfm/either retreat —
    # the reference's proxy (psnr_ssim) misses it by construction
    worse_dfm = {**base, "losses": jnp.asarray([0.3, 0.4, 0.5])}
    np.testing.assert_allclose(
        np.asarray(apply_verification(worse_dfm, "psnr_ssim")), 1.0)
    np.testing.assert_allclose(
        np.asarray(apply_verification(worse_dfm, "dfm")), 0.0)
    np.testing.assert_allclose(
        np.asarray(apply_verification(worse_dfm, "either")), 0.0)
    # PSNR degraded but DFM improved: psnr_ssim/either retreat, dfm keeps
    worse_psnr = {**base, "end_psnr": jnp.asarray(5.0)}
    np.testing.assert_allclose(
        np.asarray(apply_verification(worse_psnr, "dfm")), 1.0)
    np.testing.assert_allclose(
        np.asarray(apply_verification(worse_psnr, "either")), 0.0)
    # batched results broadcast per-frame
    batched = {
        "refined_pose": jnp.ones((2, 3, 4)),
        "initial_pose": jnp.zeros((2, 3, 4)),
        "init_psnr": jnp.asarray([10.0, 10.0]),
        "end_psnr": jnp.asarray([15.0, 15.0]),
        "init_ssim": jnp.asarray([0.5, 0.5]),
        "end_ssim": jnp.asarray([0.7, 0.7]),
        "losses": jnp.asarray([[0.5, 0.3], [0.3, 0.5]]),
    }
    got = np.asarray(apply_verification(batched, "dfm"))
    np.testing.assert_allclose(got[0], 1.0)
    np.testing.assert_allclose(got[1], 0.0)
