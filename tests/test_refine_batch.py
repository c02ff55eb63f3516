"""Batched mode-2 refinement == per-frame refinement (the vmap carries
independent APR-weight optimisations; reference runs frames serially,
DFM_APR_refine.py:204)."""

import jax
import jax.numpy as jnp
import numpy as np

from nefes_tpu.features.dfnet import DFNet
from nefes_tpu.refine import (
    RefineConfig, apply_verification, refine_apr_batch, refine_apr_single,
)
from nefes_tpu.train.model import ModelConfig, NeFeSModel

# >=32 px per side (the DFNet pose head's five maxpools) and > the 10-px
# DFM border crop
HW = (32, 48)


def test_batched_mode2_matches_serial():
    cfg = ModelConfig.tiny()
    model = NeFeSModel(cfg)
    variables = model.init_variables(jax.random.key(0))
    dfnet = DFNet(output_dim=cfg.feature_dim)
    dfvars = dfnet.init(jax.random.key(1), jnp.zeros((1, *HW, 3)),
                        upsample_hw=HW)
    # seed the pose head with a well-conditioned pose: a random-init head
    # emits a near-zero 3x3 whose SVD factors (svd_reg) are numerically
    # unstable — vmap-vs-serial float drift would flip the orthogonalised
    # rotation entirely and the parity check would measure conditioning,
    # not correctness
    dfvars["params"]["fc_pose"]["bias"] = jnp.asarray(
        [1, 0, 0, 0.0, 0, 1, 0, 0.3, 0, 0, 1, 1.2], jnp.float32)
    rng = np.random.default_rng(0)
    B = 2
    images = jnp.asarray(rng.uniform(size=(B, *HW, 3)).astype(np.float32))
    targets = jnp.asarray(rng.normal(
        size=(B, *HW, cfg.feature_dim)).astype(np.float32))
    hists = jnp.zeros((B, 10))
    ws_vec = jnp.asarray([1.0, 1.0, 0.0, 0.0, 0.0])
    rc = cfg.render_config(n_samples=4, n_importance=4, perturb=False,
                           output_transient=False).test()
    # running-average BN: this gate measures vmap==serial lowering parity,
    # and the default per-render batch statistics divide by a near-zero
    # variance on this tiny random-init scene, amplifying benign
    # reduction-order drift past any meaningful tolerance
    rcfg = RefineConfig(opt_iter=2, learning_rate=1e-4, fusion="running")
    args = (ws_vec, (6, 8, 6.0), (*HW, 24.0), 0.3, 4.0, rc, rcfg)

    singles = [refine_apr_single(model, variables, dfnet, dfvars,
                                 images[i], targets[i], hists[i], *args)
               for i in range(B)]
    batched = refine_apr_batch(model, variables, dfnet, dfvars, images,
                               targets, hists, *args)

    # tolerance: the compositor contracts heads with an einsum
    # (render/compositor.py:_contract) whose batched (vmap) lowering may
    # reduce in a different order than the serial one; ~1e-4 of drift
    # amplified through two Adam steps + SVD orthogonalisation is float
    # noise, not a correctness gap
    for i in range(B):
        np.testing.assert_allclose(
            np.asarray(batched["refined_pose"][i]),
            np.asarray(singles[i]["refined_pose"]), rtol=1e-3, atol=5e-4)
        np.testing.assert_allclose(
            np.asarray(batched["losses"][i]),
            np.asarray(singles[i]["losses"]), rtol=1e-3, atol=5e-4)

    verified = apply_verification(batched)
    assert verified.shape == (B, 3, 4)

    # the one-launch serving scan (cli/refine.py scan_frames > 1) must
    # emit the same verified poses as the per-frame verified launch —
    # including a padded tail index that repeats the last frame, the
    # shape trick the CLI uses to keep one compiled executable
    from nefes_tpu.refine.apr_opt import (
        refine_apr_verified, refine_apr_verified_scanned,
    )
    idxs = jnp.asarray([0, 1, 1], jnp.int32)  # G=3 scan over B=2 frames
    scanned = refine_apr_verified_scanned(
        model, variables, dfnet, dfvars, images, targets, hists,
        idxs, idxs, *args)
    per_frame = [refine_apr_verified(model, variables, dfnet, dfvars,
                                     images, targets, hists, i, i, *args)
                 for i in (0, 1)]
    assert scanned.shape == (3, 3, 4)
    for g, i in ((0, 0), (1, 1), (2, 1)):
        np.testing.assert_allclose(np.asarray(scanned[g]),
                                   np.asarray(per_frame[i]),
                                   rtol=1e-3, atol=5e-4)


def test_apr_poses_batched_matches_serial_and_caches():
    """Batched jitted APR init == per-image forward, and repeat calls
    (fresh-but-equal weights, as across CLI invocations in one process)
    reuse the SAME compiled executable — the per-invocation jit(vmap)
    wrapper it replaces retraced VGG16 every call (22.3 s of the 16-frame
    mode-3 serving fixture, BENCH r5)."""
    from nefes_tpu.refine.apr_opt import apr_pose_any, apr_poses_batched

    cfg = ModelConfig.tiny()
    dfnet = DFNet(output_dim=cfg.feature_dim)
    dfvars = dfnet.init(jax.random.key(1), jnp.zeros((1, *HW, 3)),
                        upsample_hw=HW)
    dfvars["params"]["fc_pose"]["bias"] = jnp.asarray(
        [1, 0, 0, 0.0, 0, 1, 0, 0.3, 0, 0, 1, 1.2], jnp.float32)
    rng = np.random.default_rng(1)
    images = jnp.asarray(rng.uniform(size=(3, *HW, 3)).astype(np.float32))

    batched = apr_poses_batched("DFNet", dfnet, dfvars, images)
    assert batched.shape == (3, 3, 4)
    for i in range(3):
        np.testing.assert_allclose(
            np.asarray(batched[i]),
            np.asarray(apr_pose_any("DFNet", dfnet, dfvars, images[i])),
            rtol=1e-5, atol=1e-5)

    size0 = apr_poses_batched._cache_size()
    dfvars2 = jax.tree.map(jnp.array, dfvars)      # fresh, equal arrays
    dfnet2 = DFNet(output_dim=cfg.feature_dim)     # fresh, equal module
    apr_poses_batched("DFNet", dfnet2, dfvars2, jnp.array(images))
    assert apr_poses_batched._cache_size() == size0
