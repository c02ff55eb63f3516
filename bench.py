"""Benchmark: NeFeS50 per-frame refinement latency on one TPU chip.

Measures BOTH refinement modes at the paper's operational shapes
(BASELINE.md compute envelope; 7-Scenes 240x320 df=2 imagery, tinyscale=4
render -> 60x80 rays, 64 coarse + 64+64 fine samples through the
full-size coarse+fine NeRFH-NFF + exposure MLP + FusionNet):

  * mode 2 (HEADLINE, the paper's DFNet+NeFeS50 table configuration,
    reference DFM_APR_refine.py:84-156): 50 iterations per frame, each a
    full-res DFNet/VGG16 forward, H/4 render, fusion, bicubic upsample of
    rgb+features to 240x320, 10px-crop cosine loss, backward into the APR
    weights — one lax.scan per frame.
  * mode 3 (DFM_pose_refine.py:290-348): same render loop with gradients
    into an SE(3) pose delta.

The reference records no wall-clock (its timer lives at
DFM_APR_refine.py:26-39); `vs_baseline` divides an ESTIMATED 10 s/frame
for the RTX-3090 torch reference (compute-envelope estimate documented in
BASELINE.md; mode 2 is strictly heavier there, so 10 s is conservative
for the headline too; the >=5x north-star means vs_baseline >= 5).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

REFERENCE_FRAME_SEC_ESTIMATE = 10.0  # RTX-3090 torch (estimate; see header)

# 7-Scenes refinement geometry (BASELINE.md): 240x320 df=2 imagery,
# tinyscale=4 render -> 60x80; focal 525.5/2/4
FULL_H, FULL_W = 240, 320
H, W, FOCAL = 60, 80, 525.505 / 2 / 4
NEAR, FAR = 0.0, 4.0
OPT_ITER = 50
FRAMES_TO_TIME = 3


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from nefes_tpu.data.synthetic import look_at_pose
    from nefes_tpu.features.dfnet import DFNet, extract_target_features
    from nefes_tpu.refine import (
        RefineConfig, refine_apr_single, refine_pose_single,
    )
    from nefes_tpu.refine.pose_opt import render_feature_image
    from nefes_tpu.train import ModelConfig, NeFeSModel

    dev = jax.devices()[0]
    cfg = ModelConfig(dtype=jnp.bfloat16)  # MXU-native compute dtype
    model = NeFeSModel(cfg)
    variables = model.init_variables(jax.random.key(0))
    rcfg_render = cfg.render_config(n_samples=64, n_importance=64,
                                    output_transient=False, test_time=True,
                                    perturb=False, remat=False)
    rcfg = RefineConfig(opt_iter=OPT_ITER, lr_r=0.0087, lr_t=0.01)

    hwf = (H, W, FOCAL)
    hist = jnp.zeros(10)
    ws_vec = jnp.asarray([1.0, 1.0, 0.0, 0.0, 0.0])
    pose = jnp.asarray(look_at_pose(np.array([0.0, 0.3, 2.4], np.float32)))

    # ---------------- mode 3 (SE(3) delta) ----------------
    _, target = render_feature_image(model, variables, pose, hist, hwf,
                                     NEAR, FAR, rcfg_render)
    target = jax.lax.stop_gradient(target)

    def run3(p):
        return refine_pose_single(model, variables, p, target, hist,
                                  ws_vec, hwf, NEAR, FAR, rcfg_render, rcfg)

    refined, losses = run3(pose)
    float(losses[-1])  # hard host sync (block_until_ready is unreliable on
    # the experimental remote-TPU platform)

    t0 = time.perf_counter()
    for i in range(FRAMES_TO_TIME):
        # vary inputs each frame so no caching layer can elide work
        refined, losses3 = run3(pose + 1e-4 * (i + 1))
        float(losses3[-1])
    dt3 = (time.perf_counter() - t0) / FRAMES_TO_TIME

    # ---------------- mode 2 (APR weights; the paper headline) -----------
    # APR tower timed in f32 (the reference pins f32 for APR inference,
    # DFM_pose_refine.py:131) AND in bf16 (the TPU-native dtype; converges
    # to the same loss — see runtime/probe_mode2_bf16.py). bf16 is the
    # configuration this framework ships as --apr_compute_dtype bfloat16.
    key_img = jax.random.uniform(jax.random.key(3),
                                 (FULL_H, FULL_W, 3))
    # drop mode-3 device buffers before the mode-2 sections (the
    # experimental remote-TPU runtime has shown persistent slowdowns when
    # stale executables' buffers stay live across sections)
    del refined, target
    mode2 = {}
    losses2 = {}
    for dt_name, dt in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        dfnet = DFNet(output_dim=cfg.feature_dim, dtype=dt)
        dfvars = dfnet.init(jax.random.key(1), key_img[None],
                            upsample_hw=(FULL_H, FULL_W))
        target2 = jax.lax.stop_gradient(extract_target_features(
            dfnet, dfvars, key_img[None], FULL_H, FULL_W)[0])

        def run2(img):
            return refine_apr_single(
                model, variables, dfnet, dfvars, img, target2, hist,
                ws_vec, hwf, (FULL_H, FULL_W, FOCAL * 4), NEAR, FAR,
                rcfg_render, rcfg, svd_reg=True)

        for w in range(2):   # compile + steady-state warmup
            out = run2(jnp.clip(key_img + 1e-5 * w, 0.0, 1.0))
            float(out["losses"][-1])
        t0 = time.perf_counter()
        for i in range(FRAMES_TO_TIME):
            out = run2(jnp.clip(key_img + 1e-4 * (i + 1), 0.0, 1.0))
            float(out["losses"][-1])
        mode2[dt_name] = (time.perf_counter() - t0) / FRAMES_TO_TIME
        losses2[dt_name] = float(np.asarray(out["losses"])[-1])

    # ---------------- training throughput (paper config) -----------------
    from nefes_tpu.train import (
        create_train_state, make_optimizer, train_step_rays,
    )
    tx = make_optimizer()
    state = create_train_state(model, jax.random.key(4), tx)
    tr_cfg = cfg.render_config(n_samples=64, n_importance=64, remat=False)
    Bt, n_rand = 4, 1536
    batch = {
        "rgb": jax.random.uniform(jax.random.key(5), (Bt, H, W, 3)),
        "poses": jnp.broadcast_to(pose, (Bt, 3, 4)),
        "hists": jnp.zeros((Bt, 10)),
        "feat": jax.random.normal(jax.random.key(6),
                                  (Bt, H, W, cfg.feature_dim)),
    }
    state, tl, _ = train_step_rays(model, tr_cfg, tx, state, batch,
                                   jax.random.key(7), jnp.asarray(5e-4),
                                   hwf, NEAR, FAR, n_rand=n_rand, stage=1)
    float(tl)
    t0 = time.perf_counter()
    steps = 8
    for i in range(steps):
        state, tl, _ = train_step_rays(model, tr_cfg, tx, state, batch,
                                       jax.random.key(8 + i),
                                       jnp.asarray(5e-4), hwf, NEAR, FAR,
                                       n_rand=n_rand, stage=1)
    float(tl)
    train_rays_s = Bt * n_rand * steps / (time.perf_counter() - t0)

    best = min(mode2.values())
    result = {
        "metric": "nefes50_apr_refine_per_frame",
        "value": round(best, 4),
        "unit": "s/frame",
        "vs_baseline": round(REFERENCE_FRAME_SEC_ESTIMATE / best, 2),
        "extra": {
            "device": str(dev),
            "mode2_apr_s_per_frame_f32": round(mode2["f32"], 4),
            "mode2_apr_s_per_frame_bf16": round(mode2["bf16"], 4),
            "mode3_pose_s_per_frame": round(dt3, 4),
            "mode3_vs_baseline": round(REFERENCE_FRAME_SEC_ESTIMATE / dt3,
                                       2),
            "rays_per_sec_per_chip_mode3": int(H * W * OPT_ITER / dt3),
            "train_rays_per_sec": int(train_rays_s),
            "render_hw": [H, W],
            "full_hw": [FULL_H, FULL_W],
            "opt_iter": OPT_ITER,
            "samples_per_ray": [64, 128],
            "reference_estimate_s": REFERENCE_FRAME_SEC_ESTIMATE,
            "final_loss_mode3": float(np.asarray(losses3)[-1]),
            "final_loss_mode2_f32": losses2["f32"],
            "final_loss_mode2_bf16": losses2["bf16"],
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
