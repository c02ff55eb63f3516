"""Benchmark: NeFeS50 per-frame refinement latency on one TPU chip.

Measures the paper's operational hot path (BASELINE.md compute envelope):
50 DFM iterations per frame, each rendering a full H/4 x W/4 image
(7-Scenes: 60x80 = 4800 rays) x (64 coarse + 64+64 fine samples) through
the full-size coarse+fine NeRFH-NFF (D=8, W=128, 128-D features) +
exposure MLP + FusionNet, with gradients into an SE(3) pose delta — i.e.
mode-3 refinement (`refine_pose_single`), the whole loop one lax.scan.

The reference records no wall-clock (its timer lives at
DFM_APR_refine.py:26-39); `vs_baseline` is measured against an ESTIMATED
10 s/frame for the RTX-3090 torch reference (compute-envelope estimate:
~56 TFLOP/frame incl. backward, chunked python dispatch, AMP off for the
nerfh_nff path — documented in BASELINE.md; the ≥5x north-star means
vs_baseline ≥ 5).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

REFERENCE_FRAME_SEC_ESTIMATE = 10.0  # RTX-3090 torch (estimate; see header)

# 7-Scenes refinement geometry (BASELINE.md): 240x320 df=2 imagery,
# tinyscale=4 render -> 60x80; focal 525.5/2/4
H, W, FOCAL = 60, 80, 525.505 / 2 / 4
NEAR, FAR = 0.0, 4.0
OPT_ITER = 50
FRAMES_TO_TIME = 3


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from nefes_tpu.data.synthetic import look_at_pose
    from nefes_tpu.refine import RefineConfig, refine_pose_single
    from nefes_tpu.refine.pose_opt import render_feature_image
    from nefes_tpu.train import ModelConfig, NeFeSModel

    dev = jax.devices()[0]
    cfg = ModelConfig(dtype=jnp.bfloat16)  # MXU-native compute dtype
    model = NeFeSModel(cfg)
    variables = model.init_variables(jax.random.key(0))
    rcfg_render = cfg.render_config(n_samples=64, n_importance=64,
                                    output_transient=False, test_time=True,
                                    perturb=False)
    rcfg = RefineConfig(opt_iter=OPT_ITER, lr_r=0.0087, lr_t=0.01)

    hwf = (H, W, FOCAL)
    hist = jnp.zeros(10)
    ws_vec = jnp.asarray([1.0, 1.0, 0.0, 0.0, 0.0])
    pose = jnp.asarray(look_at_pose(np.array([0.0, 0.3, 2.4], np.float32)))
    # target features from the model itself (shapes/perf identical to real)
    _, target = render_feature_image(model, variables, pose, hist, hwf,
                                     NEAR, FAR, rcfg_render)
    target = jax.lax.stop_gradient(target)

    def run(p):
        return refine_pose_single(model, variables, p, target, hist,
                                  ws_vec, hwf, NEAR, FAR, rcfg_render, rcfg)

    # warmup/compile
    refined, losses = run(pose)
    jax.block_until_ready((refined, losses))
    float(losses[-1])  # force full host sync (block_until_ready alone has
    # proven unreliable on the experimental remote-TPU platform)

    t0 = time.perf_counter()
    acc = 0.0
    for i in range(FRAMES_TO_TIME):
        # vary the input each frame so no caching layer can elide work
        refined, losses = run(pose + 1e-4 * (i + 1))
        acc += float(losses[-1])  # device->host transfer = hard sync
    dt = (time.perf_counter() - t0) / FRAMES_TO_TIME

    rays_per_sec = H * W * OPT_ITER / dt
    result = {
        "metric": "nefes50_refine_latency",
        "value": round(dt, 4),
        "unit": "s/frame",
        "vs_baseline": round(REFERENCE_FRAME_SEC_ESTIMATE / dt, 2),
        "extra": {
            "device": str(dev),
            "rays_per_sec_per_chip": int(rays_per_sec),
            "render_hw": [H, W],
            "opt_iter": OPT_ITER,
            "samples_per_ray": [64, 128],
            "reference_estimate_s": REFERENCE_FRAME_SEC_ESTIMATE,
            "final_loss": float(np.asarray(losses)[-1]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
