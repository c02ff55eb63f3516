"""Does a bf16 APR tower speed up mode-2 refinement? (The reference pins
the APR forward to f32, DFM_pose_refine.py:131; TPU-first says bf16.)"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from nefes_tpu.data.synthetic import look_at_pose
from nefes_tpu.features.dfnet import DFNet, extract_target_features
from nefes_tpu.refine import RefineConfig, refine_apr_single
from nefes_tpu.train import ModelConfig, NeFeSModel

FULL_H, FULL_W = 240, 320
H, W, FOCAL = 60, 80, 525.505 / 2 / 4


def main():
    cfg = ModelConfig(dtype=jnp.bfloat16)
    model = NeFeSModel(cfg)
    variables = model.init_variables(jax.random.key(0))
    rcfg = cfg.render_config(n_samples=64, n_importance=64,
                             output_transient=False, test_time=True,
                             perturb=False, remat=False)
    rfc = RefineConfig(opt_iter=50)
    img = jax.random.uniform(jax.random.key(3), (FULL_H, FULL_W, 3))
    hist = jnp.zeros(10)
    ws_vec = jnp.asarray([1.0, 1.0, 0.0, 0.0, 0.0])

    for name, dt in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        dfnet = DFNet(output_dim=cfg.feature_dim, dtype=dt)
        dfvars = dfnet.init(jax.random.key(1), img[None],
                            upsample_hw=(FULL_H, FULL_W))
        tgt = jax.lax.stop_gradient(extract_target_features(
            dfnet, dfvars, img[None], FULL_H, FULL_W)[0])

        def run(im):
            return refine_apr_single(
                model, variables, dfnet, dfvars, im, tgt, hist, ws_vec,
                (H, W, FOCAL), (FULL_H, FULL_W, FOCAL * 4), 0.0, 4.0,
                rcfg, rfc, svd_reg=True)

        out = run(img)
        float(out["losses"][-1])
        t0 = time.perf_counter()
        for i in range(3):
            out = run(jnp.clip(img + 1e-4 * (i + 1), 0.0, 1.0))
            float(out["losses"][-1])
        dt_s = (time.perf_counter() - t0) / 3
        print(f"mode2 APR {name}: {dt_s:.4f} s/frame "
              f"loss={float(out['losses'][-1]):.4f}", flush=True)


if __name__ == "__main__":
    main()
