"""Perf probe: break NeFeS50 refinement time into parts on the real chip.

Usage: python runtime/perf_probe.py [--remat 0|1]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from nefes_tpu.data.synthetic import look_at_pose
from nefes_tpu.refine import RefineConfig, refine_pose_single
from nefes_tpu.refine.pose_opt import render_feature_image
from nefes_tpu.render.renderer import render_rays, render_image
from nefes_tpu.train import ModelConfig, NeFeSModel
from nefes_tpu.geometry.rays import get_rays

H, W, FOCAL = 60, 80, 525.505 / 2 / 4
NEAR, FAR = 0.0, 4.0


def timeit(name, fn, n=5):
    out = fn()
    jax.block_until_ready(out)
    _ = np.asarray(jax.tree.leaves(out)[0])  # hard sync
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    _ = np.asarray(jax.tree.leaves(out)[0])
    dt = (time.perf_counter() - t0) / n
    print(f"{name}: {dt * 1000:.2f} ms")
    return dt


def main():
    dtype = jnp.bfloat16
    cfg = ModelConfig(dtype=dtype)
    model = NeFeSModel(cfg)
    variables = model.init_variables(jax.random.key(0))
    params = variables["params"]
    rc_test = cfg.render_config(n_samples=64, n_importance=64,
                                output_transient=False, test_time=True,
                                perturb=False)
    pose = jnp.asarray(look_at_pose(np.array([0.0, 0.3, 2.4], np.float32)))
    hist = jnp.zeros(10)
    ws_vec = jnp.asarray([1.0, 1.0, 0.0, 0.0, 0.0])
    hwf = (H, W, FOCAL)

    ro, rd = get_rays(H, W, FOCAL, pose)
    ro, rd = ro.reshape(-1, 3), rd.reshape(-1, 3)

    # 1. forward render only
    fwd = jax.jit(lambda p: render_rays(model.coarse_fn, model.fine_fn, p, p,
                                        ro, rd, NEAR, FAR, None,
                                        rc_test)["rgb"])
    timeit("forward render (4800 rays, 64+128spp)", lambda: fwd(params))

    # 2. forward + fusion + exposure
    ff = jax.jit(lambda v: render_feature_image(
        model, v, pose, hist, hwf, NEAR, FAR, rc_test)[1])
    timeit("forward + exposure + fusion", lambda: ff(variables))

    # 3. grad through everything wrt pose delta
    from nefes_tpu.geometry.se3 import learn_pose
    from nefes_tpu.refine.losses import feature_cosine_loss
    _, target = render_feature_image(model, variables, pose, hist, hwf,
                                     NEAR, FAR, rc_test)
    target = jax.lax.stop_gradient(target)

    def loss_fn(rt):
        p34 = learn_pose(rt[3:], rt[:3], pose)[..., :3, :4]
        _, fused = render_feature_image(model, variables, p34, hist, hwf,
                                        NEAR, FAR, rc_test)
        return feature_cosine_loss(fused, target)

    # also: forward render without remat for comparison
    from functools import partial
    fwd_noremat = jax.jit(lambda p: render_rays(
        model.coarse_fn, model.fine_fn, p, p, ro, rd, NEAR, FAR, None,
        rc_test, remat=False)["rgb"])
    timeit("forward render (no remat)", lambda: fwd_noremat(params))

    g = jax.jit(jax.grad(loss_fn))
    timeit("1 iter fwd+bwd (grad wrt pose)", lambda: g(jnp.zeros(6)))

    # 4. full 50-iter scan
    rcfg = RefineConfig(opt_iter=50, lr_r=0.0087, lr_t=0.01)
    timeit("50-iter refine scan", lambda: refine_pose_single(
        model, variables, pose, target, hist, ws_vec, hwf, NEAR, FAR,
        rc_test, rcfg)[1], n=3)


if __name__ == "__main__":
    main()
