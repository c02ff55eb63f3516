"""Per-iteration breakdown of the NeFeS50 refinement step on real TPU.

All timed programs reduce outputs to scalars on-device (device->host
transfer over the axon tunnel otherwise dominates and lies)."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from nefes_tpu.data.synthetic import look_at_pose
from nefes_tpu.refine import RefineConfig
from nefes_tpu.refine.losses import feature_cosine_loss
from nefes_tpu.refine.pose_opt import render_feature_image
from nefes_tpu.train import ModelConfig, NeFeSModel

H, W, FOCAL = 60, 80, 525.505 / 2 / 4
NEAR, FAR = 0.0, 4.0


def timeit(name, fn, n=30):
    out = fn()
    jax.block_until_ready(out)
    float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    dt = (time.perf_counter() - t0) / n
    print(f"{name}: {dt * 1000:.2f} ms", flush=True)
    return dt


def main():
    cfg = ModelConfig(dtype=jnp.bfloat16)
    model = NeFeSModel(cfg)
    variables = model.init_variables(jax.random.key(0))
    rcfg = cfg.render_config(n_samples=64, n_importance=64,
                             output_transient=False, test_time=True,
                             perturb=False)
    hist = jnp.zeros(10)
    pose = jnp.asarray(look_at_pose(np.array([0.0, 0.3, 2.4], np.float32)))
    hwf = (H, W, FOCAL)
    target = jnp.zeros((H, W, cfg.feature_dim))

    red = lambda o: jax.tree.map(lambda x: jnp.sum(x.astype(jnp.float32)), o)

    # full forward (render + exposure + fusion)
    fwd = jax.jit(lambda sh: red(render_feature_image(
        model, variables, pose.at[:, 3].add(sh), hist, hwf, NEAR, FAR,
        rcfg)))
    timeit("forward render_feature_image", lambda: fwd(jnp.zeros(3)))

    # forward + backward into a pose shift (the refinement grad path)
    def loss(sh):
        _, fused = render_feature_image(model, variables,
                                        pose.at[:, 3].add(sh), hist, hwf,
                                        NEAR, FAR, rcfg)
        return feature_cosine_loss(fused, target)
    g = jax.jit(jax.grad(loss))
    timeit("fwd+bwd (pose grad)", lambda: g(jnp.zeros(3)))

    # render only (no exposure/fusion)
    from nefes_tpu.render.renderer import render_image
    params = variables["params"]
    r = jax.jit(lambda sh: red(render_image(
        model.coarse_fn, model.fine_fn, params, params, H, W, FOCAL,
        pose.at[:, 3].add(sh), NEAR, FAR, rcfg)))
    timeit("render only fwd", lambda: r(jnp.zeros(3)))

    def rloss(sh):
        out = render_image(model.coarse_fn, model.fine_fn, params, params,
                           H, W, FOCAL, pose.at[:, 3].add(sh), NEAR, FAR,
                           rcfg)
        return jnp.sum(out["feat"] ** 2) * 1e-3 + jnp.sum(out["rgb"])
    rg = jax.jit(jax.grad(rloss))
    timeit("render only fwd+bwd", lambda: rg(jnp.zeros(3)))

    # fusion + exposure alone
    rgb = jnp.zeros((H, W, 3))
    feat = jnp.zeros((H, W, cfg.feature_dim))
    f = jax.jit(lambda x: red(model.apply_fusion(
        variables, x[None], feat[None], train=False)[0]))
    timeit("fusion CNN fwd", lambda: f(rgb))


if __name__ == "__main__":
    main()
