"""Drive the Pallas fused field kernel on real TPU: compiled Mosaic
parity vs the unfused flax path (bf16 tolerance) + wall-clock on the
refinement fine-pass shape (614k samples)."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from nefes_tpu.fields.embedder import embed
from nefes_tpu.kernels.fused_field import (
    FieldSpec, fused_field_apply, pack_params,
)
from nefes_tpu.train import ModelConfig, NeFeSModel

N = 60 * 80 * 128  # fine pass of one H/4 7-Scenes render


def timeit(name, fn, n=20):
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    outs = [fn() for _ in range(n)]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / n
    print(f"{name}: {dt * 1000:.2f} ms", flush=True)
    return dt


def main():
    print("device:", jax.devices()[0], flush=True)
    cfg = ModelConfig(dtype=jnp.bfloat16)
    model = NeFeSModel(cfg)
    params = model.init_variables(jax.random.key(0))["params"]
    spec = FieldSpec.from_model(cfg, "fine")
    weights = pack_params(params["fine"], spec)

    k1, k2 = jax.random.split(jax.random.key(1))
    pts = jax.random.normal(k1, (N, 3))
    dirs = jax.random.normal(k2, (N, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)

    fused = jax.jit(lambda w, p, d: fused_field_apply(
        spec, w, p, d, sigma_only=False, output_transient=True))
    flax_fn = jax.jit(lambda pr, p, d: model.fine_fn(
        pr, embed(p, cfg.xyz_embed), embed(d, cfg.dir_embed), False, True))

    got = jax.device_get(fused(weights, pts, dirs))
    want = jax.device_get(flax_fn(params, pts, dirs))
    for k in want:
        g, w = np.asarray(got[k]), np.asarray(want[k])
        denom = np.maximum(np.abs(w), 1e-3)
        rel = np.max(np.abs(g - w) / denom)
        print(f"parity {k}: max_rel_err={rel:.4f}", flush=True)

    loss_fused = jax.jit(jax.grad(lambda p: jnp.sum(fused_field_apply(
        spec, weights, p, dirs, need_dw=False)["static_feat"] ** 2)))
    loss_flax = jax.jit(jax.grad(lambda p: jnp.sum(flax_fn(
        params, p, dirs)["static_feat"] ** 2)))
    gg = np.asarray(jax.device_get(loss_fused(pts)))
    gw = np.asarray(jax.device_get(loss_flax(pts)))
    scale = np.max(np.abs(gw)) + 1e-6
    print(f"grad parity d_pts: max_abs_err/scale="
          f"{np.max(np.abs(gg - gw)) / scale:.4f}", flush=True)

    s = lambda o: jax.tree.map(lambda x: jnp.sum(x), o)
    timeit("fused fwd 614k", lambda: s(fused(weights, pts, dirs)))
    timeit("flax  fwd 614k", lambda: s(flax_fn(params, pts, dirs)))
    timeit("fused grad(pts) 614k", lambda: s(loss_fused(pts)))
    timeit("flax  grad(pts) 614k", lambda: s(loss_flax(pts)))


if __name__ == "__main__":
    main()
