"""Tile-size sweep + f32-oracle parity for the fused field kernel.

Three-way comparison: flax-f32 (oracle) vs flax-bf16 vs kernel-bf16 —
the kernel only needs to be as close to the oracle as the bf16 flax path
is. Then times fwd/grad at several tile sizes.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from nefes_tpu.fields.embedder import embed
from nefes_tpu.kernels.fused_field import (
    FieldSpec, fused_field_apply, pack_params,
)
from nefes_tpu.train import ModelConfig, NeFeSModel

N = 60 * 80 * 128


def timeit(name, fn, n=20):
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    outs = [fn() for _ in range(n)]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / n
    print(f"{name}: {dt * 1000:.2f} ms", flush=True)
    return dt


def main():
    cfg32 = ModelConfig(dtype=jnp.float32)
    cfg16 = ModelConfig(dtype=jnp.bfloat16)
    m32, m16 = NeFeSModel(cfg32), NeFeSModel(cfg16)
    params = m32.init_variables(jax.random.key(0))["params"]

    k1, k2 = jax.random.split(jax.random.key(1))
    pts = jax.random.normal(k1, (N, 3))
    dirs = jax.random.normal(k2, (N, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)

    flax32 = jax.jit(lambda p, d: m32.fine_fn(
        params, embed(p, cfg32.xyz_embed), embed(d, cfg32.dir_embed),
        False, True))
    flax16 = jax.jit(lambda p, d: m16.fine_fn(
        params, embed(p, cfg16.xyz_embed), embed(d, cfg16.dir_embed),
        False, True))

    oracle = jax.device_get(flax32(pts, dirs))
    b16 = jax.device_get(flax16(pts, dirs))

    spec = FieldSpec.from_model(cfg16, "fine", dtype="bfloat16", tile=1024)
    weights = pack_params(params["fine"], spec)
    kern = jax.device_get(jax.jit(lambda p, d: fused_field_apply(
        spec, weights, p, d))(pts, dirs))

    print("== parity vs f32 oracle (mean |err| / std of head) ==", flush=True)
    for k in oracle:
        o = np.asarray(oracle[k], np.float64)
        s = o.std() + 1e-9
        e_flax = np.abs(np.asarray(b16, dtype=object)[()][k] - o).mean() / s \
            if False else np.abs(np.asarray(b16[k], np.float64) - o).mean() / s
        e_kern = np.abs(np.asarray(kern[k], np.float64) - o).mean() / s
        print(f"{k}: flax-bf16 {e_flax:.5f}  kernel-bf16 {e_kern:.5f}",
              flush=True)

    # grad parity vs f32 oracle
    def loss(fn):
        return jax.jit(jax.grad(
            lambda p: jnp.sum(fn(p)["static_feat"] ** 2) * 1e-3))

    g_o = np.asarray(jax.device_get(
        loss(lambda p: flax32(p, dirs))(pts)), np.float64)
    g_f = np.asarray(jax.device_get(
        loss(lambda p: flax16(p, dirs))(pts)), np.float64)
    g_k = np.asarray(jax.device_get(loss(lambda p: fused_field_apply(
        spec, weights, p, dirs, need_dw=False))(pts)), np.float64)
    s = g_o.std() + 1e-9
    print(f"grad d_pts: flax-bf16 {np.abs(g_f - g_o).mean() / s:.5f}  "
          f"kernel-bf16 {np.abs(g_k - g_o).mean() / s:.5f}", flush=True)

    print("== tile sweep ==", flush=True)
    red = lambda o: jax.tree.map(jnp.sum, o)
    for tile in [1024, 2048]:
        sp = FieldSpec.from_model(cfg16, "fine", dtype="bfloat16", tile=tile)
        spc = FieldSpec.from_model(cfg16, "coarse", dtype="bfloat16",
                                   tile=tile)
        wc = pack_params(params["coarse"], spc)
        f = jax.jit(lambda p, d, sp=sp: red(fused_field_apply(
            sp, weights, p, d)))
        g = jax.jit(jax.grad(lambda p, sp=sp: jnp.sum(fused_field_apply(
            sp, weights, p, dirs, need_dw=False)["static_feat"] ** 2)))
        cs = jax.jit(lambda p, spc=spc: red(fused_field_apply(
            spc, wc, p, None, sigma_only=True)))
        timeit(f"tile={tile} fused fwd 614k (transient)",
               lambda: f(pts, dirs))
        timeit(f"tile={tile} fused grad 614k", lambda: g(pts))
        timeit(f"tile={tile} fused coarse sigma 307k",
               lambda: cs(pts[:N // 2]))
    # flax baselines for the same shapes
    fs = jax.jit(lambda p: red(m16.coarse_fn(
        params, embed(p, cfg16.xyz_embed), None, True, False)))
    timeit("flax coarse sigma 307k", lambda: fs(pts[:N // 2]))


if __name__ == "__main__":
    main()
