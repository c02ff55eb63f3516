"""Component-level TPU timings: isolate MLP, embedding, sampling,
compositing to find where the render's 41 ms goes."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from nefes_tpu.train import ModelConfig, NeFeSModel
from nefes_tpu.fields.embedder import embed
from nefes_tpu.render.sampling import stratified_samples, sample_pdf
from nefes_tpu.render.compositor import composite

N_COARSE = 60 * 80 * 64     # 307200
N_FINE = 60 * 80 * 128      # 614400
R = 60 * 80


def timeit(name, fn, n=10):
    out = fn()
    jax.block_until_ready(out)
    _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[0]
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[0]
    dt = (time.perf_counter() - t0) / n
    print(f"{name}: {dt * 1000:.2f} ms", flush=True)
    return dt


def main():
    cfg = ModelConfig(dtype=jnp.bfloat16)
    model = NeFeSModel(cfg)
    variables = model.init_variables(jax.random.key(0))
    params = variables["params"]

    key = jax.random.key(1)
    xyz_f = jax.random.normal(key, (N_FINE, 3))
    dir_f = jax.random.normal(key, (N_FINE, 3))

    # raw embedding cost
    e = jax.jit(lambda x: embed(x, cfg.xyz_embed))
    timeit("embed 614k xyz (63ch)", lambda: e(xyz_f))

    xe = embed(xyz_f, cfg.xyz_embed)
    de = embed(dir_f, cfg.dir_embed)

    # fine tower full heads
    f = jax.jit(lambda p, a, b: model.fine_fn(p, a, b, False, False))
    timeit("fine MLP 614k samples (no transient)", lambda: f(params, xe, de))

    # coarse tower sigma only on 307k
    xe_c = xe[:N_COARSE]
    c = jax.jit(lambda p, a: model.coarse_fn(p, a, None, True, False))
    timeit("coarse MLP sigma-only 307k", lambda: c(params, xe_c))

    # fused embed+MLP (what the renderer actually runs)
    fe = jax.jit(lambda p, x, d: model.fine_fn(
        p, embed(x, cfg.xyz_embed), embed(d, cfg.dir_embed), False, False))
    timeit("embed+fine MLP 614k", lambda: fe(params, xyz_f, dir_f))

    # sampling machinery at render shapes
    z = stratified_samples(None, R, 64, 0.0, 4.0, perturb=False)
    w = jax.random.uniform(key, (R, 64))
    sp = jax.jit(lambda zz, ww: sample_pdf(
        None, 0.5 * (zz[..., 1:] + zz[..., :-1]), ww[..., 1:-1], 64,
        det=True))
    timeit("sample_pdf 4800x64->64", lambda: sp(z, w))

    zs = jnp.sort(jnp.concatenate([z, z + 0.01], -1), -1)
    srt = jax.jit(lambda a: jnp.sort(a, axis=-1))
    timeit("sort 4800x128", lambda: srt(zs))

    # compositor at fine shapes
    raw = {
        "static_rgb": jax.random.uniform(key, (R, 128, 3)),
        "static_feat": jax.random.normal(key, (R, 128, 128)),
        "static_sigma": jax.random.uniform(key, (R, 128)),
    }
    comp = jax.jit(lambda r, zz: composite(r, zz)["rgb"])
    timeit("composite 4800x128 (131ch)", lambda: comp(raw, zs))


if __name__ == "__main__":
    main()
