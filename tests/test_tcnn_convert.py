"""tcnn checkpoint converter gates: an INDEPENDENT numpy twin of the
tiny-cuda-nn grid lookup (scales, half-cell offset, x-fastest dense
order, spatial hash) validates HashGridEncoding(tcnn_exact=True) on the
converted tables; MLP unpacking validated by direct matmul."""

import jax
import jax.numpy as jnp
import numpy as np

from nefes_tpu.features.convert_tcnn import (
    convert_nerfh_tcnn, tcnn_level_layout, unpack_hashgrid,
    unpack_tcnn_mlp,
)
from nefes_tpu.fields.hashgrid import HashGridEncoding

PRIMES = (1, 2654435761, 805459861)


def numpy_tcnn_grid_lookup(x01, tables, n_levels, base, max_res, log2_t):
    """Twin of tcnn's GridEncoding forward (float32)."""
    growth = np.exp(np.log(max_res / base) / (n_levels - 1))
    feats = []
    for l in range(n_levels):
        scale = growth ** l * base - 1.0
        res = int(np.ceil(scale)) + 1
        size = tables[f"level_{l}"].shape[0]
        dense = size >= res ** 3
        pos = x01 * scale + 0.5
        x0 = np.minimum(np.floor(pos), res - 2).astype(np.uint64)
        frac = pos - x0
        acc = np.zeros((len(x01), tables[f"level_{l}"].shape[1]))
        for corner in range(8):
            offs = np.array([(corner >> 2) & 1, (corner >> 1) & 1,
                             corner & 1], np.uint64)
            c = x0 + offs
            if dense:
                idx = (c[:, 2] * res + c[:, 1]) * res + c[:, 0]
            else:
                idx = (c[:, 0] * PRIMES[0]
                       ^ (c[:, 1] * np.uint64(PRIMES[1]))
                       ^ (c[:, 2] * np.uint64(PRIMES[2])))
                idx = (idx % np.uint64(2 ** 32)) % np.uint64(size)
            w = np.prod(np.where(offs > 0, frac, 1 - frac), axis=1)
            acc += w[:, None] * tables[f"level_{l}"][idx.astype(int)]
        feats.append(acc)
    return np.concatenate(feats, axis=1)


def test_tcnn_exact_grid_matches_numpy_twin():
    L, base, max_res, log2_t = 6, 4, 64, 10
    res, sizes, offsets = tcnn_level_layout(L, 2, log2_t, base, max_res)
    rng = np.random.default_rng(0)
    buf = rng.normal(0, 1e-2, offsets[-1] * 2).astype(np.float32)
    tables = unpack_hashgrid(buf, L, 2, log2_t, base, max_res)

    enc = HashGridEncoding(n_levels=L, log2_table_size=log2_t,
                           base_resolution=base, max_resolution=max_res,
                           tcnn_exact=True)
    params = {"params": {f"level_{l}": jnp.asarray(tables[f"level_{l}"])
                         for l in range(L)}}
    x = rng.uniform(0.01, 0.99, (64, 3)).astype(np.float32)
    got = np.asarray(enc.apply(params, jnp.asarray(x)))
    want = numpy_tcnn_grid_lookup(x, tables, L, base, max_res, log2_t)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


def test_unpack_tcnn_mlp_matmul_semantics():
    """Packed buffer with known layer matrices -> Dense params whose
    forward equals the tcnn compute (input ones-padded to 16)."""
    rng = np.random.default_rng(1)
    n_in, width, n_out = 10, 32, 12
    in_pad, out_pad = 16, 16
    w0 = rng.normal(size=(width, in_pad)).astype(np.float32)
    w1 = rng.normal(size=(width, width)).astype(np.float32)
    wo = rng.normal(size=(out_pad, width)).astype(np.float32)
    buf = np.concatenate([w0.ravel(), w1.ravel(), wo.ravel()])

    p = unpack_tcnn_mlp(buf, n_in, width, 2, n_out, ["h0", "h1", "out"])
    x = rng.normal(size=(5, n_in)).astype(np.float32)
    # tcnn forward: ones-padded input, relu hiddens, linear out
    xp = np.concatenate([x, np.ones((5, in_pad - n_in), np.float32)], 1)
    h = np.maximum(xp @ w0.T, 0)
    h = np.maximum(h @ w1.T, 0)
    want = (h @ wo.T)[:, :n_out]

    g = np.maximum(x @ p["h0"]["kernel"] + p["h0"]["bias"], 0)
    g = np.maximum(g @ p["h1"]["kernel"] + p["h1"]["bias"], 0)
    got = g @ p["out"]["kernel"] + p["out"]["bias"]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_convert_nerfh_tcnn_full_runs():
    """Full tower conversion feeds a NeRFHTcnn(tcnn_exact) forward."""
    from nefes_tpu.fields.hashgrid import NeRFHTcnn

    L = 16
    _, _, offsets = tcnn_level_layout(L)
    rng = np.random.default_rng(2)
    sd = {
        "encoder.params": rng.normal(0, 1e-4,
                                     offsets[-1] * 2).astype(np.float32),
        "sigma_net.params": rng.normal(
            0, 0.05, 64 * 32 + 16 * 64).astype(np.float32),
        "color_net.params": rng.normal(
            0, 0.05, 64 * 48 + 64 * 64 + 16 * 64).astype(np.float32),
        "transient_color_net.params": rng.normal(
            0, 0.05,
            64 * 48 + 2 * 64 * 64 + 16 * 64).astype(np.float32),
    }
    variables = convert_nerfh_tcnn(sd)

    model = NeRFHTcnn(tcnn_exact=True)
    xyz = jnp.asarray(rng.uniform(-1, 1, (7, 3)).astype(np.float32))
    dirs = jnp.asarray(rng.normal(size=(7, 3)).astype(np.float32))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    out = model.apply(variables, xyz, dirs, jnp.zeros(5), jnp.zeros(2),
                      sigma_only=False, output_transient=True)
    for k, v in out.items():
        assert np.all(np.isfinite(np.asarray(v))), k
    assert out["static_rgb"].shape == (7, 3)
