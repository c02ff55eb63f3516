"""tiny-cuda-nn checkpoint converter for the hash-grid field variant.

Reference: script/models/nerfh_tcnn.py stores its weights as tcnn packed
buffers — ``encoder.params`` (the multiresolution hash tables,
concatenated per level at 8-aligned offsets) and ``{sigma,color,
transient_color}_net.params`` (FullyFusedMLP buffers: row-major per
layer, widths padded to 16, no biases — the padded input columns act as
a bias against tcnn's ones-padding of the input vector).

Targets fields/hashgrid.py with ``tcnn_exact=True`` (tcnn's level
scales/resolutions, half-cell offset, x-fastest dense order, 8-aligned
tables), so converted tables index identically. Layout assumptions are
exercised by an independent numpy twin of the tcnn grid lookup in
tests/test_tcnn_convert.py; end-to-end validation against a real
paper_models .tar awaits an artifact (none ship in this environment).
"""

from __future__ import annotations

import numpy as np


def _ceil_mult(x: int, m: int) -> int:
    return -(-x // m) * m


def unpack_tcnn_mlp(buf: np.ndarray, n_input: int, width: int,
                    n_hidden_layers: int, n_output: int,
                    names: list[str]) -> dict:
    """FullyFusedMLP packed buffer -> {name: {kernel, bias}} flax Dense
    params. names = hidden layer names (n_hidden_layers of them) + the
    output layer name."""
    in_pad = _ceil_mult(n_input, 16)
    out_pad = _ceil_mult(n_output, 16)
    sizes = ([width * in_pad] + [width * width] * (n_hidden_layers - 1)
             + [out_pad * width])
    assert buf.size == sum(sizes), (buf.size, sizes)
    assert len(names) == n_hidden_layers + 1
    chunks = np.split(buf.astype(np.float32), np.cumsum(sizes)[:-1])

    params = {}
    w0 = chunks[0].reshape(width, in_pad)
    params[names[0]] = {"kernel": w0[:, :n_input].T,
                        "bias": w0[:, n_input:].sum(-1)}
    for i in range(1, n_hidden_layers):
        w = chunks[i].reshape(width, width)
        params[names[i]] = {"kernel": w.T,
                            "bias": np.zeros(width, np.float32)}
    wo = chunks[-1].reshape(out_pad, width)
    params[names[-1]] = {"kernel": wo[:n_output].T,
                         "bias": np.zeros(n_output, np.float32)}
    return params


def tcnn_level_layout(n_levels: int = 16, features: int = 2,
                      log2_table: int = 19, base: int = 16,
                      max_resolution: int = 2048):
    """(resolutions, table_sizes, offsets) of a tcnn GridEncoding —
    matches HashGridEncoding(tcnn_exact=True).setup."""
    growth = np.exp(np.log(max_resolution / base) / (n_levels - 1))
    scales = [growth ** l * base - 1.0 for l in range(n_levels)]
    res = [int(np.ceil(s)) + 1 for s in scales]
    sizes = [_ceil_mult(min(r ** 3, 2 ** log2_table), 8) for r in res]
    offsets = np.concatenate([[0], np.cumsum(sizes)])
    return res, sizes, offsets


def unpack_hashgrid(buf: np.ndarray, n_levels: int = 16, features: int = 2,
                    log2_table: int = 19, base: int = 16,
                    max_resolution: int = 2048) -> dict:
    """encoder.params buffer -> {level_l: (size, F)} tables."""
    _, sizes, offsets = tcnn_level_layout(n_levels, features, log2_table,
                                          base, max_resolution)
    assert buf.size == offsets[-1] * features, (buf.size,
                                                offsets[-1] * features)
    flat = buf.astype(np.float32).reshape(-1, features)
    return {f"level_{l}": flat[offsets[l]:offsets[l + 1]]
            for l in range(n_levels)}


def convert_nerfh_tcnn(sd: dict, hash_level: int = 16,
                       geo_features: int = 15, hidden: int = 64,
                       in_channels_a: int = 5, in_channels_t: int = 2,
                       transient: bool = True) -> dict:
    """Reference NeRF_TCNN tower state_dict (packed tcnn buffers) -> flax
    params for NeRFHTcnn(+ HashGridEncoding(tcnn_exact=True)).

    Keys: encoder.params, sigma_net.params, color_net.params,
    transient_color_net.params (nerfh_tcnn.py:65-149).
    """
    params: dict = {"encoder": unpack_hashgrid(sd["encoder.params"],
                                               n_levels=hash_level)}
    params.update(unpack_tcnn_mlp(
        sd["sigma_net.params"], n_input=hash_level * 2, width=hidden,
        n_hidden_layers=1, n_output=1 + geo_features,
        names=["sigma_hidden", "sigma_out"]))
    params.update(unpack_tcnn_mlp(
        sd["color_net.params"],
        n_input=geo_features + 16 + in_channels_a, width=hidden,
        n_hidden_layers=2, n_output=3,
        names=["color_hidden0", "color_hidden1", "color_out"]))
    if transient and "transient_color_net.params" in sd:
        params.update(unpack_tcnn_mlp(
            sd["transient_color_net.params"],
            n_input=geo_features + 16 + in_channels_t, width=hidden,
            n_hidden_layers=3, n_output=5,
            names=["transient_hidden0", "transient_hidden1",
                   "transient_hidden2", "transient_out"]))
    return {"params": params}
