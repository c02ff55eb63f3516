"""2x2/2 max-pooling with a TPU-shaped backward.

XLA lowers the gradient of ``reduce_window``-max (flax ``nn.max_pool``)
to ``select-and-scatter``, which is serial per window on TPU — measured
44 ms per mode-2 refinement frame inside the VGG16 tower
(PROFILE_r04.json top-ops). For the 2x2 stride-2 window the pool is just
an elementwise max of four strided views, and the exact backward is four
first-match masks + a reshape interleave — fully vectorized VPU code.

Semantics match torch's MaxPool2d(2, 2) exactly, including tie-breaking:
the gradient routes to the FIRST maximal element in row-major window
order (torch returns argmax's first index; jnp.maximum's own VJP would
split ties 0.5/0.5).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _views(x: jnp.ndarray):
    """Four strided (B, H2/2, W2/2, C) views of the floor-cropped input,
    in row-major window order."""
    H2 = (x.shape[1] // 2) * 2
    W2 = (x.shape[2] // 2) * 2
    return [x[:, i:H2:2, j:W2:2, :] for i in (0, 1) for j in (0, 1)]


@jax.custom_vjp
def max_pool_2x2(x: jnp.ndarray) -> jnp.ndarray:
    """x: (B, H, W, C) -> (B, H//2, W//2, C); trailing odd row/col dropped
    (VALID padding, as torch MaxPool2d(2, 2) and nn.max_pool)."""
    v = _views(x)
    return jnp.maximum(jnp.maximum(v[0], v[1]), jnp.maximum(v[2], v[3]))


def _fwd(x):
    y = max_pool_2x2(x)
    return y, (x, y)


def _bwd(res, g):
    x, y = res
    v = _views(x)
    masks = []
    taken = jnp.zeros(y.shape, bool)
    for vi in v:
        m = (vi == y) & ~taken
        taken = taken | m
        masks.append(m)
    zg = [jnp.where(m, g, 0.0).astype(x.dtype) for m in masks]
    B, Hp, Wp, C = y.shape
    # interleave columns then rows: (... , Wp, 2, C) -> (..., 2*Wp, C)
    row0 = jnp.stack([zg[0], zg[1]], axis=3).reshape(B, Hp, 2 * Wp, C)
    row1 = jnp.stack([zg[2], zg[3]], axis=3).reshape(B, Hp, 2 * Wp, C)
    dx = jnp.stack([row0, row1], axis=2).reshape(B, 2 * Hp, 2 * Wp, C)
    pad_h = x.shape[1] - 2 * Hp
    pad_w = x.shape[2] - 2 * Wp
    if pad_h or pad_w:
        dx = jnp.pad(dx, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    return (dx,)


max_pool_2x2.defvjp(_fwd, _bwd)
