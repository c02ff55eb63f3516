"""max_pool_2x2 (ops/pooling.py): forward parity with flax nn.max_pool and
EXACT gradient parity with torch MaxPool2d(2,2) — including first-match
tie routing, which XLA's select-and-scatter and jnp.maximum's 0.5/0.5 tie
split both get differently."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import flax.linen as nn

from nefes_tpu.ops.pooling import max_pool_2x2

torch = pytest.importorskip("torch")


@pytest.mark.parametrize("shape", [(2, 8, 12, 3), (1, 7, 9, 2),
                                   (1, 60, 80, 4)])
def test_forward_matches_flax(shape):
    x = jnp.asarray(np.random.default_rng(0).normal(size=shape)
                    .astype(np.float32))
    got = max_pool_2x2(x)
    want = nn.max_pool(x, (2, 2), strides=(2, 2))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("tie_heavy", [False, True])
def test_gradient_matches_torch(tie_heavy):
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 8, 10, 3)).astype(np.float32)
    if tie_heavy:
        # quantize + relu: many exact ties and all-zero windows — the
        # regime where tie routing actually matters
        x = np.maximum(np.round(x * 2) / 2, 0.0).astype(np.float32)
    g = rng.normal(size=(2, 4, 5, 3)).astype(np.float32)

    def f(xx):
        return jnp.sum(max_pool_2x2(xx) * jnp.asarray(g))
    dx = np.asarray(jax.grad(f)(jnp.asarray(x)))

    xt = torch.tensor(x.transpose(0, 3, 1, 2), requires_grad=True)
    yt = torch.nn.functional.max_pool2d(xt, 2, 2)
    yt.backward(torch.tensor(g.transpose(0, 3, 1, 2)))
    want = xt.grad.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(dx, want, atol=1e-6)


def test_gradient_odd_edges_get_zero():
    x = jnp.asarray(np.random.default_rng(2).normal(size=(1, 5, 7, 2))
                    .astype(np.float32))
    dx = jax.grad(lambda xx: jnp.sum(max_pool_2x2(xx)))(x)
    assert np.all(np.asarray(dx)[:, 4, :, :] == 0)
    assert np.all(np.asarray(dx)[:, :, 6, :] == 0)
