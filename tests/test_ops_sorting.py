"""Parity of the comparison-matrix primitives (nefes_tpu/ops/sorting.py)
with XLA's searchsorted / take_along_axis / sort — including tie cases,
which occur in sample_pdf whenever the CDF has flat regions."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nefes_tpu.ops.sorting import onehot_gather, rank_sort, searchsorted_right


def test_searchsorted_right_matches_jnp():
    rng = np.random.default_rng(0)
    vals = np.sort(rng.uniform(size=(32, 17)), axis=-1)
    q = rng.uniform(size=(32, 9)).astype(np.float32)
    got = searchsorted_right(jnp.asarray(vals), jnp.asarray(q))
    want = np.stack([np.searchsorted(v, u, side="right")
                     for v, u in zip(vals, q)])
    np.testing.assert_array_equal(np.asarray(got), want)


def test_searchsorted_right_ties_and_bounds():
    vals = jnp.asarray([[0.0, 0.25, 0.25, 0.25, 1.0]])
    q = jnp.asarray([[-1.0, 0.0, 0.25, 0.5, 1.0, 2.0]])
    got = np.asarray(searchsorted_right(vals, q))[0]
    want = np.searchsorted(np.asarray(vals)[0], np.asarray(q)[0], side="right")
    np.testing.assert_array_equal(got, want)


def test_onehot_gather_matches_take_along_axis():
    rng = np.random.default_rng(1)
    vals = rng.normal(size=(8, 13)).astype(np.float32)
    idx = rng.integers(0, 13, size=(8, 21))
    got = onehot_gather(jnp.asarray(vals), jnp.asarray(idx))
    want = np.take_along_axis(vals, idx, axis=-1)
    np.testing.assert_allclose(np.asarray(got), want, rtol=0, atol=0)


def test_onehot_gather_channels():
    rng = np.random.default_rng(2)
    vals = rng.normal(size=(4, 11, 3)).astype(np.float32)
    idx = rng.integers(0, 11, size=(4, 7))
    got = np.asarray(onehot_gather(jnp.asarray(vals), jnp.asarray(idx)))
    for b in range(4):
        np.testing.assert_allclose(got[b], vals[b, idx[b]], rtol=0, atol=0)


def test_onehot_gather_grad_matches_take_along_axis_grad():
    vals = jnp.arange(12.0).reshape(2, 6)
    idx = jnp.asarray([[0, 0, 5], [2, 3, 3]])
    f1 = lambda v: jnp.sum(onehot_gather(v, idx) ** 2)
    f2 = lambda v: jnp.sum(jnp.take_along_axis(v, idx, axis=-1) ** 2)
    np.testing.assert_allclose(np.asarray(jax.grad(f1)(vals)),
                               np.asarray(jax.grad(f2)(vals)), atol=1e-6)


@pytest.mark.parametrize("n", [5, 64, 128])
def test_rank_sort_matches_jnp_sort(n):
    rng = np.random.default_rng(3)
    vals = rng.normal(size=(16, n)).astype(np.float32)
    got = np.asarray(rank_sort(jnp.asarray(vals)))
    np.testing.assert_allclose(got, np.sort(vals, axis=-1), rtol=0, atol=0)


def test_rank_sort_with_duplicates_is_valid_permutation():
    vals = jnp.asarray([[3.0, 1.0, 1.0, 1.0, 0.5, 3.0]])
    got = np.asarray(rank_sort(vals))[0]
    np.testing.assert_allclose(got, np.sort(np.asarray(vals)[0]))


def test_rank_sort_carries_extra_through_same_permutation():
    vals = jnp.asarray([[2.0, 0.0, 1.0]])
    extra = jnp.asarray([[[20.0, 200.0], [0.0, 0.5], [10.0, 100.0]]])
    sv, se = rank_sort(vals, extra)
    np.testing.assert_allclose(np.asarray(sv)[0], [0.0, 1.0, 2.0])
    np.testing.assert_allclose(np.asarray(se)[0],
                               [[0.0, 0.5], [10.0, 100.0], [20.0, 200.0]])


def test_rank_sort_grad_matches_sort_grad():
    vals = jnp.asarray([[0.3, -1.2, 0.9, 0.1]])
    f1 = lambda v: jnp.sum(rank_sort(v) * jnp.asarray([1.0, 2.0, 3.0, 4.0]))
    f2 = lambda v: jnp.sum(jnp.sort(v, axis=-1) * jnp.asarray([1.0, 2.0, 3.0, 4.0]))
    np.testing.assert_allclose(np.asarray(jax.grad(f1)(vals)),
                               np.asarray(jax.grad(f2)(vals)), atol=1e-6)
