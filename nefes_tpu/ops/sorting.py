"""Comparison-matrix replacements for searchsorted / gather / small sorts.

TPU rationale: XLA lowers ``jnp.searchsorted`` to a while-loop of dynamic
slices and ``jnp.sort`` / ``take_along_axis`` to gather-heavy programs —
all serial, lane-misaligned memory traffic that the VPU/MXU sit idle for.
On the NeFeS hot path these dominated the profile (runtime/perf_probe2.py:
sample_pdf 34 ms + z-union sort 7 ms per refinement iteration, ~2 s of the
3.3 s/frame). For the tiny per-ray extents involved (≤128 values per ray,
thousands of rays) an O(N²) comparison matrix is a few million fully
vectorized VPU ops plus one small one-hot matmul on the MXU — orders of
magnitude faster than the "optimal" O(N log N) gather code.

These replace the roles of torch.searchsorted / torch.sort in reference
script/models/rendering.py:51,141 with TPU-shaped compute, not a
translation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def searchsorted_right(sorted_vals: jnp.ndarray, queries: jnp.ndarray) -> jnp.ndarray:
    """Batched ``searchsorted(side='right')`` as a comparison-count.

    sorted_vals: (..., N) ascending per row; queries: (..., S).
    Returns int32 (..., S): for each query u, the number of entries <= u
    (identical to ``jnp.searchsorted(row, u, side='right')`` per row).
    """
    cmp = sorted_vals[..., None, :] <= queries[..., :, None]      # (..., S, N)
    return jnp.sum(cmp, axis=-1).astype(jnp.int32)


def onehot_gather(values: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather ``values[..., idx]`` along the last axis via a one-hot matmul.

    values: (..., N) or (..., N, K) — K channels gathered together;
    idx: (..., S) int in [0, N). Returns (..., S) or (..., S, K).

    A (S, N) 0/1 matrix contracted on the MXU replaces the lane-serial
    gather XLA would otherwise emit. Differentiable in ``values`` (linear),
    like take_along_axis.
    """
    squeeze = values.ndim == idx.ndim
    if squeeze:
        values = values[..., None]                                # (..., N, 1)
    n = values.shape[-2]
    iota = jax.lax.broadcasted_iota(jnp.int32, idx.shape + (n,), idx.ndim)
    onehot = (idx[..., None] == iota).astype(values.dtype)        # (..., S, N)
    out = jnp.einsum("...sn,...nk->...sk", onehot, values,
                     preferred_element_type=values.dtype)
    return out[..., 0] if squeeze else out


def rank_sort(vals: jnp.ndarray, extra: jnp.ndarray | None = None):
    """Stable ascending sort of small per-row vectors via comparison ranks.

    vals: (..., N) with N small (≤ a few hundred). Rank of element i =
    #(v_j < v_i) + #(v_j == v_i, j < i)  — a stable O(N²) comparison matrix
    fully parallel on the VPU; the permutation is applied with one one-hot
    matmul. ``extra``, if given (..., N, K), is carried through the same
    permutation (returned second).
    """
    lt = vals[..., :, None] > vals[..., None, :]                  # v_j < v_i
    eq = vals[..., :, None] == vals[..., None, :]
    n = vals.shape[-1]
    j_lt_i = jnp.tril(jnp.ones((n, n), dtype=bool), k=-1)
    rank = jnp.sum(lt | (eq & j_lt_i), axis=-1)                   # (..., N)
    # scatter: out[rank[i]] = vals[i]  ==  onehot(rank)^T @ vals
    iota = jax.lax.broadcasted_iota(jnp.int32, rank.shape + (n,), rank.ndim)
    perm = (rank[..., None] == iota).astype(vals.dtype)           # (..., N_src, N_dst)
    out = jnp.einsum("...sn,...s->...n", perm, vals,
                     preferred_element_type=vals.dtype)
    if extra is None:
        return out
    extra_out = jnp.einsum("...sn,...sk->...nk", perm.astype(extra.dtype),
                           extra, preferred_element_type=extra.dtype)
    return out, extra_out
