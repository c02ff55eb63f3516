"""Composite-fused fine-pass render kernel: embed -> MLP -> heads ->
volume composite, emitting PER-RAY outputs.

The plain fused field kernel (fused_field.py) still writes per-SAMPLE head
outputs to HBM (N x 131 f32 with N = 128 rays) that the XLA compositor
immediately re-reads. This kernel keeps the whole fine pass of the
refinement render in VMEM: for each tile of R_t rays x S samples it runs
the field, computes the NeRF transmittance scan IN-KERNEL (log-space
exclusive cumsum as one (R_t, S) @ (S, S) strictly-triangular matmul on
the MXU — the comparison-matrix idiom of nefes_tpu/ops), and writes only
the composited rgb/feat/depth/acc per ray: R x (131+2) floats instead of
128R x 131.

Scope: the REFINEMENT fine pass exactly — mode "full" (no transient
heads), test_time semantics (no raw-noise), no white background — i.e.
reference raw2outputs_NeRFH_NFF with output_transient=False
(nerfh_nff.py:25-166, the :117-125 branch) including the stop-gradient
feature rule (:122-125): the backward excludes the feature channels from
the weight (alpha/sigma) cotangents.

Backward is a recompute kernel (need_dw=False — the field is frozen in
both DFM refinement modes) emitting d_pts, d_dirs AND d_z (z_vals carry
real gradients: the fine z's come from PDF-sampling the coarse weights,
which depend on the pose being optimised).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nefes_tpu.kernels.fused_field import (
    FieldSpec, _const_spec, _forward_tile, _mlp_backward, _tile_spec,
    _tower_tile, weight_names,
)

DELTA_INF = 1e2      # compositor tail (reference nerfh_nff.py:56)
_LOG_EPS = 1e-10


def _tri_upper_strict(S: int) -> jnp.ndarray:
    """(S, S) f32 with ones where row < col — x @ M = exclusive cumsum."""
    r = jax.lax.broadcasted_iota(jnp.int32, (S, S), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)
    return (r < c).astype(jnp.float32)


def _tri_lower_strict(S: int) -> jnp.ndarray:
    """(S, S) f32 with ones where row > col — x @ M = exclusive SUFFIX sum."""
    r = jax.lax.broadcasted_iota(jnp.int32, (S, S), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)
    return (r > c).astype(jnp.float32)


# --- layout folds. Mosaic cannot shape-cast between lane and sublane
# dims ((T, 1) <-> (R_t, S)); these conversions go through the MXU with
# tiny iota-built selector matrices instead (the comparison-matrix idiom
# of nefes_tpu/ops) ---

def _ray_selector(r_t: int, T: int, S: int) -> jnp.ndarray:
    """(R_t, T) ones where col // S == row — A @ x sums each ray block."""
    r = jax.lax.broadcasted_iota(jnp.int32, (r_t, T), 0)
    t = jax.lax.broadcasted_iota(jnp.int32, (r_t, T), 1)
    return (t // S == r).astype(jnp.float32)


def _pos_selector(T: int, S: int) -> jnp.ndarray:
    """(T, S) ones where row % S == col."""
    t = jax.lax.broadcasted_iota(jnp.int32, (T, S), 0)
    s = jax.lax.broadcasted_iota(jnp.int32, (T, S), 1)
    return (t % S == s).astype(jnp.float32)


def _fold(x_flat, A, B):
    """(T, 1) -> (R_t, S): A @ (x * B)."""
    return jnp.dot(A, x_flat * B, preferred_element_type=jnp.float32)


def _unfold(x_rs, A, B):
    """(R_t, S) -> (T, 1): row t gets x_rs[t // S, t % S]."""
    full = jax.lax.dot_general(A, x_rs,
                               dimension_numbers=(((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    return jnp.sum(full * B, axis=1, keepdims=True)


def _per_ray_broadcast(g_ray, A):
    """(R_t, C) -> (T, C): each ray's row repeated over its S samples."""
    return jax.lax.dot_general(A, g_ray,
                               dimension_numbers=(((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _composite_pieces(sigma_flat, z, A, B):
    """sigma (T, 1) f32 post-softplus, z (R_t, S) -> (alpha, trans, wgt,
    deltas), all (R_t, S) f32. Log-space transmittance: one MXU matmul
    replaces the serial cumprod."""
    r_t, S = z.shape
    deltas = jnp.concatenate(
        [z[:, 1:] - z[:, :-1],
         jnp.full((r_t, 1), DELTA_INF, jnp.float32)], axis=1)
    sig = _fold(sigma_flat, A, B)
    alpha = 1.0 - jnp.exp(-deltas * sig)
    log1ma = jnp.log(jnp.maximum(1.0 - alpha, _LOG_EPS))
    log_t = jnp.dot(log1ma, _tri_upper_strict(S),
                    preferred_element_type=jnp.float32)
    trans = jnp.exp(log_t)
    return alpha, trans, alpha * trans, deltas


def _render_fwd_kernel(spec, S, names, refs):
    pts, dirs, z = refs[0], refs[1], refs[2]
    n_w = len(names)
    w = dict(zip(names, refs[3:3 + n_w]))
    out_ref = refs[3 + n_w]
    r_t = z.shape[0]
    T = r_t * S
    A, B = _ray_selector(r_t, T, S), _pos_selector(T, S)

    out, _ = _forward_tile(spec, "full", w, pts[:], dirs[:])
    _, _, wgt, _ = _composite_pieces(out["sigma"], z[:], A, B)

    w_flat = _unfold(wgt, A, B)                       # (T, 1)
    wx = w_flat * out["rgbfeat"]                      # (T, 131)
    ray = jnp.dot(A, wx, preferred_element_type=jnp.float32)  # (R_t, 131)
    depth = jnp.sum(wgt * z[:], axis=1, keepdims=True)
    acc = jnp.sum(wgt, axis=1, keepdims=True)
    out_ref[:] = jnp.concatenate([ray, depth, acc], axis=1)


def _render_bwd_kernel(spec, S, names, refs):
    """Recompute + backprop. Inputs: pts, dirs, z, weights, d_out
    (R_t, 133). Outputs: d_pts (T, 3), d_dirs (T, 3), d_z (R_t, S)."""
    pts, dirs, z = refs[0], refs[1], refs[2]
    n_w = len(names)
    w = dict(zip(names, refs[3:3 + n_w]))
    d_out = refs[3 + n_w]
    d_pts_ref, d_dirs_ref, d_z_ref = refs[4 + n_w:]
    r_t = z.shape[0]
    T = r_t * S
    C = spec.rgbfeat
    A, B = _ray_selector(r_t, T, S), _pos_selector(T, S)

    out, acts = _forward_tile(spec, "full", w, pts[:], dirs[:])
    sigma = out["sigma"]                               # (T, 1) f32
    rgbfeat = out["rgbfeat"]                           # (T, 131) f32
    zt = z[:]
    alpha, trans, wgt, deltas = _composite_pieces(sigma, zt, A, B)
    sig_rs = _fold(sigma, A, B)
    w_flat = _unfold(wgt, A, B)

    g = d_out[:]                                       # (R_t, 133)
    g_ray, g_depth, g_acc = g[:, :C], g[:, C:C + 1], g[:, C + 1:C + 2]

    # d rgbfeat: broadcast each ray's cotangent over its S samples and
    # scale by the weights (features use the SAME weights but contribute
    # no weight-gradient — handled below)
    g_rep = _per_ray_broadcast(g_ray, A)               # (T, C)
    d_rgbfeat = w_flat * g_rep                         # (T, 131)

    # d weights — STOP-GRAD rule: only the 3 rgb channels (plus
    # depth/acc) feed back into the weights; the 128 feature channels do
    # not (reference nerfh_nff.py:122-125)
    rgb_dot = jnp.sum(rgbfeat[:, :3] * g_rep[:, :3], axis=1,
                      keepdims=True)                   # (T, 1)
    d_w = _fold(rgb_dot, A, B) + zt * g_depth + g_acc

    # d alpha: w_i = alpha_i * T_i with T_i = exp(sum_{j<i} log(1-a_j))
    #   dL/da_i = d_w_i * T_i - (1/(1-a_i)) * sum_{k>i} d_w_k w_k
    dww = d_w * wgt
    suffix = jnp.dot(dww, _tri_lower_strict(S),
                     preferred_element_type=jnp.float32)
    d_alpha = d_w * trans - suffix / jnp.maximum(1.0 - alpha, _LOG_EPS)

    # d sigma (post-softplus) and d deltas
    exp_term = jnp.exp(-deltas * sig_rs)
    d_sigma = _unfold(d_alpha * deltas * exp_term, A, B)
    d_delta = d_alpha * sig_rs * exp_term
    # the last delta is the constant DELTA_INF tail -> no z gradient
    d_delta = jnp.concatenate(
        [d_delta[:, :-1], jnp.zeros((r_t, 1), jnp.float32)], axis=1)
    # delta_i = z_{i+1} - z_i  =>  d_z_j = d_delta_{j-1} - d_delta_j
    d_delta_shift = jnp.concatenate(
        [jnp.zeros((r_t, 1), jnp.float32), d_delta[:, :-1]], axis=1)
    d_z_ref[:] = wgt * g_depth + d_delta_shift - d_delta

    cts = {"sigma": d_sigma, "rgbfeat": d_rgbfeat}
    d_pts, d_dirs = _mlp_backward(spec, "full", False, w, acts, cts, {})
    d_pts_ref[:] = d_pts
    d_dirs_ref[:] = d_dirs


@functools.lru_cache(maxsize=None)
def make_fused_render(spec: FieldSpec, S: int, interpret: bool = False):
    """Returns fused(weights, pts (R*S, 3), dirs (R*S, 3), z (R, S)) ->
    (R, 133) [rgbfeat | depth | acc]. R must be a multiple of the ray
    tile (fused_render_apply pads). Frozen-field only (weight cotangents
    are zeros — both DFM refinement modes, SURVEY §2.7)."""
    names = weight_names(spec)
    r_tile = max(spec.tile // S, 8)          # rays per grid step (fwd)
    r_tile_b = max(min(spec.tile, 512) // S, 8)   # bwd VMEM cap

    def run_fwd(weights, pts, dirs, z):
        R = z.shape[0]
        fn = pl.pallas_call(
            lambda *refs: _render_fwd_kernel(spec, S, names, refs),
            grid=(R // r_tile,),
            in_specs=[_tile_spec(r_tile * S, 3), _tile_spec(r_tile * S, 3),
                      _tile_spec(r_tile, S)]
                     + [_const_spec(w.shape) for w in weights],
            out_specs=_tile_spec(r_tile, spec.rgbfeat + 2),
            out_shape=jax.ShapeDtypeStruct((R, spec.rgbfeat + 2),
                                           jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)),
            interpret=interpret,
        )
        return fn(pts, dirs, z, *weights)

    def run_bwd(weights, pts, dirs, z, g):
        R = z.shape[0]
        t = r_tile_b
        fn = pl.pallas_call(
            lambda *refs: _render_bwd_kernel(spec, S, names, refs),
            grid=(R // t,),
            in_specs=[_tile_spec(t * S, 3), _tile_spec(t * S, 3),
                      _tile_spec(t, S)]
                     + [_const_spec(w.shape) for w in weights]
                     + [_tile_spec(t, spec.rgbfeat + 2)],
            out_specs=[_tile_spec(t * S, 3), _tile_spec(t * S, 3),
                       _tile_spec(t, S)],
            out_shape=[jax.ShapeDtypeStruct((R * S, 3), jnp.float32),
                       jax.ShapeDtypeStruct((R * S, 3), jnp.float32),
                       jax.ShapeDtypeStruct((R, S), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)),
            interpret=interpret,
        )
        return fn(pts, dirs, z, *weights, g)

    @jax.custom_vjp
    def fused(weights, pts, dirs, z):
        return run_fwd(weights, pts, dirs, z)

    def fwd(weights, pts, dirs, z):
        return fused(weights, pts, dirs, z), (weights, pts, dirs, z)

    def bwd(res, g):
        weights, pts, dirs, z = res
        d_pts, d_dirs, d_z = run_bwd(weights, pts, dirs, z,
                                     jnp.asarray(g, jnp.float32))
        return (tuple(jnp.zeros_like(w) for w in weights),
                d_pts, d_dirs, d_z)

    fused.defvjp(fwd, bwd)
    return fused, r_tile


# --------------------------------------------------------------------------
# PRE-EMBEDDED composite-fused render: XLA computes the frequency
# embeddings (and their trig backward); the kernel runs tower + heads +
# composite and emits per-RAY outputs. This is the boundary-minimal
# variant: per iteration the pallas<->XLA traffic is emb/embd (+ their
# cotangents) — tensors the unfused scan materializes anyway — plus
# R x 133 per-ray floats, instead of the per-SAMPLE head outputs whose
# converts/copies/broadcasts cost the plain fused_pre path ~6 ms/iter
# (r4 fused_pre profile). Weights must be packed with
# pack_params(..., pre_embedded=True).
# --------------------------------------------------------------------------

def _render_fwd_kernel_pre(spec, S, names, refs):
    emb, embd, z = refs[0], refs[1], refs[2]
    cd = jnp.dtype(spec.dtype)
    n_w = len(names)
    w = dict(zip(names, refs[3:3 + n_w]))
    out_ref = refs[3 + n_w]
    r_t = z.shape[0]
    T = r_t * S
    A, B = _ray_selector(r_t, T, S), _pos_selector(T, S)

    out, _ = _tower_tile(spec, "full", w, emb[:].astype(cd),
                         embd[:].astype(cd))
    _, _, wgt, _ = _composite_pieces(out["sigma"], z[:], A, B)

    w_flat = _unfold(wgt, A, B)                       # (T, 1)
    wx = w_flat * out["rgbfeat"]                      # (T, 131)
    ray = jnp.dot(A, wx, preferred_element_type=jnp.float32)  # (R_t, 131)
    depth = jnp.sum(wgt * z[:], axis=1, keepdims=True)
    acc = jnp.sum(wgt, axis=1, keepdims=True)
    out_ref[:] = jnp.concatenate([ray, depth, acc], axis=1)


def _render_bwd_kernel_pre(spec, S, names, refs):
    """Recompute + backprop (NO trig in-kernel). Inputs: emb, embd, z,
    weights, d_out (R_t, 133). Outputs: d_emb (T, E), d_embd (T, Ed),
    d_z (R_t, S)."""
    emb, embd, z = refs[0], refs[1], refs[2]
    cd = jnp.dtype(spec.dtype)
    n_w = len(names)
    w = dict(zip(names, refs[3:3 + n_w]))
    d_out = refs[3 + n_w]
    d_emb_ref, d_embd_ref, d_z_ref = refs[4 + n_w:]
    r_t = z.shape[0]
    T = r_t * S
    C = spec.rgbfeat
    A, B = _ray_selector(r_t, T, S), _pos_selector(T, S)

    out, acts = _tower_tile(spec, "full", w, emb[:].astype(cd),
                            embd[:].astype(cd))
    sigma = out["sigma"]                               # (T, 1) f32
    rgbfeat = out["rgbfeat"]                           # (T, 131) f32
    zt = z[:]
    alpha, trans, wgt, deltas = _composite_pieces(sigma, zt, A, B)
    sig_rs = _fold(sigma, A, B)
    w_flat = _unfold(wgt, A, B)

    g = d_out[:]                                       # (R_t, 133)
    g_ray, g_depth, g_acc = g[:, :C], g[:, C:C + 1], g[:, C + 1:C + 2]

    g_rep = _per_ray_broadcast(g_ray, A)               # (T, C)
    d_rgbfeat = w_flat * g_rep                         # (T, 131)

    # STOP-GRAD rule: only rgb (plus depth/acc) feed the weight cotangent
    rgb_dot = jnp.sum(rgbfeat[:, :3] * g_rep[:, :3], axis=1,
                      keepdims=True)                   # (T, 1)
    d_w = _fold(rgb_dot, A, B) + zt * g_depth + g_acc

    dww = d_w * wgt
    suffix = jnp.dot(dww, _tri_lower_strict(S),
                     preferred_element_type=jnp.float32)
    d_alpha = d_w * trans - suffix / jnp.maximum(1.0 - alpha, _LOG_EPS)

    exp_term = jnp.exp(-deltas * sig_rs)
    d_sigma = _unfold(d_alpha * deltas * exp_term, A, B)
    d_delta = d_alpha * sig_rs * exp_term
    d_delta = jnp.concatenate(
        [d_delta[:, :-1], jnp.zeros((r_t, 1), jnp.float32)], axis=1)
    d_delta_shift = jnp.concatenate(
        [jnp.zeros((r_t, 1), jnp.float32), d_delta[:, :-1]], axis=1)
    d_z_ref[:] = wgt * g_depth + d_delta_shift - d_delta

    cts = {"sigma": d_sigma, "rgbfeat": d_rgbfeat}
    d_emb, d_embd = _mlp_backward(spec, "full", False, w, acts, cts, {},
                                  pre=True)
    d_emb_ref[:] = d_emb.astype(d_emb_ref.dtype)
    d_embd_ref[:] = d_embd.astype(d_embd_ref.dtype)


@functools.lru_cache(maxsize=None)
def make_fused_render_pre(spec: FieldSpec, S: int, interpret: bool = False):
    """Returns fused(weights, emb (R*S, E), embd (R*S, Ed), z (R, S)) ->
    (R, 133) [rgbfeat | depth | acc]. Frozen-field only."""
    names = weight_names(spec)
    r_tile = max(spec.tile // S, 8)
    r_tile_b = max(min(spec.tile, 512) // S, 8)
    E, Ed = spec.emb_xyz, spec.emb_dir

    def run_fwd(weights, emb, embd, z):
        R = z.shape[0]
        fn = pl.pallas_call(
            lambda *refs: _render_fwd_kernel_pre(spec, S, names, refs),
            grid=(R // r_tile,),
            in_specs=[_tile_spec(r_tile * S, E), _tile_spec(r_tile * S, Ed),
                      _tile_spec(r_tile, S)]
                     + [_const_spec(w.shape) for w in weights],
            out_specs=_tile_spec(r_tile, spec.rgbfeat + 2),
            out_shape=jax.ShapeDtypeStruct((R, spec.rgbfeat + 2),
                                           jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)),
            interpret=interpret,
        )
        return fn(emb, embd, z, *weights)

    def run_bwd(weights, emb, embd, z, g):
        R = z.shape[0]
        t = r_tile_b
        fn = pl.pallas_call(
            lambda *refs: _render_bwd_kernel_pre(spec, S, names, refs),
            grid=(R // t,),
            in_specs=[_tile_spec(t * S, E), _tile_spec(t * S, Ed),
                      _tile_spec(t, S)]
                     + [_const_spec(w.shape) for w in weights]
                     + [_tile_spec(t, spec.rgbfeat + 2)],
            out_specs=[_tile_spec(t * S, E), _tile_spec(t * S, Ed),
                       _tile_spec(t, S)],
            out_shape=[jax.ShapeDtypeStruct((R * S, E), emb.dtype),
                       jax.ShapeDtypeStruct((R * S, Ed), embd.dtype),
                       jax.ShapeDtypeStruct((R, S), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)),
            interpret=interpret,
        )
        return fn(emb, embd, z, *weights, g)

    @jax.custom_vjp
    def fused(weights, emb, embd, z):
        return run_fwd(weights, emb, embd, z)

    def fwd(weights, emb, embd, z):
        return fused(weights, emb, embd, z), (weights, emb, embd, z)

    def bwd(res, g):
        weights, emb, embd, z = res
        d_emb, d_embd, d_z = run_bwd(weights, emb, embd, z,
                                     jnp.asarray(g, jnp.float32))
        return (tuple(jnp.zeros_like(w) for w in weights),
                d_emb, d_embd, d_z)

    fused.defvjp(fwd, bwd)
    return fused, r_tile


def fused_render_apply_pre(spec: FieldSpec, weights: tuple,
                           xyz_emb: jnp.ndarray, dir_emb: jnp.ndarray,
                           z_vals: jnp.ndarray,
                           interpret: bool = False) -> dict:
    """Composite-fused fine render on pre-embedded inputs.
    xyz_emb (R, S, E), dir_emb (R, S, Ed) (or broadcastable), z_vals
    (R, S). Returns the same per-ray dict as fused_render_apply."""
    R, S, E = xyz_emb.shape
    fn, r_tile = make_fused_render_pre(spec, S, interpret)
    dir_emb = jnp.broadcast_to(dir_emb, (R, S, spec.emb_dir))
    pad = (-R) % r_tile
    if pad:
        xyz_emb = jnp.concatenate(
            [xyz_emb, jnp.broadcast_to(xyz_emb[-1:], (pad, S, E))], axis=0)
        dir_emb = jnp.concatenate(
            [dir_emb,
             jnp.broadcast_to(dir_emb[-1:], (pad, S, spec.emb_dir))],
            axis=0)
        z_vals = jnp.concatenate(
            [z_vals, jnp.broadcast_to(z_vals[-1:], (pad, S))], axis=0)
    out = fn(weights, xyz_emb.reshape(-1, E),
             dir_emb.reshape(-1, spec.emb_dir), z_vals)[:R]
    C = spec.rgbfeat
    depth = out[:, C]
    acc = out[:, C + 1]
    disp = 1.0 / jnp.maximum(1e-10, depth / acc)
    return {"rgb": out[:, :3], "feat": out[:, 3:C],
            "depth": depth, "acc": acc, "disp": disp}


def fused_render_apply(spec: FieldSpec, weights: tuple, pts: jnp.ndarray,
                       viewdirs: jnp.ndarray, z_vals: jnp.ndarray,
                       interpret: bool = False) -> dict:
    """Composite-fused fine render. pts (R, S, 3), viewdirs (R, 3),
    z_vals (R, S). Returns {rgb (R,3), feat (R,F), depth (R,), acc (R,),
    disp (R,)} — the test-time static fine-composite outputs
    (raw2outputs_NeRFH_NFF with output_transient=False)."""
    R, S, _ = pts.shape
    fn, r_tile = make_fused_render(spec, S, interpret)
    pad = (-R) % r_tile
    if pad:
        pts = jnp.concatenate(
            [pts, jnp.broadcast_to(pts[-1:], (pad, S, 3))], axis=0)
        viewdirs = jnp.concatenate(
            [viewdirs, jnp.broadcast_to(viewdirs[-1:], (pad, 3))], axis=0)
        z_vals = jnp.concatenate(
            [z_vals, jnp.broadcast_to(z_vals[-1:], (pad, S))], axis=0)
    Rp = R + pad
    dirs_flat = jnp.broadcast_to(viewdirs[:, None, :],
                                 (Rp, S, 3)).reshape(-1, 3)
    out = fn(weights, pts.reshape(-1, 3), dirs_flat, z_vals)[:R]
    C = spec.rgbfeat
    depth = out[:, C]
    acc = out[:, C + 1]
    # exact compositor formula (render/compositor.py:122-123)
    disp = 1.0 / jnp.maximum(1e-10, depth / acc)
    return {"rgb": out[:, :3], "feat": out[:, 3:C],
            "depth": depth, "acc": acc, "disp": disp}
