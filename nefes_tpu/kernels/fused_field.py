"""Pallas fused NeRFH-NFF field kernel: embed -> MLP -> heads in one pass.

This is the TPU-native replacement for the role tiny-cuda-nn's
FullyFusedMLP plays in the reference (script/models/nerfh_nff.py:512-521,
script/models/nerfh_tcnn.py:65-149): the whole tower's weights stay
resident in VMEM while sample tiles stream through the MXU, so HBM traffic
per sample is 6 floats in (xyz + viewdir) and the head outputs back — none
of the per-layer (N, 128) activation round-trips the unfused XLA program
pays for.

Design notes (not a port — there is no CUDA analogue to translate):
  * The sin/cos frequency embedding is computed in-kernel in a
    compute-friendly layout ([x, sin(f-major), cos(f-major)]) and the
    first-layer / skip-layer / dir-layer weight ROWS are pre-permuted once
    at pack time so results match the reference channel order exactly
    (nerfh_nff.py:257-261) without any in-kernel interleaving.
  * Skip / dir concatenations become split matmuls (rows of the flax
    kernel partitioned at pack time) — no lane-relayout concats of
    activations with weights.
  * Backward is a second Pallas kernel that RECOMPUTES the forward per
    tile (rematerialization: FLOPs are cheaper than HBM) and accumulates
    weight grads in VMEM across the sequential grid. ``need_dw=False``
    (frozen field: both DFM refinement modes, SURVEY.md §2.7) skips every
    dW matmul — backward cost ~2x forward instead of ~3x.
  * Matmuls run in the pack dtype (bf16 on TPU) with f32 accumulation;
    trig and head nonlinearities in f32.

Numerics-parity with the unfused flax path is gated by
tests/test_fused_field.py (interpret mode on CPU, f32).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# --------------------------------------------------------------------------
# spec + packing
# --------------------------------------------------------------------------

@dataclass(frozen=True)
class FieldSpec:
    """Static shape description of one NeRFH-NFF tower (hashable: rides
    through jit / lru_cache as a static)."""

    depth: int = 8
    width: int = 128
    skips: tuple[int, ...] = (4,)
    n_freqs_xyz: int = 10
    n_freqs_dir: int = 4
    feature_dim: int = 128
    transient: bool = False          # fine tower has transient heads
    dtype: str = "bfloat16"          # matmul dtype ("float32" for parity tests)
    tile: int = 512                  # samples per grid step

    @property
    def emb_xyz(self) -> int:
        return 3 + 6 * self.n_freqs_xyz

    @property
    def emb_dir(self) -> int:
        return 3 + 6 * self.n_freqs_dir

    @property
    def half(self) -> int:
        return self.width // 2

    @property
    def rgbfeat(self) -> int:
        return 3 + self.feature_dim

    @classmethod
    def from_model(cls, model_cfg, typ: str, **kw) -> "FieldSpec":
        """Build from a train.ModelConfig (nefes_tpu/train/model.py)."""
        return cls(depth=model_cfg.depth, width=model_cfg.width,
                   skips=tuple(model_cfg.skips),
                   n_freqs_xyz=model_cfg.xyz_embed.num_freqs,
                   n_freqs_dir=model_cfg.dir_embed.num_freqs,
                   feature_dim=model_cfg.feature_dim,
                   transient=(typ == "fine"), **kw)


def _emb_perm(n_freqs: int) -> np.ndarray:
    """Row permutation mapping the kernel's embedding layout
    [x, sin f-major, cos f-major] onto the reference layout
    [x, sin(f0), cos(f0), sin(f1), ...] (nerfh_nff.py:257-261).

    new_rows[j] = old_rows[perm[j]]; applied to weight ROWS so
    emb_kernel @ W_perm == emb_reference @ W.
    """
    f = n_freqs
    perm = np.empty(3 + 6 * f, np.int64)
    perm[:3] = np.arange(3)
    for k in range(f):
        for i in range(3):
            perm[3 + 3 * k + i] = 3 + 6 * k + i            # sin block
            perm[3 + 3 * f + 3 * k + i] = 3 + 6 * k + 3 + i  # cos block
    return perm


def weight_names(spec: FieldSpec) -> list[str]:
    """Packed array order (the custom_vjp pytree layout)."""
    names = []
    for i in range(spec.depth):
        if i == 0:
            names += [f"l{i}_we"]
        elif i in spec.skips:
            names += [f"l{i}_we", f"l{i}_wh"]
        else:
            names += [f"l{i}_wh"]
        names += [f"l{i}_b"]
    names += ["sig_w", "sig_b", "fin_w", "fin_b",
              "dir_wh", "dir_wd", "dir_b", "rgb_w", "rgb_b"]
    if spec.transient:
        names += ["t1_wh", "t1_wd", "t1_b", "t2_w", "t2_b", "t3_w", "t3_b",
                  "ts_w", "ts_b", "tr_w", "tr_b", "tb_w", "tb_b"]
    return names


def pack_params(tower_params: dict, spec: FieldSpec,
                pre_embedded: bool = False) -> tuple:
    """flax NeRFHNFF param dict -> ordered tuple of kernel weight arrays.

    Kernels are flax (in, out); rows of embedding-consuming kernels are
    permuted via _emb_perm; concat-input kernels are split into their
    row blocks. Matmul weights cast to spec.dtype, biases stay f32
    (added post-accumulation).

    pre_embedded=True keeps the reference row order (no _emb_perm): the
    pre-embedded kernel variant consumes XLA-computed embeddings, which
    already arrive in the reference layout (fields/embedder.py).
    """
    dt = jnp.dtype(spec.dtype)
    ident = np.arange
    px = (ident(3 + 6 * spec.n_freqs_xyz) if pre_embedded
          else _emb_perm(spec.n_freqs_xyz))
    pd = (ident(3 + 6 * spec.n_freqs_dir) if pre_embedded
          else _emb_perm(spec.n_freqs_dir))
    E, W, H = spec.emb_xyz, spec.width, spec.half

    def k(name):
        return tower_params[name]["kernel"]

    def b(name):
        return tower_params[name]["bias"].astype(jnp.float32).reshape(1, -1)

    out = {}
    for i in range(spec.depth):
        kern = k(f"xyz_encoding_{i + 1}")
        if i == 0:
            out[f"l{i}_we"] = kern[px].astype(dt)
        elif i in spec.skips:
            out[f"l{i}_we"] = kern[:E][px].astype(dt)
            out[f"l{i}_wh"] = kern[E:].astype(dt)
        else:
            out[f"l{i}_wh"] = kern.astype(dt)
        out[f"l{i}_b"] = b(f"xyz_encoding_{i + 1}")

    out["sig_w"] = k("static_sigma").astype(dt)
    out["sig_b"] = b("static_sigma")
    out["fin_w"] = k("xyz_encoding_final").astype(dt)
    out["fin_b"] = b("xyz_encoding_final")
    dk = k("dir_encoding")
    out["dir_wh"] = dk[:W].astype(dt)
    out["dir_wd"] = dk[W:][pd].astype(dt)
    out["dir_b"] = b("dir_encoding")
    out["rgb_w"] = k("static_rgb").astype(dt)
    out["rgb_b"] = b("static_rgb")
    if spec.transient:
        tk = k("transient_encoding_1")
        out["t1_wh"] = tk[:W].astype(dt)
        out["t1_wd"] = tk[W:][pd].astype(dt)
        out["t1_b"] = b("transient_encoding_1")
        out["t2_w"] = k("transient_encoding_2").astype(dt)
        out["t2_b"] = b("transient_encoding_2")
        out["t3_w"] = k("transient_encoding_3").astype(dt)
        out["t3_b"] = b("transient_encoding_3")
        out["ts_w"] = k("transient_sigma").astype(dt)
        out["ts_b"] = b("transient_sigma")
        out["tr_w"] = k("transient_rgb").astype(dt)
        out["tr_b"] = b("transient_rgb")
        out["tb_w"] = k("transient_beta").astype(dt)
        out["tb_b"] = b("transient_beta")
    return tuple(out[n] for n in weight_names(spec))


# --------------------------------------------------------------------------
# kernel bodies
# --------------------------------------------------------------------------

def _mm(a, w, prefer=jnp.float32):
    # Mosaic requires 32-bit matmul accumulators; `prefer` below f32 means
    # "accumulate f32, round to `prefer` on the way out" (the convert sits
    # in the matmul epilogue, keeping bias/relu off the f32 VPU path)
    out = jnp.dot(a, w[:], preferred_element_type=jnp.float32)
    return out if prefer == jnp.float32 else out.astype(prefer)


def _mm_t(g, w, prefer=jnp.float32):
    """g @ w^T without materializing the transpose (contract out-dims).
    f32 accumulation (Mosaic requirement), rounded to `prefer`."""
    out = jax.lax.dot_general(
        g, w[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    return out if prefer == jnp.float32 else out.astype(prefer)


def _relu_mask(h):
    """relu' from the post-activation value. f32 compare: the v5e VPU has
    no bf16 cmpf (Mosaic: 'Target does not support this comparison')."""
    return h.astype(jnp.float32) > 0.0


def _embed_block(x, n_freqs, cd):
    """x (T, 3) f32 -> (emb (T, E) in cd, xs (T, 3F) f32 for backward).

    The frequency scaling MUST be elementwise f32 (VPU): an MXU matmul
    quantizes inputs to bf16, and a 0.4% relative error on x·2^9 is ~2
    radians of phase — sin/cos garbage for the high bands (the bug the
    f32-oracle probe caught at 20x the flax-bf16 error)."""
    bands = 2.0 ** np.linspace(0.0, n_freqs - 1, n_freqs)
    xs = jnp.concatenate([x * float(f) for f in bands], axis=1)  # (T, 3F)
    emb = jnp.concatenate(
        [x.astype(cd), jnp.sin(xs).astype(cd), jnp.cos(xs).astype(cd)],
        axis=1)
    return emb, xs


def _forward_tile(spec: FieldSpec, mode: str, w, pts, dirs):
    """Shared forward trace over one tile (raw pts/dirs: in-kernel embed).

    Returns (outputs dict, activations dict) — activations only consumed by
    the backward kernel (they are in-register values, never written out by
    the forward pallas_call).
    """
    cd = jnp.dtype(spec.dtype)

    x = pts.astype(jnp.float32)
    emb, xs = _embed_block(x, spec.n_freqs_xyz, cd)
    embd = ds = None
    if mode != "sigma":
        d = dirs.astype(jnp.float32)
        embd, ds = _embed_block(d, spec.n_freqs_dir, cd)
    out, acts = _tower_tile(spec, mode, w, emb, embd)
    acts["xs"] = xs
    if ds is not None:
        acts["ds"] = ds
    return out, acts


def _tower_tile(spec: FieldSpec, mode: str, w, emb, embd):
    """MLP tower + heads over one tile of pre-embedded inputs.

    emb (T, emb_xyz) / embd (T, emb_dir) in the pack dtype. Shared by the
    raw-input kernels (fed from _embed_block) and the pre-embedded kernels
    (fed from refs written by XLA's embed fusion).
    """
    cd = jnp.dtype(spec.dtype)
    acts = {"emb": emb}

    # Hidden layers accumulate in the pack dtype (MXU still sums f32
    # internally and rounds on output): bias-add + relu stay bf16 — the
    # f32 elementwise variant doubled VPU work and made the kernel SLOWER
    # than the XLA path (runtime/kernel_sweep.py). This matches flax
    # Dense(dtype=bf16) semantics exactly. Only the heads accumulate f32.
    # NOTE for the backward: only the post-relu activations are kept
    # (relu masks are recovered as h > 0); keeping pre-activations too
    # blew the 16 MB VMEM budget at tile >= 1024.
    h = emb
    for i in range(spec.depth):
        z = _mm(h if i else emb, w[f"l{i}_wh" if i else f"l{i}_we"],
                prefer=cd)
        if i and i in spec.skips:
            z = z + _mm(emb, w[f"l{i}_we"], prefer=cd)
        z = z + w[f"l{i}_b"][:].astype(cd)
        h = jnp.maximum(z, 0.0)
        acts[f"h{i}"] = h

    zs = _mm(h, w["sig_w"]) + w["sig_b"][:]
    acts["zs"] = zs
    out = {"sigma": jax.nn.softplus(zs)}
    if mode == "sigma":
        return out, acts

    final = _mm(h, w["fin_w"], prefer=cd) + w["fin_b"][:].astype(cd)
    acts["final"] = final
    acts["embd"] = embd

    zd = (_mm(final, w["dir_wh"], prefer=cd)
          + _mm(embd, w["dir_wd"], prefer=cd) + w["dir_b"][:].astype(cd))
    de = jnp.maximum(zd, 0.0)
    acts["de"] = de
    out["rgbfeat"] = _mm(de, w["rgb_w"]) + w["rgb_b"][:]
    if mode != "transient":
        return out, acts

    zt1 = (_mm(final, w["t1_wh"], prefer=cd)
           + _mm(embd, w["t1_wd"], prefer=cd) + w["t1_b"][:].astype(cd))
    t1 = jnp.maximum(zt1, 0.0)
    zt2 = _mm(t1, w["t2_w"], prefer=cd) + w["t2_b"][:].astype(cd)
    t2 = jnp.maximum(zt2, 0.0)
    zt3 = _mm(t2, w["t3_w"], prefer=cd) + w["t3_b"][:].astype(cd)
    t3 = jnp.maximum(zt3, 0.0)
    acts.update(t1=t1, t2=t2, t3=t3)

    zts = _mm(t3, w["ts_w"]) + w["ts_b"][:]
    ztr = _mm(t3, w["tr_w"]) + w["tr_b"][:]
    ztb = _mm(t3, w["tb_w"]) + w["tb_b"][:]
    acts.update(zts=zts, ztr=ztr, ztb=ztb)
    out["transient"] = jnp.concatenate(
        [jax.nn.softplus(zts), jax.nn.sigmoid(ztr), jax.nn.softplus(ztb)],
        axis=1)
    return out, acts


def _out_names(mode: str) -> list[str]:
    return {"sigma": ["sigma"], "full": ["sigma", "rgbfeat"],
            "transient": ["sigma", "rgbfeat", "transient"]}[mode]


def _out_dims(spec: FieldSpec, mode: str) -> dict:
    return {"sigma": 1, "rgbfeat": spec.rgbfeat, "transient": 5}


def _fwd_kernel(spec, mode, names, refs):
    pts, dirs = refs[0], refs[1]
    w = dict(zip(names, refs[2:2 + len(names)]))
    outs = refs[2 + len(names):]
    out, _ = _forward_tile(spec, mode, w, pts[:], dirs[:])
    for ref, name in zip(outs, _out_names(mode)):
        ref[:] = out[name].astype(jnp.float32)


def _bwd_kernel(spec, mode, need_dw, names, refs):
    """Recompute forward, then backprop. Inputs: pts, dirs, weights,
    cotangents (one per output). Outputs: d_pts, d_dirs [, dW per weight].
    Weight grads accumulate in VMEM across the sequential grid."""
    onames = _out_names(mode)
    n_w = len(names)
    pts, dirs = refs[0], refs[1]
    w = dict(zip(names, refs[2:2 + n_w]))
    cts = dict(zip(onames, refs[2 + n_w:2 + n_w + len(onames)]))
    outs = refs[2 + n_w + len(onames):]
    d_pts_ref, d_dirs_ref = outs[0], outs[1]
    dw = dict(zip(names, outs[2:])) if need_dw else {}

    if need_dw:
        @pl.when(pl.program_id(0) == 0)
        def _init():
            for r in dw.values():
                r[:] = jnp.zeros_like(r)

    _, a = _forward_tile(spec, mode, w, pts[:], dirs[:])
    cts = {k: v[:] for k, v in cts.items()}
    d_pts, d_dirs = _mlp_backward(spec, mode, need_dw, w, a, cts, dw)
    d_pts_ref[:] = d_pts
    if d_dirs is not None:
        d_dirs_ref[:] = d_dirs
    else:
        d_dirs_ref[:] = jnp.zeros_like(d_dirs_ref)


def _out_names_pre(mode: str) -> list[str]:
    """The pre-embedded kernels emit SPLIT heads (exactly the flax head
    tensors) so no (N, 131)/(N, 5) HBM-level slices or concats appear at
    the kernel boundary — the r4 fused_pre profile showed those slices and
    their layout copies costing ~4 ms/iter."""
    return {"sigma": ["sigma"],
            "full": ["sigma", "rgb", "feat"],
            "transient": ["sigma", "rgb", "feat",
                          "tsig", "trgb", "tbeta"]}[mode]


def _out_dims_pre(spec: FieldSpec) -> dict:
    return {"sigma": 1, "rgb": 3, "feat": spec.feature_dim,
            "tsig": 1, "trgb": 3, "tbeta": 1}


def _split_heads(spec, mode, out):
    """Kernel-internal (VMEM, per-tile) split of the fused head tensors
    into the flax-shaped outputs."""
    named = {"sigma": out["sigma"]}
    if mode != "sigma":
        rf = out["rgbfeat"]
        named["rgb"] = rf[:, :3]
        named["feat"] = rf[:, 3:]
    if mode == "transient":
        tr = out["transient"]
        named["tsig"] = tr[:, 0:1]
        named["trgb"] = tr[:, 1:4]
        named["tbeta"] = tr[:, 4:5]
    return named


def _fwd_kernel_pre(spec, mode, names, refs):
    """Pre-embedded forward: refs start with emb (T, E) [, embd (T, Ed)].
    Outputs are written in the PACK dtype (bf16 on device — matching the
    flax head_dtype the unfused scan runs with; f32 outputs doubled the
    composite's read traffic and spawned convert fusions downstream)."""
    cd = jnp.dtype(spec.dtype)
    off = 1 if mode == "sigma" else 2
    emb = refs[0][:].astype(cd)
    embd = None if mode == "sigma" else refs[1][:].astype(cd)
    w = dict(zip(names, refs[off:off + len(names)]))
    outs = refs[off + len(names):]
    out, _ = _tower_tile(spec, mode, w, emb, embd)
    named = _split_heads(spec, mode, out)
    for ref, name in zip(outs, _out_names_pre(mode)):
        ref[:] = named[name].astype(ref.dtype)


def _bwd_kernel_pre(spec, mode, need_dw, names, refs):
    """Pre-embedded backward: recompute the tower (NO trig — the whole
    point: the raw-input backward spends most of its time on narrow-lane
    in-kernel sin/cos; here the embedding and its chain rule live in XLA's
    wide fusions), then backprop to (d_emb [, d_embd] [, dW...]).

    Split-head cotangents are reassembled per tile in VMEM; d_emb/d_embd
    are written directly in the embedding's dtype (no XLA convert pass)."""
    cd = jnp.dtype(spec.dtype)
    onames = _out_names_pre(mode)
    n_w = len(names)
    off = 1 if mode == "sigma" else 2
    emb = refs[0][:].astype(cd)
    embd = None if mode == "sigma" else refs[1][:].astype(cd)
    w = dict(zip(names, refs[off:off + n_w]))
    g = dict(zip(onames, refs[off + n_w:off + n_w + len(onames)]))
    outs = refs[off + n_w + len(onames):]
    d_emb_ref = outs[0]
    d_embd_ref = None if mode == "sigma" else outs[1]
    dw = dict(zip(names, outs[off:])) if need_dw else {}

    if need_dw:
        @pl.when(pl.program_id(0) == 0)
        def _init():
            for r in dw.values():
                r[:] = jnp.zeros_like(r)

    _, a = _tower_tile(spec, mode, w, emb, embd)
    cts = {"sigma": g["sigma"][:].astype(jnp.float32)}
    if mode != "sigma":
        cts["rgbfeat"] = jnp.concatenate(
            [g["rgb"][:], g["feat"][:]], axis=1).astype(jnp.float32)
    if mode == "transient":
        cts["transient"] = jnp.concatenate(
            [g["tsig"][:], g["trgb"][:], g["tbeta"][:]],
            axis=1).astype(jnp.float32)
    d_emb, d_embd = _mlp_backward(spec, mode, need_dw, w, a, cts, dw,
                                  pre=True)
    d_emb_ref[:] = d_emb.astype(d_emb_ref.dtype)
    if d_embd_ref is not None:
        d_embd_ref[:] = d_embd.astype(d_embd_ref.dtype)


def _mlp_backward(spec, mode, need_dw, w, a, cts, dw, pre: bool = False):
    """Backprop the MLP tower given head cotangents (values, not refs):
    cts['sigma'] (T, 1) on the softplus OUTPUT, cts['rgbfeat'] (T, 131),
    cts['transient'] (T, 5). Accumulates into dw refs when need_dw.
    Returns (d_pts (T, 3) f32, d_dirs (T, 3) f32 | None) — or, with
    pre=True, the embedding cotangents (d_emb (T, E) f32, d_embd (T, Ed)
    f32 | None) with the trig chain rule left to XLA (the pre-embedded
    kernels). Shared by the plain field backward, the pre-embedded
    backward and the composite-fused render backward."""
    cd = jnp.dtype(spec.dtype)

    def acc(name, val):
        if need_dw:
            dw[name][:] += val

    def dmat(g, act, wname, bname):
        """Backprop one dense: returns d_act (pack dtype — the f32
        elementwise chain was the kernel's VPU bottleneck); accumulates
        dW/db in f32."""
        if need_dw:
            dw[wname][:] += jax.lax.dot_general(
                act, g.astype(act.dtype),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(dw[wname].dtype)
            dw[bname][:] += jnp.sum(g.astype(jnp.float32), axis=0,
                                    keepdims=True)
        return _mm_t(g.astype(cd), w[wname], prefer=cd)

    # ---- heads ----
    g_sig = cts["sigma"]
    dzs = g_sig * jax.nn.sigmoid(a["zs"])                  # softplus'
    dh = dmat(dzs, a[f"h{spec.depth - 1}"], "sig_w", "sig_b")

    d_final = None
    d_embd = None
    if mode != "sigma":
        g_rf = cts["rgbfeat"]
        dde = dmat(g_rf, a["de"], "rgb_w", "rgb_b")
        dzd = dde * _relu_mask(a["de"])
        d_final = dmat(dzd, a["final"], "dir_wh", "dir_b")
        if need_dw:
            dw["dir_wd"][:] += jax.lax.dot_general(
                a["embd"], dzd.astype(a["embd"].dtype),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(dw["dir_wd"].dtype)
        d_embd = _mm_t(dzd.astype(cd), w["dir_wd"]).astype(jnp.float32)

    if mode == "transient":
        g_tr = cts["transient"]
        dzts = g_tr[:, 0:1] * jax.nn.sigmoid(a["zts"])
        sig_tr = jax.nn.sigmoid(a["ztr"])
        dztr = g_tr[:, 1:4] * sig_tr * (1.0 - sig_tr)
        dztb = g_tr[:, 4:5] * jax.nn.sigmoid(a["ztb"])
        dt3 = (dmat(dzts, a["t3"], "ts_w", "ts_b")
               + dmat(dztr, a["t3"], "tr_w", "tr_b")
               + dmat(dztb, a["t3"], "tb_w", "tb_b"))
        dzt3 = dt3 * _relu_mask(a["t3"])
        dt2 = dmat(dzt3, a["t2"], "t3_w", "t3_b")
        dzt2 = dt2 * _relu_mask(a["t2"])
        dt1 = dmat(dzt2, a["t1"], "t2_w", "t2_b")
        dzt1 = dt1 * _relu_mask(a["t1"])
        d_final = d_final + dmat(dzt1, a["final"], "t1_wh", "t1_b")
        if need_dw:
            dw["t1_wd"][:] += jax.lax.dot_general(
                a["embd"], dzt1.astype(a["embd"].dtype),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(dw["t1_wd"].dtype)
        d_embd = d_embd + _mm_t(dzt1.astype(cd),
                                w["t1_wd"]).astype(jnp.float32)

    if d_final is not None:
        dh = dh + dmat(d_final, a[f"h{spec.depth - 1}"], "fin_w", "fin_b")

    # ---- xyz tower ----
    d_emb = jnp.zeros_like(a["emb"], dtype=jnp.float32)
    for i in range(spec.depth - 1, -1, -1):
        dz = dh * _relu_mask(a[f"h{i}"])
        if i == 0:
            if need_dw:
                dw["l0_we"][:] += jax.lax.dot_general(
                    a["emb"], dz.astype(a["emb"].dtype),
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32).astype(
                        dw["l0_we"].dtype)
                dw["l0_b"][:] += jnp.sum(dz.astype(jnp.float32), axis=0,
                                         keepdims=True)
            d_emb = d_emb + _mm_t(dz.astype(cd),
                                  w["l0_we"]).astype(jnp.float32)
        else:
            dh = dmat(dz, a[f"h{i - 1}"], f"l{i}_wh", f"l{i}_b")
            if i in spec.skips:
                if need_dw:
                    dw[f"l{i}_we"][:] += jax.lax.dot_general(
                        a["emb"], dz.astype(a["emb"].dtype),
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32).astype(
                            dw[f"l{i}_we"].dtype)
                d_emb = d_emb + _mm_t(dz.astype(cd),
                                      w[f"l{i}_we"]).astype(jnp.float32)

    if pre:
        return d_emb, d_embd

    # ---- embedding chain rule: d_emb -> d_pts (elementwise f32; see
    # _embed_block for why no MXU here) ----
    def d_embed(d_e, xsv, n_freqs):
        f3 = 3 * n_freqs
        dxs = (d_e[:, 3:3 + f3] * jnp.cos(xsv)
               - d_e[:, 3 + f3:3 + 2 * f3] * jnp.sin(xsv))
        bands = 2.0 ** np.linspace(0.0, n_freqs - 1, n_freqs)
        out = d_e[:, :3]
        for k, f in enumerate(bands):
            out = out + dxs[:, 3 * k:3 * k + 3] * float(f)
        return out

    d_pts = d_embed(d_emb, a["xs"], spec.n_freqs_xyz)
    d_dirs = (d_embed(d_embd, a["ds"], spec.n_freqs_dir)
              if d_embd is not None else None)
    return d_pts, d_dirs


# --------------------------------------------------------------------------
# pallas_call wrappers + custom VJP
# --------------------------------------------------------------------------

def _const_spec(shape):
    return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                        memory_space=pltpu.VMEM)


def _tile_spec(tile, c):
    return pl.BlockSpec((tile, c), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)


def _run_fwd(spec, mode, interpret, weights, pts, dirs):
    n = pts.shape[0]
    t = spec.tile
    grid = (n // t,)
    names = weight_names(spec)
    dims = _out_dims(spec, mode)
    onames = _out_names(mode)
    out_shape = [jax.ShapeDtypeStruct((n, dims[o]), jnp.float32)
                 for o in onames]
    fn = pl.pallas_call(
        lambda *refs: _fwd_kernel(spec, mode, names, refs),
        grid=grid,
        in_specs=[_tile_spec(t, 3), _tile_spec(t, 3)]
                 + [_const_spec(w.shape) for w in weights],
        out_specs=[_tile_spec(t, dims[o]) for o in onames],
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            # fwd tiles are independent -> Mosaic may pipeline/split them
            # (the bwd kernel stays sequential: dW accumulates in VMEM)
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )
    return tuple(fn(pts, dirs, *weights))


def _run_bwd(spec, mode, need_dw, interpret, weights, pts, dirs, cts):
    n = pts.shape[0]
    # the recompute-backward holds ~2x the forward's live activations;
    # tiles over 512 blow the 16 MB VMEM budget, so bwd tiles are capped
    # independently of the forward tile
    t = min(spec.tile, 512)
    names = weight_names(spec)
    dims = _out_dims(spec, mode)
    onames = _out_names(mode)
    out_shape = [jax.ShapeDtypeStruct((n, 3), jnp.float32),
                 jax.ShapeDtypeStruct((n, 3), jnp.float32)]
    out_specs = [_tile_spec(t, 3), _tile_spec(t, 3)]
    if need_dw:
        for w in weights:
            out_shape.append(jax.ShapeDtypeStruct(w.shape, jnp.float32))
            out_specs.append(_const_spec(w.shape))
    fn = pl.pallas_call(
        lambda *refs: _bwd_kernel(spec, mode, need_dw, names, refs),
        grid=(n // t,),
        in_specs=[_tile_spec(t, 3), _tile_spec(t, 3)]
                 + [_const_spec(w.shape) for w in weights]
                 + [_tile_spec(t, dims[o]) for o in onames],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )
    return fn(pts, dirs, *weights, *cts)


@functools.lru_cache(maxsize=None)
def make_fused_field(spec: FieldSpec, mode: str, need_dw: bool = True,
                     interpret: bool = False):
    """Returns fused(weights_tuple, pts (N,3), dirs (N,3)) -> head dict.

    N must be a multiple of spec.tile (use fused_field_apply for auto
    padding). Differentiable wrt pts, dirs and — when need_dw — weights
    (matmul weight grads are f32 regardless of pack dtype; with
    need_dw=False weight cotangents are zeros).
    """

    @jax.custom_vjp
    def fused(weights, pts, dirs):
        return _run_fwd(spec, mode, interpret, weights, pts, dirs)

    def fwd(weights, pts, dirs):
        return fused(weights, pts, dirs), (weights, pts, dirs)

    def bwd(res, g):
        weights, pts, dirs = res
        cts = tuple(jnp.asarray(gi, jnp.float32) for gi in g)
        outs = _run_bwd(spec, mode, need_dw, interpret, weights, pts, dirs,
                        cts)
        d_pts, d_dirs = outs[0], outs[1]
        if need_dw:
            dws = tuple(dw.astype(w.dtype)
                        for dw, w in zip(outs[2:], weights))
        else:
            dws = tuple(jnp.zeros_like(w) for w in weights)
        return dws, d_pts, d_dirs

    fused.defvjp(fwd, bwd)
    return fused


def _run_fwd_pre(spec, mode, interpret, weights, emb, embd):
    n = emb.shape[0]
    t = spec.tile
    names = weight_names(spec)
    dims = _out_dims_pre(spec)
    onames = _out_names_pre(mode)
    cd = jnp.dtype(spec.dtype)
    in_specs = [_tile_spec(t, spec.emb_xyz)]
    ops = [emb]
    if mode != "sigma":
        in_specs.append(_tile_spec(t, spec.emb_dir))
        ops.append(embd)
    fn = pl.pallas_call(
        lambda *refs: _fwd_kernel_pre(spec, mode, names, refs),
        grid=(n // t,),
        in_specs=in_specs + [_const_spec(w.shape) for w in weights],
        out_specs=[_tile_spec(t, dims[o]) for o in onames],
        out_shape=[jax.ShapeDtypeStruct((n, dims[o]), cd)
                   for o in onames],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )
    return tuple(fn(*ops, *weights))


def _run_bwd_pre(spec, mode, need_dw, interpret, weights, emb, embd, cts):
    n = emb.shape[0]
    t = min(spec.tile, 512)
    names = weight_names(spec)
    dims = _out_dims_pre(spec)
    onames = _out_names_pre(mode)
    in_specs = [_tile_spec(t, spec.emb_xyz)]
    ops = [emb]
    out_shape = [jax.ShapeDtypeStruct((n, spec.emb_xyz), emb.dtype)]
    out_specs = [_tile_spec(t, spec.emb_xyz)]
    if mode != "sigma":
        in_specs.append(_tile_spec(t, spec.emb_dir))
        ops.append(embd)
        out_shape.append(jax.ShapeDtypeStruct((n, spec.emb_dir),
                                              embd.dtype))
        out_specs.append(_tile_spec(t, spec.emb_dir))
    if need_dw:
        for w in weights:
            out_shape.append(jax.ShapeDtypeStruct(w.shape, jnp.float32))
            out_specs.append(_const_spec(w.shape))
    fn = pl.pallas_call(
        lambda *refs: _bwd_kernel_pre(spec, mode, need_dw, names, refs),
        grid=(n // t,),
        in_specs=in_specs + [_const_spec(w.shape) for w in weights]
                 + [_tile_spec(t, dims[o]) for o in onames],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )
    return fn(*ops, *weights, *cts)


@functools.lru_cache(maxsize=None)
def make_fused_field_pre(spec: FieldSpec, mode: str, need_dw: bool = True,
                         interpret: bool = False):
    """Pre-embedded fused tower: fused(weights, emb (N, E) [, embd
    (N, Ed)]) -> head tuple. XLA computes the frequency embeddings (and
    their trig backward) in its wide elementwise fusions; the kernel runs
    only the matmul tower + heads. This keeps the custom-VJP fwd kernel
    cheap enough that value_and_grad (which must run BOTH the fwd kernel
    and the recompute-backward kernel — they cannot share activations
    across pallas_call boundaries) still beats the unfused XLA program;
    the raw-input kernel pays its in-kernel trig twice and loses there
    (the r4 in-scan A/B, KERNEL_r04.json)."""

    cd = jnp.dtype(spec.dtype)

    if mode == "sigma":

        @jax.custom_vjp
        def fused(weights, emb):
            return _run_fwd_pre(spec, mode, interpret, weights, emb, None)

        def fwd(weights, emb):
            return fused(weights, emb), (weights, emb)

        def bwd(res, g):
            weights, emb = res
            cts = tuple(jnp.asarray(gi, cd) for gi in g)
            outs = _run_bwd_pre(spec, mode, need_dw, interpret, weights,
                                emb, None, cts)
            if need_dw:
                dws = tuple(dw.astype(w.dtype)
                            for dw, w in zip(outs[1:], weights))
            else:
                dws = tuple(jnp.zeros_like(w) for w in weights)
            return dws, outs[0]

        fused.defvjp(fwd, bwd)
        return fused

    @jax.custom_vjp
    def fused(weights, emb, embd):
        return _run_fwd_pre(spec, mode, interpret, weights, emb, embd)

    def fwd(weights, emb, embd):
        return fused(weights, emb, embd), (weights, emb, embd)

    def bwd(res, g):
        weights, emb, embd = res
        cts = tuple(jnp.asarray(gi, cd) for gi in g)
        outs = _run_bwd_pre(spec, mode, need_dw, interpret, weights, emb,
                            embd, cts)
        if need_dw:
            dws = tuple(dw.astype(w.dtype)
                        for dw, w in zip(outs[2:], weights))
        else:
            dws = tuple(jnp.zeros_like(w) for w in weights)
        return dws, outs[0], outs[1]

    fused.defvjp(fwd, bwd)
    return fused


def fused_field_apply_pre(spec: FieldSpec, weights: tuple,
                          xyz_emb: jnp.ndarray,
                          dir_emb: jnp.ndarray | None = None,
                          sigma_only: bool = False,
                          output_transient: bool = True,
                          need_dw: bool = True,
                          interpret: bool = False) -> dict:
    """Drop-in for NeRFHNFF.apply on EMBEDDED inputs — the same signature
    as the flax field fns (model.coarse_fn/fine_fn minus the params slot),
    so the renderer's standard embed branch can drive it directly.

    weights MUST be packed with pack_params(..., pre_embedded=True) (the
    reference embedding row order — XLA's embed emits it natively).
    xyz_emb: (..., E); dir_emb: (..., Ed) broadcastable against xyz_emb's
    leading shape. Returns the flax-named head dict with f32 leaves."""
    mode = ("sigma" if sigma_only
            else ("transient" if (spec.transient and output_transient)
                  else "full"))
    lead = xyz_emb.shape[:-1]
    flat = xyz_emb.reshape(-1, spec.emb_xyz)
    n = flat.shape[0]
    pad = (-n) % spec.tile
    flat = jnp.pad(flat, ((0, pad), (0, 0)))
    fn = make_fused_field_pre(spec, mode, need_dw, interpret)
    if mode == "sigma":
        outs = fn(weights, flat)
    else:
        dflat = jnp.broadcast_to(dir_emb, lead + (spec.emb_dir,))
        dflat = dflat.reshape(-1, spec.emb_dir)
        dflat = jnp.pad(dflat, ((0, pad), (0, 0)))
        outs = fn(weights, flat, dflat)
    named = dict(zip(_out_names_pre(mode), outs))

    def shape(x, c):
        x = x[:n]
        return x.reshape(lead + (c,)) if c > 1 else x[..., 0].reshape(lead)

    flax_names = {"sigma": "static_sigma", "rgb": "static_rgb",
                  "feat": "static_feat", "tsig": "transient_sigma",
                  "trgb": "transient_rgb", "tbeta": "transient_beta"}
    dims = _out_dims_pre(spec)
    return {flax_names[k]: shape(v, dims[k]) for k, v in named.items()}


def _shape_head_outputs(spec: FieldSpec, mode: str, outs: tuple,
                        lead: tuple, n: int) -> dict:
    """Unpad + reshape kernel head outputs into the flax-named dict."""
    named = dict(zip(_out_names(mode), outs))

    def shape(x, c):
        x = x[:n]
        return x.reshape(lead + (c,)) if c > 1 else x[..., 0].reshape(lead)

    ret = {"static_sigma": shape(named["sigma"], 1)}
    if mode == "sigma":
        return ret
    rf = named["rgbfeat"]
    ret["static_rgb"] = shape(rf[:, :3], 3)
    ret["static_feat"] = shape(rf[:, 3:], spec.feature_dim)
    if mode == "transient":
        tr = named["transient"]
        ret["transient_sigma"] = shape(tr[:, 0:1], 1)
        ret["transient_rgb"] = shape(tr[:, 1:4], 3)
        ret["transient_beta"] = shape(tr[:, 4:5], 1)
    return ret


def fused_field_apply(spec: FieldSpec, weights: tuple, pts: jnp.ndarray,
                      dirs: jnp.ndarray | None, sigma_only: bool = False,
                      output_transient: bool = True,
                      need_dw: bool = True,
                      interpret: bool = False) -> dict:
    """Drop-in for NeRFHNFF.apply on raw (not embedded) inputs.

    pts: (..., 3); dirs: (..., 3) broadcastable to pts (per-sample view
    directions). Returns the same named-head dict as the flax module
    (fields/nerfh_nff.py:70-94) with f32 leaves shaped like the inputs.
    """
    mode = ("sigma" if sigma_only
            else ("transient" if (spec.transient and output_transient)
                  else "full"))
    lead = pts.shape[:-1]
    flat = pts.reshape(-1, 3)
    n = flat.shape[0]
    pad = (-n) % spec.tile
    flat = jnp.pad(flat, ((0, pad), (0, 0)))
    if dirs is None:
        dflat = jnp.zeros_like(flat)
    else:
        dflat = jnp.broadcast_to(dirs, lead + (3,)).reshape(-1, 3)
        dflat = jnp.pad(dflat, ((0, pad), (0, 0)))

    fn = make_fused_field(spec, mode, need_dw, interpret)
    outs = fn(weights, flat, dflat)
    return _shape_head_outputs(spec, mode, outs, lead, n)
