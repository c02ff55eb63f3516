"""The differentiable volume renderer — chunk-free, jit-first.

Replaces reference script/models/rendering.py:68-243 (render_rays /
batchify_rays / render). The reference drives rendering with a host-side
python loop over 32k-ray chunks and a second netchunk loop inside the MLP
query (the two HOT loops in SURVEY.md §3.1); here a render is ONE traced
program: rays are a static-shaped array, the field is applied to the full
(R, S) sample grid (MXU-batched matmuls), and memory is bounded with
``jax.checkpoint`` + optional ``lax.map`` blocking instead of host loops.
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp

from nefes_tpu.fields.embedder import EmbedConfig, embed
from nefes_tpu.render.compositor import composite
from nefes_tpu.render.sampling import hierarchical_samples, stratified_samples
from nefes_tpu.geometry.rays import get_rays


@dataclass(frozen=True)
class RenderConfig:
    """Static rendering options (the render_kwargs dict of the reference,
    nerfh_nff.py:710-736, as a hashable dataclass usable as a jit static)."""

    n_samples: int = 64            # N_samples (options.py:94)
    n_importance: int = 64         # N_importance (options.py:95)
    perturb: bool = True
    lindisp: bool = False
    raw_noise_std: float = 0.0
    white_bkgd: bool = False
    beta_min: float = 0.1
    use_fine_only: bool = False
    test_time: bool = False
    transient_at_test: bool = False
    output_transient: bool = True  # NeRFW flag (fine model transient heads)
    xyz_embed: EmbedConfig = EmbedConfig(num_freqs=10)
    dir_embed: EmbedConfig = EmbedConfig(num_freqs=4)
    # Pallas fused-field path (kernels/fused_field.py): when True the
    # coarse_fn/fine_fn passed to render_rays are RAW-input field fns
    # (packed_weights, pts, dirs, sigma_only, output_transient) and the
    # params slots carry packed weight tuples. fused_need_dw=False skips
    # all weight-grad matmuls in the kernel VJP (frozen-field refinement).
    fused: bool = False
    fused_need_dw: bool = True
    # Pre-embedded fused variant (kernels/fused_field.py:
    # fused_field_apply_pre): XLA computes the frequency embeddings (and
    # their trig backward) in wide fusions; the Pallas kernel runs only the
    # matmul tower + heads. With fused=True this routes through the
    # STANDARD embed branch of _query — the field fns consume embeddings
    # and the params slots carry pre_embedded=True packed weights. This is
    # the variant that survives value_and_grad inside the refinement scan
    # (the raw-input kernel recomputes its in-kernel trig twice and loses
    # there — r4 in-scan A/B, KERNEL_r04.json).
    fused_pre: bool = False
    # dtype name the (R, S, 63/27) frequency embeddings are MATERIALIZED
    # in before the field MLP. The field casts its input to its compute
    # dtype anyway; emitting the embedding already in that dtype halves
    # the largest activation write+read of the forward pass (the sin/cos
    # phases themselves are always computed in f32). "float32" = legacy.
    embed_dtype: str = "float32"
    # Composite-fused fine pass (kernels/fused_render.py): the fine
    # query AND the volume composite run in one Pallas kernel emitting
    # per-RAY outputs (R x 133 instead of 128R x 131 to HBM). Only valid
    # on the frozen-field test-time path without transient heads (the
    # refinement render); requires fused=True (packed weights) and
    # fine_fn built from the same FieldSpec.
    fused_render: bool = False
    # rematerialize field activations in the backward pass. True for
    # training (big ray batches would spill HBM); False for the
    # refinement renders (60x80 rays -> activations fit comfortably, and
    # skipping the recompute cuts the backward from ~1.8x to ~1.2x fwd)
    remat: bool = True

    def test(self) -> "RenderConfig":
        """The render_kwargs_test variant (nerfh_nff.py:732-735)."""
        return replace(self, perturb=False, raw_noise_std=0.0,
                       test_time=True, remat=False)


# A field application: (params, xyz_emb (..., Cx), dir_emb (..., Cd) | None,
# sigma_only, output_transient) -> head dict. Bound from NeRFHNFF.apply.
FieldFn = Callable[..., dict]


def _query(field_fn: FieldFn, params, pts: jnp.ndarray, viewdirs: jnp.ndarray,
           cfg: RenderConfig, sigma_only: bool, output_transient: bool,
           window=None) -> dict:
    """Embed sample points + dirs and apply the field over the (R, S) grid.

    window: optional (xyz_window, dir_window) Nerfies coarse-to-fine band
    weights (traced arrays — reduce_embedding=2, reference embed_DNeRF
    nerfh_nff.py:282-297). None = full bands.

    On the fused (raw) path the embedding happens inside the Pallas
    kernel — field_fn consumes raw pts/dirs. On the fused_pre path the
    standard embed branch below runs: the pre-embedded kernel fns are
    signature-compatible with the flax field fns."""
    if cfg.fused and not cfg.fused_pre:
        dirs = None if sigma_only else jnp.broadcast_to(
            viewdirs[..., None, :], pts.shape)
        return field_fn(params, pts, dirs, sigma_only, output_transient)
    w_xyz, w_dir = window if window is not None else (None, None)
    ed = jnp.dtype(cfg.embed_dtype)
    xyz_emb = embed(pts, cfg.xyz_embed, window=w_xyz).astype(ed)
    if sigma_only:
        return field_fn(params, xyz_emb, None, True, False)
    dirs = jnp.broadcast_to(viewdirs[..., None, :], pts.shape)
    dir_emb = embed(dirs, cfg.dir_embed, window=w_dir).astype(ed)
    return field_fn(params, xyz_emb, dir_emb, False, output_transient)


def render_rays(coarse_fn: FieldFn, fine_fn: FieldFn | None,
                coarse_params, fine_params,
                rays_o: jnp.ndarray, rays_d: jnp.ndarray,
                near: jnp.ndarray | float, far: jnp.ndarray | float,
                rng: jax.Array | None, cfg: RenderConfig,
                remat: bool = True, window=None) -> dict:
    """Render a batch of rays. rays_o/rays_d: (R, 3).

    Returns dict with rgb/feat/disp/acc/depth (+ rgb0/feat0/disp0/acc0,
    beta, transient_sigmas, z_std at train time) — mirroring the `ret` dict
    of reference rendering.py:156-173.

    ``remat``: rematerialize field activations in the backward pass — the
    (R, S, width) activations dominate HBM; recompute beats spilling.
    ``window``: optional (xyz_window, dir_window) Nerfies coarse-to-fine
    band weights, traced (reduce_embedding=2; annealed per epoch by the
    trainer without recompilation).
    """
    n_rays = rays_o.shape[0]
    viewdirs = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)

    if rng is not None:
        rng_strat, rng_pdf, rng_noise = jax.random.split(rng, 3)
    else:
        rng_strat = rng_pdf = rng_noise = None

    z_vals = stratified_samples(rng_strat, n_rays, cfg.n_samples, near, far,
                                lindisp=cfg.lindisp, perturb=cfg.perturb)
    pts = rays_o[..., None, :] + rays_d[..., None, :] * z_vals[..., None]

    query = _query
    if remat and cfg.remat and not cfg.fused:
        # the fused kernel's VJP recomputes in-kernel; remat would only
        # add a third forward pass
        query = jax.checkpoint(_query, static_argnums=(0, 4, 5, 6))

    # coarse pass: sigma-only at test (fast path, rendering.py:117-125)
    coarse_sigma_only = cfg.test_time and cfg.n_importance > 0
    raw_c = query(coarse_fn, coarse_params, pts, viewdirs, cfg,
                  coarse_sigma_only, False, window)
    out_c = composite(raw_c, z_vals, raw_noise_std=cfg.raw_noise_std,
                      noise_rng=rng_noise, output_transient=False,
                      white_bkgd=cfg.white_bkgd, test_time=cfg.test_time,
                      sigma_only=coarse_sigma_only)

    if cfg.n_importance == 0:
        return {"rgb": out_c["rgb"], "feat": out_c["feat"],
                "disp": out_c["disp"], "acc": out_c["acc"],
                "depth": out_c["depth"]}

    z_vals_f = hierarchical_samples(rng_pdf, z_vals, out_c["weights"],
                                    cfg.n_importance, det=not cfg.perturb,
                                    combine=not cfg.use_fine_only)
    pts_f = rays_o[..., None, :] + rays_d[..., None, :] * z_vals_f[..., None]

    if cfg.fused and cfg.fused_render:
        # composite-fused fine pass: fine_fn is a render fn emitting the
        # per-ray dict (kernels/fused_render.py) — valid only on the
        # frozen-field test-time path without transient heads
        assert cfg.test_time and not cfg.output_transient, \
            "fused_render covers the refinement render only"
        if cfg.fused_pre:
            # XLA embeds; the kernel runs tower + heads + composite.
            # fine_fn: (packed, xyz_emb (R,S,E), dir_emb (R,S,Ed), z)
            w_xyz, w_dir = window if window is not None else (None, None)
            ed = jnp.dtype(cfg.embed_dtype)
            xyz_emb = embed(pts_f, cfg.xyz_embed, window=w_xyz).astype(ed)
            dirs_f = jnp.broadcast_to(viewdirs[..., None, :], pts_f.shape)
            dir_emb = embed(dirs_f, cfg.dir_embed, window=w_dir).astype(ed)
            out_f = fine_fn(fine_params, xyz_emb, dir_emb, z_vals_f)
        else:
            # raw variant: (packed, pts (R,S,3), viewdirs (R,3), z (R,S))
            out_f = fine_fn(fine_params, pts_f, viewdirs, z_vals_f)
        return {"rgb": out_f["rgb"], "feat": out_f["feat"],
                "disp": out_f["disp"], "acc": out_f["acc"],
                "depth": out_f["depth"]}

    raw_f = query(fine_fn, fine_params, pts_f, viewdirs, cfg, False,
                  cfg.output_transient, window)
    out_f = composite(raw_f, z_vals_f, raw_noise_std=cfg.raw_noise_std,
                      noise_rng=rng_noise,
                      output_transient=cfg.output_transient,
                      beta_min=cfg.beta_min, white_bkgd=cfg.white_bkgd,
                      test_time=cfg.test_time,
                      transient_at_test=cfg.transient_at_test)

    ret = {"rgb": out_f["rgb"], "feat": out_f["feat"], "disp": out_f["disp"],
           "acc": out_f["acc"], "depth": out_f["depth"]}
    if not cfg.test_time:
        ret.update({
            "rgb0": out_c["rgb"], "feat0": out_c["feat"],
            "disp0": out_c["disp"], "acc0": out_c["acc"],
            "beta": out_f["beta"],
            "transient_sigmas": out_f["transient_sigmas"],
            # raw fine densities for the sparsity regularizers
            # (aux_losses.sigma_sparsity_loss*, reference losses.py:277-282)
            "static_sigmas": raw_f["static_sigma"],
        })
    return ret


def render_image(coarse_fn: FieldFn, fine_fn: FieldFn | None,
                 coarse_params, fine_params,
                 H: int, W: int, focal: float, c2w: jnp.ndarray,
                 near: float, far: float, cfg: RenderConfig,
                 rng: jax.Array | None = None,
                 block_rays: int = 0, window=None) -> dict:
    """Render a full H×W image from a (3, 4) camera pose.

    block_rays > 0 bounds peak memory by lax.map-ing over fixed-size ray
    blocks (the compiled replacement for the reference's batchify_rays
    python loop, rendering.py:182-195). 0 = single fused launch (right for
    the H/4 refinement renders: 60×107 rays fit easily).
    """
    rays_o, rays_d = get_rays(H, W, focal, c2w)
    rays_o = rays_o.reshape(-1, 3)
    rays_d = rays_d.reshape(-1, 3)
    run = partial(render_rays, coarse_fn, fine_fn, coarse_params, fine_params,
                  near=near, far=far, rng=rng, cfg=cfg, window=window)

    if block_rays and rays_o.shape[0] > block_rays:
        n = rays_o.shape[0]
        pad = (-n) % block_rays
        ro = jnp.pad(rays_o, ((0, pad), (0, 0)))
        rd = jnp.pad(rays_d, ((0, pad), (0, 0))).at[n:, 2].set(-1.0)
        ro = ro.reshape(-1, block_rays, 3)
        rd = rd.reshape(-1, block_rays, 3)
        out = jax.lax.map(lambda ab: run(ab[0], ab[1]), (ro, rd))
        out = jax.tree.map(
            lambda x: (x.reshape(-1, *x.shape[2:])[:n]
                       if x is not None else None), out,
            is_leaf=lambda x: x is None)
    else:
        out = run(rays_o, rays_d)

    def reshape_hw(x):
        if x is None:
            return None
        return x.reshape(H, W, *x.shape[1:]) if x.ndim >= 1 else x

    return {k: reshape_hw(v) if k in ("rgb", "feat", "disp", "acc", "depth",
                                      "rgb0", "feat0", "disp0", "acc0")
            else v for k, v in out.items()}
