"""NeFeSModel — the full model bundle (coarse field + fine field + exposure
MLP + fusion CNN) with one params pytree.

The reference hangs the exposure MLP and FusionNet off the *coarse* torch
module (nerfh_nff.py:508-522) purely for checkpoint convenience; here they
are peer modules under one pytree: params = {coarse, fine, exposure,
fusion} (+ batch_stats for the fusion BN), which shards/jits cleanly.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dfield
from typing import Any

import jax
import jax.numpy as jnp

from nefes_tpu.fields.embedder import EmbedConfig
from nefes_tpu.fields.nerfh_nff import (
    FEATURE_DIM, ExposureMLP, FusionNet, NeRFHNFF, affine_color_transform,
)
from nefes_tpu.render.renderer import RenderConfig


@dataclass(frozen=True)
class ModelConfig:
    depth: int = 8
    width: int = 128
    feature_dim: int = FEATURE_DIM
    skips: tuple[int, ...] = (4,)
    hist_bin: int = 10
    encode_hist: bool = True   # exposure MLP on/off (options.py:66)
    fusion_residual: bool = False
    fusion_no_bn: bool = False
    xyz_embed: EmbedConfig = EmbedConfig(num_freqs=10)
    dir_embed: EmbedConfig = EmbedConfig(num_freqs=4)
    dtype: Any = jnp.float32

    def render_config(self, **overrides) -> RenderConfig:
        overrides.setdefault("embed_dtype", jnp.dtype(self.dtype).name)
        return RenderConfig(xyz_embed=self.xyz_embed,
                            dir_embed=self.dir_embed, **overrides)

    @classmethod
    def tiny(cls) -> "ModelConfig":
        """Small config for CPU tests."""
        return cls(depth=2, width=32, feature_dim=8, skips=(1,),
                   xyz_embed=EmbedConfig(num_freqs=4),
                   dir_embed=EmbedConfig(num_freqs=2))


@dataclass(frozen=True)
class NeFeSModel:
    """Frozen (hashable) so it can ride through jit as a static argument."""

    cfg: ModelConfig
    coarse: NeRFHNFF = dfield(init=False)
    fine: NeRFHNFF = dfield(init=False)
    exposure: ExposureMLP = dfield(init=False)
    fusion: FusionNet = dfield(init=False)

    def __post_init__(self):
        c = self.cfg
        kw = dict(depth=c.depth, width=c.width, skips=c.skips,
                  in_channels_xyz=c.xyz_embed.out_dim,
                  in_channels_dir=c.dir_embed.out_dim,
                  feature_dim=c.feature_dim, dtype=c.dtype,
                  head_dtype=c.dtype)
        object.__setattr__(self, "coarse", NeRFHNFF(typ="coarse", **kw))
        object.__setattr__(self, "fine", NeRFHNFF(typ="fine", **kw))
        object.__setattr__(self, "exposure", ExposureMLP(dtype=c.dtype))
        object.__setattr__(self, "fusion",
                           FusionNet(feature_dim=c.feature_dim,
                                     residual=c.fusion_residual,
                                     no_bn=c.fusion_no_bn, dtype=c.dtype))

    def init_variables(self, rng: jax.Array) -> dict:
        c = self.cfg
        k1, k2, k3, k4 = jax.random.split(rng, 4)
        xe = jnp.zeros((1, c.xyz_embed.out_dim))
        de = jnp.zeros((1, c.dir_embed.out_dim))
        fusion_vars = self.fusion.init(
            k4, jnp.zeros((1, 8, 8, 3 + c.feature_dim)))
        variables = {
            "params": {
                "coarse": self.coarse.init(k1, xe, de)["params"],
                "fine": self.fine.init(k2, xe, de)["params"],
                "exposure": self.exposure.init(
                    k3, jnp.zeros((1, c.hist_bin)))["params"],
                "fusion": fusion_vars["params"],
            },
        }
        if "batch_stats" in fusion_vars:
            variables["batch_stats"] = {
                "fusion": fusion_vars["batch_stats"]}
        return variables

    # --- functional application helpers (all pure) ---

    # --- Pallas fused path (kernels/fused_field.py) ---

    def fused_spec(self, typ: str) -> "FieldSpec":
        from nefes_tpu.kernels.fused_field import FieldSpec
        return FieldSpec.from_model(self.cfg, typ,
                                    dtype=jnp.dtype(self.cfg.dtype).name)

    def pack_fused(self, params) -> tuple:
        """(packed_coarse, packed_fine) weight tuples for the raw fns."""
        from nefes_tpu.kernels.fused_field import pack_params
        return (pack_params(params["coarse"], self.fused_spec("coarse")),
                pack_params(params["fine"], self.fused_spec("fine")))

    def _raw_fn(self, typ: str, need_dw: bool, interpret: bool):
        from nefes_tpu.kernels.fused_field import fused_field_apply
        spec = self.fused_spec(typ)

        def fn(packed, pts, dirs, sigma_only=False, output_transient=True):
            return fused_field_apply(spec, packed, pts, dirs,
                                     sigma_only=sigma_only,
                                     output_transient=output_transient,
                                     need_dw=need_dw, interpret=interpret)
        return fn

    def fine_render_raw_fn(self, interpret: bool = False):
        """Composite-fused fine render fn (kernels/fused_render.py):
        (packed, pts (R,S,3), viewdirs (R,3), z (R,S)) -> per-ray dict.
        Used by render_rays when cfg.fused_render (frozen-field
        refinement renders)."""
        from nefes_tpu.kernels.fused_render import fused_render_apply
        spec = self.fused_spec("fine")

        def fn(packed, pts, viewdirs, z):
            return fused_render_apply(spec, packed, pts, viewdirs, z,
                                      interpret=interpret)
        return fn

    def coarse_raw_fn(self, need_dw: bool = True, interpret: bool = False):
        return self._raw_fn("coarse", need_dw, interpret)

    def fine_raw_fn(self, need_dw: bool = True, interpret: bool = False):
        return self._raw_fn("fine", need_dw, interpret)

    # --- pre-embedded fused path: XLA embeds, the kernel runs the tower.
    # Signature-compatible with coarse_fn/fine_fn (params slot = packed
    # weights), so the renderer's standard embed branch drives it. ---

    def pack_fused_pre(self, params) -> tuple:
        from nefes_tpu.kernels.fused_field import pack_params
        return (pack_params(params["coarse"], self.fused_spec("coarse"),
                            pre_embedded=True),
                pack_params(params["fine"], self.fused_spec("fine"),
                            pre_embedded=True))

    def _pre_fn(self, typ: str, need_dw: bool, interpret: bool):
        from nefes_tpu.kernels.fused_field import fused_field_apply_pre
        spec = self.fused_spec(typ)

        def fn(packed, xyz_emb, dir_emb=None, sigma_only=False,
               output_transient=True):
            return fused_field_apply_pre(spec, packed, xyz_emb, dir_emb,
                                         sigma_only=sigma_only,
                                         output_transient=output_transient,
                                         need_dw=need_dw,
                                         interpret=interpret)
        return fn

    def coarse_pre_fn(self, need_dw: bool = True, interpret: bool = False):
        return self._pre_fn("coarse", need_dw, interpret)

    def fine_pre_fn(self, need_dw: bool = True, interpret: bool = False):
        return self._pre_fn("fine", need_dw, interpret)

    def fine_render_pre_fn(self, interpret: bool = False):
        """Pre-embedded composite-fused fine render fn
        (kernels/fused_render.py): (packed, xyz_emb (R,S,E), dir_emb
        (R,S,Ed), z (R,S)) -> per-ray dict. Used by render_rays when
        cfg.fused_render and cfg.fused_pre."""
        from nefes_tpu.kernels.fused_render import fused_render_apply_pre
        spec = self.fused_spec("fine")

        def fn(packed, xyz_emb, dir_emb, z):
            return fused_render_apply_pre(spec, packed, xyz_emb, dir_emb,
                                          z, interpret=interpret)
        return fn

    def ray_field_fns(self, params, hist=None):
        """(coarse_fn, fine_fn) for one image. The NFF field has no
        per-image latent conditioning (exposure is a post-render rgb
        transform), so the bound methods are returned as-is; the zoo
        fields (train/field_zoo.py) override this to bind N_vocab
        embedding-table latents per image."""
        return self.coarse_fn, self.fine_fn

    def coarse_fn(self, params, xyz_emb, dir_emb=None, sigma_only=False,
                  output_transient=False):
        return self.coarse.apply({"params": params["coarse"]}, xyz_emb,
                                 dir_emb, sigma_only, output_transient)

    def fine_fn(self, params, xyz_emb, dir_emb=None, sigma_only=False,
                output_transient=True):
        return self.fine.apply({"params": params["fine"]}, xyz_emb, dir_emb,
                               sigma_only, output_transient)

    def apply_exposure(self, params, hist: jnp.ndarray,
                       rgb: jnp.ndarray) -> jnp.ndarray:
        """hist (B, bins), rgb (B, N, 3) raw -> exposure-corrected sigmoid
        rgb (the reference's affine_color_transform path). With
        encode_hist off the raw colors only pass through the sigmoid."""
        if not self.cfg.encode_hist:
            return jax.nn.sigmoid(rgb)
        emb = self.exposure.apply({"params": params["exposure"]}, hist)
        return affine_color_transform(emb, rgb)

    def apply_fusion(self, variables, rgb_img: jnp.ndarray,
                     feat_img: jnp.ndarray, train: bool = False,
                     bn_stats: str = "batch"):
        """rgb_img (B, H, W, 3), feat_img (B, H, W, F) -> fused features.
        Returns (out, new_batch_stats|None).

        bn_stats selects how the trailing BatchNorm normalizes at
        INFERENCE (train=False):

        * ``"batch"`` (default) — statistics of the current input, exactly
          like the reference at its operating point: the torch NeRF model
          is never ``.eval()``'d anywhere in the pipeline
          (``disable_model_grad`` only clears requires_grad,
          DFM_pose_refine.py:108-117; run_nefes.py/DFM_*.py contain no
          ``.eval()`` for it), so ``BatchNorm2d`` normalizes every
          refinement/validation render with that render's own statistics
          and the running averages are never consulted. Running-average
          normalization instead puts the fused features through stats
          accumulated from 16x16 training patches — a train/test
          distribution shift the reference never pays (measured: it
          inflates the fused feature-cosine loss ~4x on the accuracy
          harness and flips the fused-vs-raw DFM comparison).
        * ``"running"`` — flax-conventional running averages (kept for
          A/B evidence and converted-checkpoint parity gates).

        train=True always uses batch statistics and returns the updated
        running stats for the training step to persist."""
        v = {"params": variables["params"]["fusion"]}
        has_bn = "batch_stats" in variables
        if has_bn:
            v["batch_stats"] = variables["batch_stats"]["fusion"]
        x = jnp.concatenate([rgb_img, feat_img], axis=-1)
        if train and has_bn:
            out, mut = self.fusion.apply(v, x, train=True,
                                         mutable=["batch_stats"])
            return out, mut["batch_stats"]
        if has_bn and bn_stats == "batch":
            # batch statistics WITHOUT persisting the mutation — the
            # functional equivalent of torch train-mode BN under no_grad
            out, _ = self.fusion.apply(v, x, train=True,
                                       mutable=["batch_stats"])
            return out, None
        return self.fusion.apply(v, x, train=False), None
