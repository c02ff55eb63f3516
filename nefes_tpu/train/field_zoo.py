"""Flag-selectable alternative field models — the reference's model
dispatch (`create_nerf`, script/models/nerfh.py:522-600 and
nerfh_tcnn.py:286-310, selected by the --NeRFW/--ffmlp/--tcnn flags,
script/models/options.py:43-48) behind the same protocol as NeFeSModel,
so the train CLI / trainer / validation renderers drive any field.

Three kinds:

  "nerfw"  — legacy NeRF-W / NeRF-Hist (fields/legacy.py:NeRFW) with the
             N_vocab appearance/transient embedding TABLES the reference
             creates at nerfh.py:541-544: Embedding(N_vocab, 5) and
             Embedding(N_vocab, 2), looked up with the rounded luminance
             histogram bins (ts = hist ints) and flattened to
             hist_bin·5 / hist_bin·2 latents (run_network_NeRFH,
             nerfh.py:216-227). The reference's --ffmlp variant
             (NeRFH_FFMLP) is the same architecture with a CUDA fused
             MLP; on TPU both map to this flax field (XLA fuses the MLP).
  "nerf"   — plain NeRF (fields/legacy.py:PlainNeRF), the --NeRFW=False
             branch of create_nerf (nerfh.py:552).
  "hash"   — instant-ngp hash-grid field (fields/hashgrid.py:NeRFHTcnn),
             the --tcnn branch (nerfh_tcnn.py:286-310); embedding tables
             (N_vocab, 5)/(N_vocab, 2) live at the bundle level like the
             reference module's own embedding_a/embedding_t
             (nerfh_tcnn.py:107,125). Raw xyz/dir inputs (identity
             positional embedding — the hash encoding replaces it).

Unlike NeRFH-NFF these fields condition the FINE tower on per-image
latents, so the renderer-facing interface is ``ray_field_fns(params,
hist)`` — per-image field closures with the latents bound (gradients flow
into the tables through the closure capture).
"""

from __future__ import annotations

from dataclasses import dataclass, field as dfield
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from nefes_tpu.fields.embedder import EmbedConfig
from nefes_tpu.fields.hashgrid import HashGridEncoding, NeRFHTcnn
from nefes_tpu.fields.legacy import NeRFW, PlainNeRF
from nefes_tpu.render.renderer import RenderConfig


@dataclass(frozen=True)
class ZooConfig:
    """Hashable config for the zoo fields (jit static)."""

    kind: str = "nerfw"            # nerfw | nerf | hash
    depth: int = 8
    width: int = 128
    skips: tuple[int, ...] = (4,)
    xyz_embed: EmbedConfig = EmbedConfig(num_freqs=10)
    dir_embed: EmbedConfig = EmbedConfig(num_freqs=4)
    # N_vocab embedding tables (nerfh.py:541-544): N_a=5, N_tau=2
    n_vocab: int = 1000
    n_a: int = 5
    n_t: int = 2
    hist_bin: int = 10
    encode_hist: bool = True
    beta_min: float = 0.1
    # hash-grid knobs (nerfh_tcnn.py / options.py:49,58)
    bound: float = 25.0
    hash_level: int = 16
    tcnn_exact: bool = False
    dtype: Any = jnp.float32

    # zoo fields have no feature head (SURVEY §2.4 legacy row)
    feature_dim: int = 0

    def render_config(self, **overrides) -> RenderConfig:
        if self.kind == "hash":
            # raw inputs: the hash encoding + SH happen inside the field
            xyz, dirs = EmbedConfig.identity(), EmbedConfig.identity()
        else:
            xyz, dirs = self.xyz_embed, self.dir_embed
        overrides.setdefault("output_transient", self.kind != "nerf")
        return RenderConfig(xyz_embed=xyz, dir_embed=dirs, **overrides)


@dataclass(frozen=True)
class ZooFieldModel:
    """Frozen (hashable) model bundle for the alternative fields.

    Protocol-compatible with NeFeSModel where the trainer/validation
    renderers need it: init_variables, ray_field_fns, coarse_fn/fine_fn,
    apply_exposure. No fusion CNN and no exposure MLP — the zoo fields
    emit sigmoided rgb directly (legacy.py heads), so apply_exposure is a
    pass-through.
    """

    cfg: ZooConfig
    coarse: Any = dfield(init=False)
    fine: Any = dfield(init=False)
    embed_a: Any = dfield(init=False)
    embed_t: Any = dfield(init=False)

    def __post_init__(self):
        c = self.cfg
        if c.kind == "hash":
            kw = dict(bound=c.bound, hash_level=c.hash_level,
                      tcnn_exact=c.tcnn_exact, dtype=c.dtype,
                      in_channels_a=c.hist_bin * c.n_a,
                      in_channels_t=c.hist_bin * c.n_t)
            coarse = NeRFHTcnn(encode_transient=False, **kw)
            fine = NeRFHTcnn(encode_transient=True, **kw)
        elif c.kind == "nerf":
            kw = dict(depth=c.depth, width=c.width, skips=c.skips,
                      in_channels_xyz=c.xyz_embed.out_dim,
                      in_channels_dir=c.dir_embed.out_dim, dtype=c.dtype)
            coarse = fine = PlainNeRF(**kw)
        elif c.kind == "nerfw":
            kw = dict(depth=c.depth, width=c.width, skips=c.skips,
                      in_channels_xyz=c.xyz_embed.out_dim,
                      in_channels_dir=c.dir_embed.out_dim,
                      in_channels_a=c.hist_bin * c.n_a,
                      in_channels_t=c.hist_bin * c.n_t,
                      beta_min=c.beta_min, dtype=c.dtype)
            coarse = NeRFW(typ="coarse", **kw)
            fine = NeRFW(typ="fine", **kw)
        else:
            raise ValueError(f"unknown zoo field kind {c.kind!r}")
        object.__setattr__(self, "coarse", coarse)
        object.__setattr__(self, "fine", fine)
        has_latents = c.kind != "nerf" and c.encode_hist
        object.__setattr__(self, "embed_a",
                           nn.Embed(c.n_vocab, c.n_a) if has_latents
                           else None)
        object.__setattr__(self, "embed_t",
                           nn.Embed(c.n_vocab, c.n_t) if has_latents
                           else None)

    # --- initialisation ---

    def init_variables(self, rng: jax.Array) -> dict:
        c = self.cfg
        k1, k2, k3, k4 = jax.random.split(rng, 4)
        if c.kind == "hash":
            xe = jnp.zeros((1, 3))
            de = jnp.ones((1, 3)) / jnp.sqrt(3.0)
        else:
            xe = jnp.zeros((1, c.xyz_embed.out_dim))
            de = jnp.zeros((1, c.dir_embed.out_dim))
        a0, t0 = self._zero_latents()
        params = {
            "coarse": self._init_field(self.coarse, k1, xe, de, None, None),
            "fine": self._init_field(self.fine, k2, xe, de, a0, t0),
        }
        if self.embed_a is not None:
            params["embed_a"] = self.embed_a.init(
                k3, jnp.zeros((1,), jnp.int32))["params"]
            params["embed_t"] = self.embed_t.init(
                k4, jnp.zeros((1,), jnp.int32))["params"]
        return {"params": params}

    def _zero_latents(self):
        c = self.cfg
        if c.kind == "nerf" or not c.encode_hist:
            return None, None
        return (jnp.zeros((1, c.hist_bin * c.n_a)),
                jnp.zeros((1, c.hist_bin * c.n_t)))

    def _init_field(self, mod, rng, xe, de, a0, t0):
        if self.cfg.kind == "nerf":
            return mod.init(rng, xe, de)["params"]
        return mod.init(rng, xe, de, a_latent=a0, t_latent=t0,
                        output_transient=True)["params"]

    # --- latent lookup (run_network_NeRFH, nerfh.py:216-227) ---

    def latents(self, params, hist: jnp.ndarray):
        """hist (bins,) rounded percent-density ints -> (a (bins·n_a,),
        t (bins·n_t,)) flattened per-image latents. ts.long() semantics:
        each bin VALUE indexes the shared table."""
        if self.embed_a is None:
            return None, None
        ids = jnp.clip(jnp.round(hist).astype(jnp.int32), 0,
                       self.cfg.n_vocab - 1)
        a = self.embed_a.apply({"params": params["embed_a"]}, ids)
        t = self.embed_t.apply({"params": params["embed_t"]}, ids)
        return a.reshape(-1), t.reshape(-1)

    # --- renderer-facing field fns ---

    def ray_field_fns(self, params, hist: jnp.ndarray | None):
        """Per-image (coarse_fn, fine_fn) with the appearance/transient
        latents bound. Gradients reach the embedding tables through the
        closure capture of ``params``."""
        a_lat, t_lat = (self.latents(params, hist)
                        if hist is not None else (None, None))

        def coarse_fn(p, xyz_emb, dir_emb=None, sigma_only=False,
                      output_transient=False):
            return self._apply(self.coarse, p["coarse"], xyz_emb, dir_emb,
                               None, None, sigma_only, False)

        def fine_fn(p, xyz_emb, dir_emb=None, sigma_only=False,
                    output_transient=True):
            return self._apply(self.fine, p["fine"], xyz_emb, dir_emb,
                               a_lat, t_lat, sigma_only, output_transient)

        return coarse_fn, fine_fn

    def _apply(self, mod, p, xyz_emb, dir_emb, a_lat, t_lat, sigma_only,
               output_transient):
        if self.cfg.kind == "nerf":
            return mod.apply({"params": p}, xyz_emb, dir_emb,
                             sigma_only=sigma_only)
        return mod.apply({"params": p}, xyz_emb, dir_emb,
                         a_latent=a_lat, t_latent=t_lat,
                         sigma_only=sigma_only,
                         output_transient=output_transient)

    # latent-free fns (sigma-only paths: TV regulariser, density probes)
    def coarse_fn(self, params, xyz_emb, dir_emb=None, sigma_only=False,
                  output_transient=False):
        return self._apply(self.coarse, params["coarse"], xyz_emb, dir_emb,
                           None, None, sigma_only, False)

    def fine_fn(self, params, xyz_emb, dir_emb=None, sigma_only=False,
                output_transient=True):
        a0, t0 = self._zero_latents()
        a0 = None if a0 is None else a0[0]
        t0 = None if t0 is None else t0[0]
        return self._apply(self.fine, params["fine"], xyz_emb, dir_emb,
                           a0, t0, sigma_only, output_transient)

    # --- protocol shims ---

    def apply_exposure(self, params, hist, rgb):
        """Zoo fields emit sigmoided rgb from the field head (legacy.py /
        hashgrid.py) — no exposure MLP (that is an NFF-only component,
        nerfh_nff.py:511-522)."""
        return rgb

    def encoder_fns(self, params):
        """(coarse, fine) hash-encoding closures for embeddings_l1_loss
        (the --l1normloss regulariser, reference losses.py:284-314).
        Hash fields only."""
        if self.cfg.kind != "hash":
            raise ValueError("l1normloss regularises hash-grid tables; "
                             f"field kind is {self.cfg.kind!r}")
        enc = HashGridEncoding(n_levels=self.cfg.hash_level,
                               tcnn_exact=self.cfg.tcnn_exact,
                               dtype=self.cfg.dtype)

        def make(p):
            return lambda x01: enc.apply({"params": p["encoder"]}, x01)

        return make(params["coarse"]), make(params["fine"])


def build_zoo_model(opts) -> tuple[ZooConfig, ZooFieldModel]:
    """CLI dispatch for the non-NFF fields (reference flag semantics,
    models/options.py:43-48 + create_nerf branches)."""
    from nefes_tpu.cli.train import embed_configs
    xyz, dirs = embed_configs(opts)
    common = dict(depth=opts.netdepth, width=opts.netwidth,
                  xyz_embed=xyz, dir_embed=dirs,
                  n_vocab=opts.N_vocab, hist_bin=opts.hist_bin,
                  encode_hist=opts.encode_hist)
    if opts.tcnn or opts.sh_nff:
        cfg = ZooConfig(kind="hash", bound=opts.bound,
                        hash_level=opts.hash_level, **common)
    elif not opts.NeRFW:
        cfg = ZooConfig(kind="nerf", **common)
    else:   # --ffmlp or --nerfh_nff=False: the legacy NeRF-W/Hist tower
        cfg = ZooConfig(kind="nerfw", **common)
    return cfg, ZooFieldModel(cfg)
