"""Config system: typed options dataclasses + reference-format config files.

Replaces the reference's two overlapping configargparse parsers
(script/models/options.py, script/dm/options.py — which must be kept
consistent by hand, SURVEY.md §5) with ONE dataclass covering both, plus a
reader for the reference's per-scene ``key=value`` config txts
(script/config/**) so existing scene configs work unchanged.
"""

from __future__ import annotations

import argparse
from dataclasses import dataclass, field, fields
from pathlib import Path
from typing import Any


@dataclass
class Options:
    """Union of the training parser (models/options.py) and refinement
    parser (dm/options.py) flags that are meaningful in this framework.
    Defaults match the reference."""

    # experiment / paths
    config: str | None = None
    expname: str = "exp"
    basedir: str = "logs"
    datadir: str = "data/deepslam_data/7Scenes/chess"
    dataset_type: str = "7Scenes_colmap"   # 7Scenes | 7Scenes_colmap | Cambridge
    data_root: str = "data"                # root holding world_setup dirs

    # data loading
    trainskip: int = 1
    testskip: int = 1
    df: float = 2.0
    load_pose_avg_stats: bool = True
    semantic: bool = False

    # field architecture (options.py:30-48)
    netdepth: int = 8
    netwidth: int = 128
    feature_dim: int = 128
    use_fusion_res: bool = False
    no_fusion_BN: bool = False

    # field-model selection (options.py:43-48): nerfh_nff is the paper
    # production field; tcnn/sh_nff select the hash-grid field, ffmlp (or
    # nerfh_nff=False with NeRFW) the legacy NeRF-W/Hist tower, and
    # NeRFW=False the plain-NeRF field — all via train/field_zoo.py
    nerfh_nff: bool = True
    ffmlp: bool = False
    tcnn: bool = False
    sh_nff: bool = False
    # N_vocab embedding tables for the zoo fields (options.py:66,49,56)
    N_vocab: int = 1000
    hash_level: int = 16
    bound: float = 25.0

    # embedding
    multires: int = 10
    multires_views: int = 4
    reduce_embedding: int = -1
    # epochs until the Nerfies window opens fully (reduce_embedding=2,
    # reference options.py:17); <=0 means "over the whole run"
    epochToMaxFreq: int = -1

    # rendering (options.py:94-106)
    N_samples: int = 64
    N_importance: int = 64
    perturb: float = 1.0
    raw_noise_std: float = 0.0
    use_fine_only: bool = False
    tinyscale: float = 4.0

    # NeRF-W (options.py:65-84)
    NeRFW: bool = True
    encode_hist: bool = True
    hist_bin: int = 10
    transient_at_test: bool = False

    # training (options.py:33-40,123)
    N_rand: int = 1536
    # activation rematerialization in training: auto = off while the
    # per-step sample grid fits HBM comfortably (22% faster at the paper
    # config), on for big batches; "on"/"off" force it
    remat: str = "auto"
    lrate: float = 5e-4
    lrate_decay: float = 0.754
    # TPU-framework extra (no reference analogue; default off preserves
    # reference semantics): global-norm gradient clip. Guards the
    # FusionNet's trailing BatchNorm against early-training spikes that
    # can knock a conv layer's ReLUs fully dead (see make_optimizer)
    grad_clip: float = 0.0
    batch_size: int = 4
    # NOTE: the reference's --val_batch_size / --dfnet / --eval flags are
    # not modeled: validation renders per-pose (no DataLoader batching),
    # APR selection goes through PoseEstimatorType, and evaluation is its
    # own CLI (nefes_tpu.cli.evaluate). Config files carrying them are
    # ignored-with-print by load_options.
    epochs: int = 600
    new_schedule: int = 1
    i_weights: int = 200
    i_testset: int = 200
    i_print: int = 10
    val_views: int = 8          # holdout/val views per periodic render
    no_reload: bool = False
    ft_path: str | None = None
    # NOTE: the reference's --no_grad_update (dm/options.py:72) is not
    # modeled: the field is ALWAYS frozen during refinement here by
    # construction (stop-gradient packing / need_dw=False), the flag's
    # only shipped value. Config files carrying it are ignored-with-print
    # by load_options.
    set_near_far: bool = False
    near_far: tuple = (0.5, 2.5)

    # losses (options.py:74-77)
    color_loss_only: bool = False
    color_feat_loss: bool = False
    color_feat_fusion_loss: bool = False
    color_feat_fusion_nerfw_loss: bool = False

    # auxiliary regularizers (options.py:52-55,61,78-79)
    tvloss: bool = False
    tvloss_w: float = 1e-6
    l1normloss: bool = False
    l1normloss_w: float = 1e-6
    sigma_sparsity_loss: bool = False
    sigma_sparsity_loss2: bool = False
    depth_loss: bool = False      # reference --depth (DPT mono-depth)

    # APR / refinement (dm/options.py)
    pose_only: int = 0
    learning_rate: float = 1e-5
    PoseEstimatorType: str = "DFNet"
    pretrain_model_path: str = ""
    pretrain_featurenet_path: str = ""
    lr_r: float = 0.01
    lr_t: float = 0.1
    opt_iter: int = 50
    # frames refined per launch (1 = serial like the reference; vmapped
    # scan otherwise). Default 1: BENCH_r03 measured the B=4 vmapped
    # mode-2 scan at 1.85 s/frame vs 1.37 single — the per-frame DFNet
    # already fills the MXU, so batching only adds HBM pressure. Raise
    # for small fields / mode 3, where vmap does amortise.
    refine_batch: int = 1
    # frames folded into ONE device launch as a lax.scan (serial inside,
    # so single-frame peak memory — unlike refine_batch's vmap) to
    # amortize per-launch host dispatch. Orthogonal to refine_batch;
    # effective with refine_batch=1. Default 1: the r5 A/B through the
    # remote-TPU tunnel measured scan_frames=4 as a PESSIMIZATION
    # (mode-3 CLI 1.689 -> 2.066 s/frame, mode-2 1.686 -> 1.713;
    # BENCH_r05_local.json vs the same-day scan_frames=1 run) — the
    # lookahead pipeline in cli/refine.py already hides per-launch
    # dispatch, and the folded scan only removes launch/transfer overlap.
    scan_frames: int = 1
    # APR compute dtype during refinement. The reference pins float32
    # (autocast decorator, DFM_pose_refine.py:131); bfloat16 runs the
    # VGG16 tower on the MXU's native type (weights stay f32)
    apr_compute_dtype: str = "float32"
    # NeRF FIELD compute dtype during refinement (params stay f32). The
    # refine CLI defaults to bfloat16 — the benched headline config: the
    # field MLP is HBM-bandwidth-floored (88% of the v5e roofline at bf16,
    # PROFILE_r05.json), so an f32 field doubles its byte traffic and was
    # measured as the CLI serving loop's 1.50 vs 1.12 s/frame scan gap
    # (the bench scan legs always ran the field in bf16; the CLI built it
    # f32). Converged DFM loss matches f32 to ~1e-4 (BENCH final_loss
    # f32 0.98786 vs bf16 0.98771). Training is unaffected (cli/train.py
    # builds its own f32 model).
    field_compute_dtype: str = "bfloat16"
    no_verification_step: bool = False
    # retreat signal for the verification fail-safe: "psnr_ssim" is the
    # reference's proxy (DFM_APR_refine.py:242-250); "dfm" retreats when
    # the feature loss itself failed to improve; "either" combines both.
    # Measured proxy confusion matrices: ACCURACY_r04.json
    verification_metric: str = "psnr_ssim"
    # FusionNet BatchNorm statistics in the DFM forward: "batch" is
    # reference-exact (the torch model is never .eval()'d, so BN uses
    # each render's own statistics), "running" applies the calibrated
    # running averages (train/calibration.py), "none" bypasses fusion
    # and refines against raw rendered features. The accuracy harness
    # sweeps all three (ACCURACY_r05.json fusion_ablation).
    fusion_bn: str = "batch"
    per_pixel: bool = False
    svd_reg: bool = False
    freezeBN: bool = False
    feature_matching_lvl: tuple = (0,)

    # output directory for the refined-pose txt dump (cli/refine.py).
    # Empty -> the reference's layout tmp/<APR>_NeFeS<iters>_<dataset>/
    # <scene>/ (test_refinement.py's save path). Benchmarks point this at
    # /tmp so fixture runs never churn files under the repo.
    save_dir: str = ""

    # eval / render
    render_test: bool = False
    # mp4 artifacts (reference options.py:19,23-24): *_video_* write the
    # validation renders as videos; render_pose_only renders a spiral
    # camera path around the train poses and exits
    render_video_train: bool = False
    render_video_test: bool = False
    render_pose_only: bool = False
    spiral_views: int = 120

    # profiling (utils/profiling.py; replaces the reference's
    # PROFILE_TIME prints, rendering.py:18)
    profile_dir: str = ""          # jax.profiler trace output dir

    def render_hw(self, H: int, W: int) -> tuple[int, int]:
        return int(H // self.tinyscale), int(W // self.tinyscale)


_BOOL_TRUE = {"true", "1", "yes"}
_BOOL_FALSE = {"false", "0", "no"}


def _parse_value(raw: str, current: Any) -> Any:
    raw = raw.strip()
    if isinstance(current, bool):
        low = raw.lower()
        if low in _BOOL_TRUE:
            return True
        if low in _BOOL_FALSE:
            return False
        raise ValueError(f"bad bool {raw!r}")
    if isinstance(current, int) and not isinstance(current, bool):
        return int(float(raw))
    if isinstance(current, float):
        return float(raw)
    if isinstance(current, tuple):
        parts = raw.replace("[", "").replace("]", "").replace(",", " ").split()
        return tuple(type(current[0])(p) for p in parts) if current \
            else tuple(parts)
    if raw.lower() == "none":
        return None
    return raw


def read_config_file(path: str | Path) -> dict[str, str]:
    """Parse a reference-style config txt (``key = value`` lines, ``#``
    comments — configargparse's default format)."""
    out = {}
    for line in Path(path).read_text().splitlines():
        line = line.split("#", 1)[0].strip()
        if not line or "=" not in line:
            continue
        k, v = line.split("=", 1)
        out[k.strip()] = v.strip()
    return out


def load_options(config_path: str | Path | None = None,
                 overrides: dict | None = None) -> Options:
    """Build Options from (defaults <- config file <- overrides)."""
    opts = Options()
    known = {f.name: f for f in fields(Options)}
    merged: dict[str, str | Any] = {}
    if config_path:
        merged.update(read_config_file(config_path))
    if overrides:
        merged.update(overrides)
    unknown = []
    for k, v in merged.items():
        if k not in known:
            unknown.append(k)
            continue
        cur = getattr(opts, k)
        setattr(opts, k, _parse_value(v, cur) if isinstance(v, str) else v)
    if unknown:
        # reference configs carry legacy flags we deliberately don't model;
        # surface rather than crash
        print(f"[options] ignoring unknown keys: {sorted(unknown)}")
    return opts


def options_argparser() -> argparse.ArgumentParser:
    """CLI parser exposing every Options field as --flag."""
    p = argparse.ArgumentParser()
    for f in fields(Options):
        name = f"--{f.name}"
        default = None  # only explicit CLI values override config files
        if isinstance(f.default, bool):
            p.add_argument(name, default=default, type=str)
        else:
            p.add_argument(name, default=default, type=str)
    return p


def options_from_cli(argv=None) -> Options:
    # unknown flags follow the same ignored-with-print contract as
    # unknown config-file keys (reference scripts pass legacy flags like
    # --eval on the command line)
    ns, unknown = options_argparser().parse_known_args(argv)
    if unknown:
        print(f"[options] ignoring unknown CLI args: {unknown}")
    ns = vars(ns)
    overrides = {k: v for k, v in ns.items() if v is not None}
    return load_options(overrides.pop("config", None), overrides)
