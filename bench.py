"""Benchmark: NeFeS50 per-frame refinement latency on one TPU chip.

Measures BOTH refinement modes at BOTH operational geometries of
BASELINE.md's compute envelope:

  * 7-Scenes:  240x320 df=2 imagery, tinyscale=4 render -> 60x80 rays
  * Cambridge: 240x427 df=2 imagery, tinyscale=4 render -> 60x107 rays
    (the envelope BASELINE.md actually describes: reference
    DFM_APR_refine.py:107,114 — ~34% more rays and ~1.8x the mode-2
    DFNet pixels than 7-Scenes)

with 64 coarse + 64+64 fine samples through the full-size coarse+fine
NeRFH-NFF + exposure MLP + FusionNet:

  * mode 2 (HEADLINE, the paper's DFNet+NeFeS50 table configuration,
    reference DFM_APR_refine.py:84-156): 50 iterations per frame, each a
    full-res DFNet/VGG16 forward, H/4 render, fusion, bicubic upsample of
    rgb+features to full res, 10px-crop cosine loss, backward into the
    APR weights — one lax.scan per frame.
  * mode 3 (DFM_pose_refine.py:290-348): same render loop with gradients
    into an SE(3) pose delta.

FLOPs are read from the compiled executables (XLA cost analysis), giving
achieved TFLOP/s and MFU vs the v5e bf16 peak (197 TFLOP/s).

The torch reference records no wall-clock (its timer lives at
DFM_APR_refine.py:26-39). `vs_baseline` divides a FLOP-DERIVED estimate
(see BASELINE.md "Reference wall-clock derivation"): measured F TFLOP/
frame on an RTX 3090 at 35.6 TFLOP/s fp32 peak x 13% utilisation
(the band measured for chunked python-loop NeRF renderers; the
speed-of-light bound F/peak is also reported). The >=5x north-star means
vs_baseline >= 5.

Harness contract (the driver runs `python bench.py` under a timeout and
parses the LAST JSON line of stdout): the headline record is printed as
soon as the CORE scan legs finish, then each OPTIONAL leg (CLI serving,
training throughput, batched / fused regression guards) runs only if the
time budget allows and RE-prints the updated record, so the output always
ends near a complete JSON line no matter where a timeout lands. Budget:
NEFES_BENCH_BUDGET_S (default 2700 s — under the driver's observed
timeout; BENCH_r04.json rc=124 is the failure mode this structure fixes).

Also measures the SERVING path: cli/refine.py end-to-end (dataset load,
DFNet target precompute, async host->device staging, refinement with
verification, txt dump) over a 16-frame fixture at the 7-Scenes geometry
-> `cli_s_per_frame` (one warm timed run; r4's min-of-2 marginal-rate
estimator cost 12 CLI invocations and timed the driver out without
stabilising the estimate — BENCH_r04_local.json cli_uncontended).

Prints ONE JSON line (re-printed as legs complete):
{"metric", "value", "unit", "vs_baseline", "extra"}.
"""

import io
import json
import os
import re
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

# --- reference derivation constants (BASELINE.md) ---
PEAK_3090_F32 = 35.6e12     # RTX 3090 fp32 FMA peak
TORCH_UTIL = 0.13           # measured band for chunked torch NeRF loops
PEAK_V5E_BF16 = 197e12      # TPU v5e bf16 MXU peak

OPT_ITER = 50
FRAMES_TO_TIME = 3
NEAR, FAR = 0.0, 4.0

T0_WALL = time.time()
BUDGET_S = float(os.environ.get("NEFES_BENCH_BUDGET_S", "2700"))

# NEFES_BENCH_SMOKE=1: tiny iteration counts + skip the CLI leg — a
# minutes-scale end-to-end validation of this script after edits (the
# real numbers still come from the full run; compiles dominate either way)
SMOKE = os.environ.get("NEFES_BENCH_SMOKE", "") == "1"
if SMOKE:
    OPT_ITER, FRAMES_TO_TIME = 2, 1

# geometry envelopes (BASELINE.md): (render_h, render_w, full_h, full_w,
# focal/df/tinyscale)
GEOMS = {
    "7scenes": (60, 80, 240, 320, 525.505 / 2 / 4),
    "cambridge": (60, 107, 240, 427, 744.0 / 2 / 4),
}


def remaining_s() -> float:
    return BUDGET_S - (time.time() - T0_WALL)


def leg_fits(name: str, est_s: float, extra: dict) -> bool:
    """True if the optional leg's cold-cost estimate fits the remaining
    budget; otherwise record the skip so the evidence says why."""
    if remaining_s() > est_s:
        return True
    skipped = extra.setdefault("skipped_legs", [])
    skipped.append({"leg": name, "est_s": est_s,
                    "remaining_s": round(remaining_s(), 1)})
    print(f"[bench] SKIP {name}: est {est_s:.0f}s > "
          f"remaining {remaining_s():.0f}s", flush=True)
    return False


def flops_of(lowered, loop_trips: int = 1) -> float:
    """FLOPs of a compiled executable. XLA's HLO cost analysis counts a
    while-loop body ONCE (trip counts are dynamic to it), so callers pass
    the scan length to scale it; the non-loop prologue is <2% of a
    refinement executable, so the overcount is negligible."""
    try:
        ca = lowered.compile().cost_analysis()
        d = ca[0] if isinstance(ca, (list, tuple)) else ca
        return float(d.get("flops", 0.0)) * loop_trips
    except Exception as e:  # cost analysis is best-effort
        print(f"[bench] cost_analysis unavailable: {e}")
        return 0.0


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from nefes_tpu.data.synthetic import look_at_pose
    from nefes_tpu.features.dfnet import DFNet, extract_target_features
    from nefes_tpu.refine import (
        RefineConfig, refine_apr_single, refine_pose_single,
    )
    from nefes_tpu.refine.pose_opt import render_feature_image
    from nefes_tpu.train import ModelConfig, NeFeSModel

    dev = jax.devices()[0]
    cfg = ModelConfig(dtype=jnp.bfloat16)  # MXU-native compute dtype
    model = NeFeSModel(cfg)
    variables = model.init_variables(jax.random.key(0))
    rcfg_render = cfg.render_config(n_samples=64, n_importance=64,
                                    output_transient=False, test_time=True,
                                    perturb=False, remat=False)
    rcfg = RefineConfig(opt_iter=OPT_ITER, lr_r=0.0087, lr_t=0.01)

    pose = jnp.asarray(look_at_pose(np.array([0.0, 0.3, 2.4], np.float32)))
    hist = jnp.zeros(10)
    ws_vec = jnp.asarray([1.0, 1.0, 0.0, 0.0, 0.0])

    extra = {"device": str(dev), "opt_iter": OPT_ITER,
             "samples_per_ray": [64, 128],
             "peak_v5e_bf16_tflops": PEAK_V5E_BF16 / 1e12,
             "budget_s": BUDGET_S,
             "baseline_derivation":
                 "torch_est_s = flops/frame / (35.6e12 fp32 * 0.13 util); "
                 "see BASELINE.md"}

    def perf_fields(prefix, dt, fl):
        if fl <= 0 or dt <= 0:
            return
        extra[f"{prefix}_tflop_per_frame"] = round(fl / 1e12, 2)
        extra[f"{prefix}_achieved_tflops"] = round(fl / dt / 1e12, 1)
        extra[f"{prefix}_mfu"] = round(fl / dt / PEAK_V5E_BF16, 3)
        extra[f"{prefix}_torch_est_s"] = round(
            fl / (PEAK_3090_F32 * TORCH_UTIL), 2)
        extra[f"{prefix}_torch_sol_s"] = round(fl / PEAK_3090_F32, 2)

    def emit():
        """(Re-)print the result record with everything measured so far.
        The driver parses the last JSON line, so each call supersedes the
        previous one; a timeout mid-leg leaves the latest complete record
        on stdout."""
        best = extra.get("mode2_apr_s_per_frame_bf16")
        f32 = extra.get("mode2_apr_s_per_frame_f32")
        if f32 is not None:
            best = f32 if best is None else min(best, f32)
        b4 = extra.get("mode2_batched4_s_per_frame")
        if best is not None and b4:
            # headline = best measured configuration (serial has won every
            # round so far; the min() guards the day a batched config wins)
            best = min(best, b4)
        torch_est = extra.get("mode2_bf16_torch_est_s", 10.0)
        extra["reference_estimate_s"] = torch_est
        extra["bench_elapsed_s"] = round(time.time() - T0_WALL, 1)
        result = {
            "metric": "nefes50_apr_refine_per_frame",
            "value": round(best, 4) if best is not None else None,
            "unit": "s/frame",
            "vs_baseline": (round(torch_est / best, 2)
                            if best else None),
            "extra": extra,
        }
        print(json.dumps(result), flush=True)
        return result

    def mode3(geom_key):
        H, W, _, _, FOCAL = GEOMS[geom_key]
        hwf = (H, W, FOCAL)
        _, target = render_feature_image(model, variables, pose, hist, hwf,
                                         NEAR, FAR, rcfg_render)
        target = jax.lax.stop_gradient(target)
        args = (model, variables, pose, target, hist, ws_vec, hwf,
                NEAR, FAR, rcfg_render, rcfg)

        def run3(p):
            return refine_pose_single(model, variables, p, target, hist,
                                      ws_vec, hwf, NEAR, FAR, rcfg_render,
                                      rcfg)

        for w in range(2):   # compile + steady-state warmup
            refined, losses = run3(pose + 1e-5 * w)
            float(losses[-1])  # hard host sync (block_until_ready is
            # unreliable on the experimental remote-TPU platform)
        t0 = time.perf_counter()
        for i in range(FRAMES_TO_TIME):
            # vary inputs each frame so no caching layer can elide work
            refined, losses = run3(pose + 1e-4 * (i + 1))
            float(losses[-1])
        dt = (time.perf_counter() - t0) / FRAMES_TO_TIME
        fl = flops_of(refine_pose_single.lower(*args),
                      loop_trips=OPT_ITER)
        del refined, target
        return dt, fl, float(np.asarray(losses)[-1])

    def mode2(geom_key, dtypes=("f32", "bf16")):
        H, W, FULL_H, FULL_W, FOCAL = GEOMS[geom_key]
        hwf = (H, W, FOCAL)
        hwf_full = (FULL_H, FULL_W, FOCAL * 4)
        key_img = jax.random.uniform(jax.random.key(3), (FULL_H, FULL_W, 3))
        out = {}
        for dt_name in dtypes:
            # the reference pins f32 for APR inference
            # (DFM_pose_refine.py:131); bf16 runs the VGG16 tower on the
            # MXU's native type and converges to the same loss — it is
            # the configuration shipped as --apr_compute_dtype bfloat16
            dt = {"f32": jnp.float32, "bf16": jnp.bfloat16}[dt_name]
            dfnet = DFNet(output_dim=cfg.feature_dim, dtype=dt)
            dfvars = dfnet.init(jax.random.key(1), key_img[None],
                                upsample_hw=(FULL_H, FULL_W))
            target2 = jax.lax.stop_gradient(extract_target_features(
                dfnet, dfvars, key_img[None], FULL_H, FULL_W)[0])
            args = (model, variables, dfnet, dfvars, key_img, target2,
                    hist, ws_vec, hwf, hwf_full, NEAR, FAR, rcfg_render,
                    rcfg)

            def run2(img):
                return refine_apr_single(
                    model, variables, dfnet, dfvars, img, target2, hist,
                    ws_vec, hwf, hwf_full, NEAR, FAR, rcfg_render, rcfg,
                    svd_reg=True)

            for w in range(2):
                o = run2(jnp.clip(key_img + 1e-5 * w, 0.0, 1.0))
                float(o["losses"][-1])
            t0 = time.perf_counter()
            for i in range(FRAMES_TO_TIME):
                o = run2(jnp.clip(key_img + 1e-4 * (i + 1), 0.0, 1.0))
                float(o["losses"][-1])
            el = (time.perf_counter() - t0) / FRAMES_TO_TIME
            fl = flops_of(refine_apr_single.lower(*args, svd_reg=True),
                          loop_trips=OPT_ITER)
            out[dt_name] = (el, fl, float(np.asarray(o["losses"])[-1]))
        return out

    # ================= CORE LEGS (always run, headline after) ===========
    print("[bench] start: mode 3 (first TPU compile via the remote relay"
          " can take 10-20 min cold)", flush=True)
    dt3, fl3, loss3 = mode3("7scenes")
    extra["mode3_pose_s_per_frame"] = round(dt3, 4)
    extra["final_loss_mode3"] = loss3
    perf_fields("mode3", dt3, fl3)
    H, W = GEOMS["7scenes"][:2]
    extra["rays_per_sec_per_chip_mode3"] = int(H * W * OPT_ITER / dt3)
    extra["render_hw"] = [H, W]
    print(f"[bench] mode3 7scenes: {dt3:.4f} s/frame", flush=True)

    print("[bench] start: mode 2 (headline)", flush=True)
    m2 = mode2("7scenes", dtypes=("f32", "bf16"))
    extra["mode2_apr_s_per_frame_f32"] = round(m2["f32"][0], 4)
    extra["mode2_apr_s_per_frame_bf16"] = round(m2["bf16"][0], 4)
    extra["final_loss_mode2_f32"] = m2["f32"][2]
    extra["final_loss_mode2_bf16"] = m2["bf16"][2]
    perf_fields("mode2_bf16", m2["bf16"][0], m2["bf16"][1])
    print(f"[bench] mode2 7scenes: f32 {m2['f32'][0]:.4f} "
          f"bf16 {m2['bf16'][0]:.4f} s/frame", flush=True)
    emit()   # first complete headline record

    dt3c, fl3c, _ = mode3("cambridge")
    extra["mode3_cambridge_s_per_frame"] = round(dt3c, 4)
    perf_fields("mode3_cambridge", dt3c, fl3c)
    m2c = mode2("cambridge", dtypes=("bf16",))
    extra["mode2_cambridge_s_per_frame_bf16"] = round(m2c["bf16"][0], 4)
    extra["final_loss_mode2_cambridge"] = m2c["bf16"][2]
    perf_fields("mode2_cambridge", m2c["bf16"][0], m2c["bf16"][1])
    extra["cambridge_render_hw"] = list(GEOMS["cambridge"][:2])
    emit()

    # ================= OPTIONAL LEGS (budget-gated, emit after each) ====

    # ---------------- CLI serving path (cli/refine.py end-to-end) --------
    if SMOKE:
        extra["cli_s_per_frame"] = None
        extra["cli_mode3_s_per_frame"] = None
    else:
        for mode, est in ((2, 420.0), (3, 330.0)):
            pre = "cli" if mode == 2 else "cli_mode3"
            if not leg_fits(f"cli_mode{mode}", est, extra):
                extra[f"{pre}_s_per_frame"] = None
                continue
            try:
                extra.update(bench_cli_serving(pose_only=mode))
                scan = dt3 if mode == 3 else m2["bf16"][0]
                extra[f"{pre}_overhead_vs_scan_x"] = round(
                    extra[f"{pre}_s_per_frame"] / scan, 3)
            except Exception as e:
                print(f"[bench] cli serving bench (mode {mode}) "
                      f"failed: {e}")
                extra[f"{pre}_s_per_frame"] = None
            emit()

    # ---------------- serving-gap attribution A/B ------------------------
    # The CLI phase marks show the serving gap lives in the launch loop
    # itself (cli_refine_loop_s_per_frame ~1.6 vs 1.12 bare scan, r5),
    # not in fixed costs. Attribute it in-process: bare scan vs the
    # one-launch serving step (traced-idx slicing + verification
    # fail-safe) vs verification-off vs the CLI's pipelined-drain
    # mechanics — all per-launch-synced like the scan legs, over
    # device-resident staged frames, so the differences isolate the
    # wrapper, the verification render bookkeeping, and the queue.
    if not SMOKE and leg_fits("serving_ab", 420.0, extra):
        try:
            from nefes_tpu.refine.apr_opt import refine_apr_verified
            Hs, Ws, FULL_H, FULL_W, FOCAL = GEOMS["7scenes"]
            hwf = (Hs, Ws, FOCAL)
            hwf_full = (FULL_H, FULL_W, FOCAL * 4)
            NAB = 8
            dfnet = DFNet(output_dim=cfg.feature_dim, dtype=jnp.bfloat16)
            key_img = jax.random.uniform(jax.random.key(3),
                                         (FULL_H, FULL_W, 3))
            dfvars = dfnet.init(jax.random.key(1), key_img[None],
                                upsample_hw=(FULL_H, FULL_W))
            imgs = jax.random.uniform(jax.random.key(11),
                                      (NAB, FULL_H, FULL_W, 3))
            tgts = jax.lax.stop_gradient(jnp.concatenate(
                [extract_target_features(dfnet, dfvars, imgs[i:i + 4],
                                         FULL_H, FULL_W)
                 for i in range(0, NAB, 4)]))
            hists8 = jnp.zeros((NAB, 10))

            def ab_bare(i):
                return refine_apr_single(
                    model, variables, dfnet, dfvars, imgs[i], tgts[i],
                    hists8[i], ws_vec, hwf, hwf_full, NEAR, FAR,
                    rcfg_render, rcfg, svd_reg=True)

            def ab_ver(i, uv=True):
                return refine_apr_verified(
                    model, variables, dfnet, dfvars, imgs, tgts, hists8,
                    i, i, ws_vec, hwf, hwf_full, NEAR, FAR, rcfg_render,
                    rcfg, svd_reg=True, use_verification=uv)

            def ab_time(launch, sync):
                for w in range(2):
                    sync(launch(0))
                t0 = time.perf_counter()
                for i in range(NAB):
                    out = launch(i)
                    sync(out)
                return round((time.perf_counter() - t0) / NAB, 4)

            extra["serving_ab_bare_s"] = ab_time(
                ab_bare, lambda o: float(o["losses"][-1]))
            extra["serving_ab_verified_s"] = ab_time(
                ab_ver, lambda p: float(p[0, 0]))
            extra["serving_ab_noverif_s"] = ab_time(
                lambda i: ab_ver(i, uv=False), lambda p: float(p[0, 0]))
            # CLI mechanics: bounded in-flight queue, np.asarray drains
            for w in range(2):
                np.asarray(ab_ver(0))
            pending = []
            t0 = time.perf_counter()
            for i in range(NAB):
                pending.append(ab_ver(i))
                while len(pending) > 4:
                    np.asarray(pending.pop(0))
            for p in pending:
                np.asarray(p)
            extra["serving_ab_pipelined_s"] = round(
                (time.perf_counter() - t0) / NAB, 4)
            del imgs, tgts
            print(f"[bench] serving_ab: bare {extra['serving_ab_bare_s']} "
                  f"verified {extra['serving_ab_verified_s']} noverif "
                  f"{extra['serving_ab_noverif_s']} pipelined "
                  f"{extra['serving_ab_pipelined_s']} s/frame", flush=True)
        except Exception as e:
            print(f"[bench] serving_ab failed: {e}")
            extra["serving_ab_bare_s"] = None
        emit()

    # ---------------- training throughput (paper config) -----------------
    if leg_fits("train_throughput", 240.0, extra):
        from nefes_tpu.train import (
            create_train_state, make_optimizer, train_step_rays,
        )
        tx = make_optimizer()
        state = create_train_state(model, jax.random.key(4), tx)
        tr_cfg = cfg.render_config(n_samples=64, n_importance=64,
                                   remat=False)
        Bt, n_rand = 4, 1536
        FOCAL = GEOMS["7scenes"][4]
        hwf = (H, W, FOCAL)
        batch = {
            "rgb": jax.random.uniform(jax.random.key(5), (Bt, H, W, 3)),
            "poses": jnp.broadcast_to(pose, (Bt, 3, 4)),
            "hists": jnp.zeros((Bt, 10)),
            "feat": jax.random.normal(jax.random.key(6),
                                      (Bt, H, W, cfg.feature_dim)),
        }
        state, tl, _ = train_step_rays(model, tr_cfg, tx, state, batch,
                                       jax.random.key(7),
                                       jnp.asarray(5e-4),
                                       hwf, NEAR, FAR, n_rand=n_rand,
                                       stage=1)
        float(tl)
        t0 = time.perf_counter()
        steps = 8
        for i in range(steps):
            state, tl, _ = train_step_rays(model, tr_cfg, tx, state, batch,
                                           jax.random.key(8 + i),
                                           jnp.asarray(5e-4), hwf, NEAR,
                                           FAR, n_rand=n_rand, stage=1)
        float(tl)
        extra["train_rays_per_sec"] = int(
            Bt * n_rand * steps / (time.perf_counter() - t0))
        del state, batch
        emit()

    # ---------------- mode 3 BATCHED (regression guard) ----------------
    # mode 3's per-frame state is just (r, t) + Adam moments — vmapping
    # frames adds MXU work without the mode-2 param-copy traffic, so
    # batching could plausibly win. MEASURED (r4, v5e): it does NOT —
    # 1.07 s/frame at B=4 vs 0.98 serial. The scan is matmul-issue-bound
    # (KERNEL_r04), so 4x the samples per launch just runs ~4x as long,
    # and the 4x (R, S, N) sampling tensors push past the point where
    # XLA's scheduling stays tight. Serial-with-prefetch is the shipped
    # optimum for BOTH modes; the number is re-measured every run.
    def mode3_batched(geom_key, B=4):
        from nefes_tpu.refine import refine_poses_batch
        from nefes_tpu.geometry.transforms import WorldSetup
        H, W, _, _, FOCAL = GEOMS[geom_key]
        hwf = (H, W, FOCAL)
        _, t1 = render_feature_image(model, variables, pose, hist, hwf,
                                     NEAR, FAR, rcfg_render)
        tgts = jax.lax.stop_gradient(jnp.broadcast_to(
            t1, (B,) + t1.shape))
        poses0 = jnp.stack([pose.at[:, 3].add(0.01 * i) for i in range(B)])
        hists = jnp.zeros((B, 10))
        ws = WorldSetup(near=NEAR, far=FAR, pose_scale=1.0, pose_scale2=1.0,
                        move_all_cam_vec=(0.0, 0.0, 0.0))

        def run(ps):
            return refine_poses_batch(model, variables, ps, tgts, hists,
                                      ws, hwf, rcfg_render, rcfg)
        for w in range(2):
            _, ls = run(poses0 + 1e-5 * w)
            float(ls[-1, -1])
        t0 = time.perf_counter()
        for i in range(FRAMES_TO_TIME):
            _, ls = run(poses0 + 1e-4 * (i + 1))
            float(ls[-1, -1])
        return (time.perf_counter() - t0) / FRAMES_TO_TIME / B

    if leg_fits("mode3_batched4", 300.0, extra):
        try:
            extra["mode3_batched4_s_per_frame"] = round(
                mode3_batched("7scenes", B=4), 4)
        except Exception as e:
            print(f"[bench] batched mode-3 failed: {e}")
            extra["mode3_batched4_s_per_frame"] = None
        emit()

    # ---------------- mode 2 BATCHED (measured pessimization) ------------
    # vmapping B frames carries B copies of the VGG16 params + Adam state;
    # measured 1.85 s/frame at B=4 vs 1.38 serial (BENCH_r03) — kept as a
    # regression guard for that finding. The shipped serving config is
    # serial-with-prefetch (refine_batch=1, cli/refine.py).
    def mode2_batched(geom_key, B=4):
        from nefes_tpu.refine import refine_apr_batch
        H, W, FULL_H, FULL_W, FOCAL = GEOMS[geom_key]
        hwf = (H, W, FOCAL)
        hwf_full = (FULL_H, FULL_W, FOCAL * 4)
        imgs = jax.random.uniform(jax.random.key(9), (B, FULL_H, FULL_W, 3))
        dfnet = DFNet(output_dim=cfg.feature_dim, dtype=jnp.bfloat16)
        dfvars = dfnet.init(jax.random.key(1), imgs[:1],
                            upsample_hw=(FULL_H, FULL_W))
        tgts = jax.lax.stop_gradient(extract_target_features(
            dfnet, dfvars, imgs, FULL_H, FULL_W))
        hists = jnp.zeros((B, 10))

        def run(ims):
            return refine_apr_batch(model, variables, dfnet, dfvars, ims,
                                    tgts, hists, ws_vec, hwf, hwf_full,
                                    NEAR, FAR, rcfg_render, rcfg,
                                    svd_reg=True)
        for w in range(2):
            o = run(jnp.clip(imgs + 1e-5 * w, 0.0, 1.0))
            float(o["losses"][-1, -1])
        t0 = time.perf_counter()
        for i in range(FRAMES_TO_TIME):
            o = run(jnp.clip(imgs + 1e-4 * (i + 1), 0.0, 1.0))
            float(o["losses"][-1, -1])
        return (time.perf_counter() - t0) / FRAMES_TO_TIME / B

    if leg_fits("mode2_batched4", 360.0, extra):
        try:
            extra["mode2_batched4_s_per_frame"] = round(
                mode2_batched("7scenes", B=4), 4)
        except Exception as e:   # HBM-bound configs must not kill bench
            print(f"[bench] batched mode-2 failed: {e}")
            extra["mode2_batched4_s_per_frame"] = None
        emit()

    # ---- mode 3 with the Pallas fused refinement render — the PRE-
    # EMBEDDED composite-fused variant (XLA embeds, kernel runs tower +
    # heads + in-kernel composite, per-ray outputs): the best-measured
    # kernel config, at parity with the unfused scan (r4 in-scan A/B:
    # 0.964 vs 0.965 s/frame; the raw-input variant pays its in-kernel
    # trig twice under value_and_grad and loses, KERNEL_r04.json) ----
    if leg_fits("mode3_fused_render", 600.0, extra):
        try:
            from dataclasses import replace as dc_replace
            rcfg_render_fused = dc_replace(rcfg_render, fused=True,
                                           fused_pre=True,
                                           fused_need_dw=False,
                                           fused_render=True)
            Hs, Ws, _, _, FOCAL = GEOMS["7scenes"]
            hwf = (Hs, Ws, FOCAL)
            _, targetf = render_feature_image(model, variables, pose, hist,
                                              hwf, NEAR, FAR, rcfg_render)
            targetf = jax.lax.stop_gradient(targetf)

            def run3f(p):
                return refine_pose_single(model, variables, p, targetf,
                                          hist, ws_vec, hwf, NEAR, FAR,
                                          rcfg_render_fused, rcfg)
            for w in range(2):
                _, lf = run3f(pose + 1e-5 * w)
                float(lf[-1])
            t0 = time.perf_counter()
            for i in range(FRAMES_TO_TIME):
                _, lf = run3f(pose + 1e-4 * (i + 1))
                float(lf[-1])
            extra["mode3_fused_render_s_per_frame"] = round(
                (time.perf_counter() - t0) / FRAMES_TO_TIME, 4)
            extra["final_loss_mode3_fused"] = float(np.asarray(lf)[-1])
            del targetf
        except Exception as e:
            print(f"[bench] fused-render mode-3 failed: {e}")
            extra["mode3_fused_render_s_per_frame"] = None
        emit()

    # README.md's perf table is GENERATED from these rows (VERDICT r3
    # weak #6: hand-copied numbers drifted from the evidence files) —
    # paste verbatim between the README's bench-table markers
    def row(label, key, unit="s/frame", scale=1.0, fmt="{:.4f}"):
        v = extra.get(key)
        return (f"| {label} | "
                + (fmt.format(v * scale) if v is not None else "—")
                + f" {unit} |")

    print("\n".join([
        "<!-- bench-table (generated by bench.py) -->",
        "| measurement | value |", "|---|---|",
        row("mode 2 APR refinement (7-Scenes, f32)",
            "mode2_apr_s_per_frame_f32"),
        row("mode 2 APR refinement (7-Scenes, bf16)",
            "mode2_apr_s_per_frame_bf16"),
        row("mode 2 APR refinement (Cambridge, bf16)",
            "mode2_cambridge_s_per_frame_bf16"),
        row("mode 3 pose refinement (7-Scenes)", "mode3_pose_s_per_frame"),
        row("mode 3 pose refinement (Cambridge)",
            "mode3_cambridge_s_per_frame"),
        row("mode 3 batched x4", "mode3_batched4_s_per_frame"),
        row("mode 2 batched x4 (regression guard)",
            "mode2_batched4_s_per_frame"),
        row("CLI serving, end-to-end per frame", "cli_s_per_frame"),
        row("CLI serving mode 3, end-to-end per frame",
            "cli_mode3_s_per_frame"),
        row("training throughput", "train_rays_per_sec", unit="rays/s",
            fmt="{:.0f}"),
        row("mode-2 bf16 MFU", "mode2_bf16_mfu", unit="", fmt="{:.3f}"),
        "<!-- /bench-table -->",
    ]))

    return emit()   # final (complete) record is the last stdout line


def bench_cli_serving(pose_only: int = 2) -> dict:
    """Serving-path cost through cli/refine.py (verification on for mode
    2, refine_batch=1 — serial-with-prefetch, the measured optimum; see
    the mode2_batched4 finding) on on-disk fixtures at the 7-Scenes
    geometry (480x640 pngs, df=2 -> 240x320). One 16-frame fixture, one
    warm-up invocation (compiles every executable), ONE timed invocation:
    cli_s_per_frame = T16/16. The run-level fixed costs (scene load,
    model/DFNet init, txt dump) are ~0.4-1 s total (measured r4), i.e.
    <0.07 s/frame at 16 frames — included, which only makes the number
    conservative. (r4's (T16-T8)/8 min-of-2 marginal estimator cost 12
    CLI invocations, still varied 1.54-1.91 s run-to-run on the shared
    tunneled chip, and pushed the driver past its timeout.)
    pose_only=3 measures the mode-3 serving loop (APR init + SE(3)-delta
    scans, pipelined staging like mode 2).

    Per-frame progress prints are captured to keep the driver's stdout
    tail anchored on the JSON record lines."""
    import contextlib
    import shutil
    import sys
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from tests.fixture_datasets import make_7scenes_fixture
    from nefes_tpu.cli.refine import main as refine_main

    frames = 16
    root = f"/tmp/bench_cli_fixture_m{pose_only}_{frames}"
    if os.path.isdir(root):
        shutil.rmtree(root)
    paths = make_7scenes_fixture(root, frames_per_seq=frames,
                                 img_hw=(480, 640))
    argv = [
        "--dataset_type", "7Scenes", "--pose_only", str(pose_only),
        "--df", "2", "--tinyscale", "4",
        "--opt_iter", str(OPT_ITER), "--refine_batch", "1",
        "--apr_compute_dtype", "bfloat16", "--svd_reg", "true",
        "--save_dir", f"/tmp/bench_cli_out_m{pose_only}",
        "--datadir", paths["datadir"], "--data_root", paths["data_root"],
    ]

    def run():
        buf = io.StringIO()
        t0 = time.perf_counter()
        try:
            with contextlib.redirect_stdout(buf):
                refine_main(argv)
        except Exception:
            print(buf.getvalue()[-2000:])
            raise
        return time.perf_counter() - t0, buf.getvalue()

    run()                        # compile + warm every executable
    t16, out = run()             # one timed steady-state invocation
    pre = "cli" if pose_only == 2 else "cli_mode3"
    print(f"[bench] {pre}: {t16:.2f}s / {frames} frames", flush=True)
    res = {f"{pre}_s_per_frame": round(t16 / frames, 4),
           f"{pre}_total_16_frames_s": round(t16, 2)}
    # attribute the end-to-end total from the CLI's own phase marks
    # ([refine +T.Ts] msg): setup (scene+model+weights), target
    # precompute, and the refinement launch loop — the loop's per-frame
    # rate is the marginal serving cost without extra invocations
    # (the r4 (T16-T8)/8 estimator cost 12 CLI runs and blew the driver
    # budget, VERDICT r4 weak #1)
    marks = {m.group(2).strip(): float(m.group(1)) for m in
             re.finditer(r"\[refine \+([0-9.]+)s\] (.+)", out)}
    ready = marks.get("models/weights ready")
    tgt = marks.get("targets precomputed")
    drained = marks.get("refinement drained")
    if ready is not None:
        res[f"{pre}_setup_s"] = round(ready, 2)
    if "init poses computed" in marks and ready is not None:
        res[f"{pre}_init_poses_s"] = round(
            marks["init poses computed"] - ready, 2)
        if tgt is not None:
            res[f"{pre}_targets_s"] = round(
                tgt - marks["init poses computed"], 2)
    elif tgt is not None and ready is not None:
        res[f"{pre}_targets_s"] = round(tgt - ready, 2)
    if drained is not None and tgt is not None:
        res[f"{pre}_refine_loop_s"] = round(drained - tgt, 2)
        res[f"{pre}_refine_loop_s_per_frame"] = round(
            (drained - tgt) / frames, 4)
    return res


if __name__ == "__main__":
    main()
