"""Refinement CLI — the test_refinement.py equivalent.

  python -m nefes_tpu.cli.refine --config <scene_DFM.txt> --pose_only {2,3}

pose_only=2: APR-weight refinement (paper headline, DFM_APR_refine.py)
pose_only=3: explicit SE(3)-delta refinement (DFM_pose_refine.py)

Writes the refined poses in the reference txt format
(<PoseEstimatorType>_<scene>_NeFeS<iters>_APR_pose_results.txt) so
nefes_tpu.cli.evaluate / the reference's eval.py both consume them.
"""

from __future__ import annotations

import os
import time

import numpy as np


def main(argv=None):
    from nefes_tpu.cli.options import options_from_cli
    from nefes_tpu.cli.train import build_model, build_scene
    opts = options_from_cli(argv)
    assert opts.pose_only in (2, 3), "refinement needs --pose_only 2|3"

    import jax
    import jax.numpy as jnp
    from nefes_tpu.evaluation import pose_errors, summarize, save_pose_txt
    from nefes_tpu.features.convert import (
        convert_dfnet, convert_nefes_checkpoint, load_torch_state_dict,
    )
    from nefes_tpu.features.dfnet import DFNet, extract_target_features
    from nefes_tpu.refine import (
        RefineConfig, apply_verification, apr_pose, refine_apr_single,
        refine_apr_verified,
        refine_poses_batch,
    )
    from nefes_tpu.train import create_train_state, make_optimizer

    t_start = time.time()

    def phase(msg):
        print(f"[refine +{time.time() - t_start:.1f}s] {msg}", flush=True)

    scene_name = os.path.basename(opts.datadir.rstrip("/"))
    if opts.load_pose_avg_stats:
        test = build_scene(opts, train=False)
    else:
        # computed centering stats must come from the TRAIN split (the
        # frame the field was trained in), not from the test split
        train_scene = build_scene(opts, train=True)
        test = build_scene(opts, train=False,
                           pose_avg_override=train_scene.pose_avg_stats)
    phase("scene loaded")
    cfg, model = build_model(opts)
    # refinement runs the field in the benched compute dtype (bf16 by
    # default — see options.field_compute_dtype): the field MLP is
    # bandwidth-floored, so leaving build_model's f32 was measured as the
    # whole 1.50-vs-1.12 s/frame CLI serving gap (params stay f32)
    from nefes_tpu.train import ModelConfig, NeFeSModel
    fdt = jnp.dtype(opts.field_compute_dtype)
    if isinstance(cfg, ModelConfig) and jnp.dtype(cfg.dtype) != fdt:
        import dataclasses
        cfg = dataclasses.replace(cfg, dtype=fdt)
        model = NeFeSModel(cfg)

    # field weights: converted reference .tar or our orbax ckpt
    if opts.ft_path and opts.ft_path.endswith(".tar"):
        variables = convert_nefes_checkpoint(opts.ft_path, depth=opts.netdepth)
    elif opts.ft_path:
        from nefes_tpu.train import restore_checkpoint
        tx = make_optimizer()
        state = restore_checkpoint(opts.ft_path,
                                   create_train_state(model,
                                                      jax.random.key(0), tx))
        variables = state.variables
    else:
        print("WARNING: no ft_path — random field (smoke mode)")
        variables = model.init_variables(jax.random.key(0))

    # feature extractor: always DFNet (load_FeatureNet,
    # direct_pose_model.py:109-118)
    apr_dt = jnp.dtype(opts.apr_compute_dtype)
    dfnet = DFNet(output_dim=opts.feature_dim, dtype=apr_dt)
    if opts.pretrain_featurenet_path:
        dfvars = convert_dfnet(
            load_torch_state_dict(opts.pretrain_featurenet_path))
    elif opts.pretrain_model_path and opts.PoseEstimatorType == "DFNet":
        dfvars = convert_dfnet(
            load_torch_state_dict(opts.pretrain_model_path))
    else:
        print("WARNING: random DFNet feature extractor (smoke mode)")
        dfvars = dfnet.init(jax.random.key(1),
                            jnp.zeros((1, test.H, test.W, 3)),
                            upsample_hw=(test.H, test.W))

    # pose estimator: dispatch on PoseEstimatorType
    # (load_APR_and_FeatureNet, direct_pose_model.py:148-173)
    from nefes_tpu.features.apr_loader import load_apr
    pose_avg = getattr(test, "pose_avg_stats", None)
    if opts.PoseEstimatorType == "DFNet":
        apr_module = dfnet
        if opts.pretrain_model_path and opts.pretrain_featurenet_path:
            # distinct APR vs FeatureNet checkpoints (the DFM configs give
            # both paths, config_stairs_DFM.txt)
            apr_vars = convert_dfnet(
                load_torch_state_dict(opts.pretrain_model_path))
        else:
            apr_vars = dfvars
    else:
        apr_module, apr_vars, _ = load_apr(
            opts.PoseEstimatorType, opts.pretrain_model_path or None,
            (test.H, test.W), jax.random.key(2),
            feature_dim=opts.feature_dim, dataset_type=opts.dataset_type,
            pose_avg_stats=pose_avg)

    phase("models/weights ready")
    h, w = opts.render_hw(test.H, test.W)
    hwf_render = (h, w, float(test.focal) / opts.tinyscale)
    near, far = test.near, test.far
    if opts.set_near_far:
        near, far = opts.near_far
    rcfg_render = cfg.render_config(
        n_samples=opts.N_samples, n_importance=opts.N_importance,
        perturb=False, test_time=True, output_transient=False,
        remat=False)
    rcfg = RefineConfig(opt_iter=opts.opt_iter, lr_r=opts.lr_r,
                        lr_t=opts.lr_t, tinyscale=opts.tinyscale,
                        per_pixel=opts.per_pixel,
                        learning_rate=opts.learning_rate,
                        fusion=opts.fusion_bn)
    ws = test.world
    ws_vec = jnp.asarray([ws.pose_scale, ws.pose_scale2,
                          *ws.move_all_cam_vec], jnp.float32)

    n = len(test)
    results = np.zeros((n, 2))
    out_poses = np.zeros((n, 3, 4), np.float32)
    t0 = time.time()

    masks = test.masks if (opts.semantic and getattr(test, "masks", None)
                           is not None) else None

    if opts.pose_only == 2:
        # precompute ALL target features batched up front (the reference
        # re-extracts per frame inside the loop, DFM_APR_refine.py:218).
        # Residency: full-res 128-ch targets are ~39 MB/frame. Sets that
        # fit comfortably stay ON DEVICE (they are computed there; the
        # host round-trip + re-upload over the remote-TPU tunnel costs
        # more than the refinement itself). Big sets (7-Scenes tests run
        # to 5000 frames ≈ 195 GB) spill to host and stream back per
        # slice, double-buffered.
        hists_dev = jnp.asarray(test.hists)
        # level 0 only — the reference's mode 2 always matches
        # feature_list[0][0] (DFM_APR_refine.py:222)
        target_bytes = n * test.H * test.W * opts.feature_dim * 4
        on_device = target_bytes < 2 * 1024 ** 3
        tlist = []
        for i in range(0, n, 8):
            f = extract_target_features(
                dfnet, dfvars, jnp.asarray(test.images[i:i + 8]),
                test.H, test.W)
            tlist.append(f if on_device else np.asarray(f))
        targets = (jnp.concatenate(tlist) if on_device
                   else np.concatenate(tlist))
        images_all = jnp.asarray(test.images) if on_device else test.images
        del tlist
        masks_np = None
        if masks is not None:
            # loader masks live at render scale (H/tinyscale); the mode-2
            # loss runs on full-res upsampled features -> nearest upsample
            m = jnp.asarray(masks)[..., None]
            m = jax.image.resize(m, (m.shape[0], test.H, test.W, 1),
                                 method="nearest")
            masks_np = np.asarray(m[..., 0])

        phase("targets precomputed")
        from nefes_tpu.refine import refine_apr_batch
        from nefes_tpu.refine.apr_opt import refine_apr_verified_scanned
        kw = dict(svd_reg=opts.svd_reg, freeze_bn=opts.freezeBN,
                  apr_kind=opts.PoseEstimatorType,
                  dataset_type=opts.dataset_type,
                  pose_avg=None if pose_avg is None
                  else jnp.asarray(pose_avg))
        hwf_full = (test.H, test.W, float(test.focal))
        B = max(1, opts.refine_batch)
        # scan_frames folds G frames into one lax.scan launch (serial
        # inside — single-frame memory, one dispatch per G frames); only
        # meaningful at refine_batch=1, the measured mode-2 optimum
        SF = max(1, opts.scan_frames) if B == 1 else 1
        G = SF if B == 1 else B
        slices = [slice(i, min(i + G, n)) for i in range(0, n, G)]

        def stage(sl):
            """Start the slice's host->device transfers (device_put is
            async, so the NEXT slice's ~39 MB/frame of full-res targets
            stream over the tunnel while the CURRENT slice's refinement
            scan computes — without this the loop serialises transfer ->
            compute -> readback every launch). With on-device residency
            these are zero-copy device slices."""
            return (jax.device_put(images_all[sl]),
                    jax.device_put(targets[sl]),
                    None if masks_np is None
                    else jax.device_put(masks_np[sl]))

        # Launch pipeline: per-slice host syncs (np.asarray of the refined
        # pose) would stall dispatch of the NEXT slice behind the current
        # scan each launch — with the axon tunnel's per-launch latency
        # that was ~0.45 s/frame of serving overhead (BENCH_r03
        # cli_s_per_frame 1.83 vs 1.38 scan-only). Instead keep a bounded
        # queue of in-flight device results (LOOKAHEAD slices deep, so the
        # spill path never stages the whole set) and materialize behind it;
        # pose_errors/printing move OFF the hot loop entirely.
        LOOKAHEAD = 4
        pending: list[tuple[slice, object]] = []

        def drain(entry):
            sl_p, pose_dev = entry
            out_poses[sl_p] = np.asarray(pose_dev).reshape(-1, 3, 4)
            phase(f"drained {sl_p.start}")

        if B == 1 and SF == 1 and on_device:
            # FAST PATH (device-resident sets): one launch per frame over
            # the FULL arrays with a traced index — zero per-frame
            # staging. The per-slice stage()+device_put pipeline below
            # adds 3-4 tunnel dispatches per frame, measured as the CLI
            # loop's 1.64 vs 1.09 s/frame gap against the identical
            # in-process launch sequence (BENCH r5 serving_ab_pipelined).
            masks_dev = None if masks_np is None else jnp.asarray(masks_np)
            for i in range(n):
                pose = refine_apr_verified(
                    model, variables, apr_module, apr_vars,
                    images_all, targets, hists_dev, i, i,
                    ws_vec, hwf_render, hwf_full, near, far,
                    rcfg_render, rcfg, masks=masks_dev,
                    use_verification=not opts.no_verification_step,
                    verification_metric=opts.verification_metric,
                    has_mask=masks_dev is not None, **kw)
                pending.append((slice(i, i + 1), pose))
                while len(pending) > LOOKAHEAD:
                    drain(pending.pop(0))
                if i % 50 == 0:
                    print(f"queued {i}/total {n}", flush=True)
            slices = []
        staged = stage(slices[0]) if slices else None
        for si, sl in enumerate(slices):
            imgs_d, tgts_d, masks_d = staged
            staged = stage(slices[si + 1]) if si + 1 < len(slices) else None
            nb = sl.stop - sl.start
            if SF > 1:
                # pad the tail slice by repeating the last frame so every
                # launch reuses ONE compiled executable (a fresh tail
                # shape would recompile the whole VGG16-in-scan program —
                # minutes through the remote relay vs ~1 s/frame of
                # redundant refinement)
                idxs = jnp.asarray(np.minimum(np.arange(G), nb - 1),
                                   jnp.int32)
                hidxs = jnp.asarray(
                    np.minimum(np.arange(sl.start, sl.start + G),
                               sl.stop - 1), jnp.int32)
                poses = refine_apr_verified_scanned(
                    model, variables, apr_module, apr_vars,
                    imgs_d, tgts_d, hists_dev, idxs, hidxs,
                    ws_vec, hwf_render, hwf_full, near, far,
                    rcfg_render, rcfg, masks=masks_d,
                    use_verification=not opts.no_verification_step,
                    verification_metric=opts.verification_metric,
                    has_mask=masks_d is not None, **kw)
                pending.append((sl, poses[:nb]))
                phase(f"launched {sl.start}..{sl.stop - 1}")
            elif nb == 1 or B == 1:
                for j in range(nb):
                    # one launch per frame: slicing + scan + verification
                    # inside a single jit (refine_apr_verified)
                    pose = refine_apr_verified(
                        model, variables, apr_module, apr_vars,
                        imgs_d, tgts_d, hists_dev, j, sl.start + j,
                        ws_vec, hwf_render, hwf_full, near, far,
                        rcfg_render, rcfg, masks=masks_d,
                        use_verification=not opts.no_verification_step,
                        verification_metric=opts.verification_metric,
                        has_mask=masks_d is not None, **kw)
                    pending.append((slice(sl.start + j, sl.start + j + 1),
                                    pose))
                    phase(f"launched {sl.start + j}")
            else:
                out = refine_apr_batch(
                    model, variables, apr_module, apr_vars,
                    imgs_d, tgts_d, hists_dev[sl], ws_vec,
                    hwf_render, hwf_full, near, far, rcfg_render, rcfg,
                    masks=masks_d, **kw)
                poses = out["refined_pose"] if opts.no_verification_step \
                    else apply_verification(out, opts.verification_metric)
                pending.append((sl, poses))
            while len(pending) > LOOKAHEAD:
                drain(pending.pop(0))
            if si % max(1, 50 // B) == 0:
                print(f"queued {sl.start}/total {n}", flush=True)
        for entry in pending:
            drain(entry)
        phase("refinement drained")
        results = pose_errors(out_poses, test.poses)
    else:  # pose_only == 3: APR init poses then SE(3) delta refinement
        from nefes_tpu.refine.apr_opt import apr_poses_batched
        pose_avg_j = None if pose_avg is None else jnp.asarray(pose_avg)
        # module-level jitted batched APR forward (apr_poses_batched):
        # a per-invocation jit(vmap(...)) wrapper retraced the whole
        # VGG16 program every main() call — measured 22.3 s of the
        # 16-frame mode-3 serving fixture vs 3.6 s eager (BENCH r5
        # cli_mode3_init_poses_s); the cache-stable module-level form
        # pays tracing once per process
        init_poses = []
        for i in range(0, n, 8):
            chunk = np.asarray(test.images[i:i + 8])
            nb = chunk.shape[0]
            if nb < 8:   # pad the tail: a fresh shape would recompile
                chunk = np.concatenate(
                    [chunk, np.repeat(chunk[-1:], 8 - nb, axis=0)])
            init_poses.append(np.asarray(apr_poses_batched(
                opts.PoseEstimatorType, apr_module, apr_vars,
                jnp.asarray(chunk), opts.svd_reg,
                dataset_type=opts.dataset_type,
                pose_avg=pose_avg_j))[:nb])
        init_poses = np.concatenate(init_poses)
        phase("init poses computed")

        if len(opts.feature_matching_lvl) != 1:
            # the rendered (fused) features are feature_dim channels; a
            # multi-level concat target cannot be cosine-matched against
            # them (the reference always runs [0], dm/options.py:24-25)
            raise ValueError(
                "feature_matching_lvl must select exactly one level for "
                f"DFM refinement, got {opts.feature_matching_lvl!r}")
        # render-scale targets are small (h*w*feature_dim*4 ≈ 2.5 MB per
        # frame at 7-Scenes); keep them ON DEVICE when the set fits — the
        # host readback here plus the per-launch re-upload in stage3 cost
        # a measured 2.7 s + ~0.1 s/frame over the tunnel (BENCH r5
        # cli_mode3_targets_s). Huge sets spill to host and stream back
        # per slice, exactly like mode 2 above.
        target_bytes3 = n * h * w * opts.feature_dim * 4
        on_device3 = target_bytes3 < 2 * 1024 ** 3
        targets = []
        for i in range(0, n, 8):
            f = extract_target_features(dfnet, dfvars,
                                        jnp.asarray(test.images[i:i + 8]),
                                        h, w,
                                        levels=tuple(opts.feature_matching_lvl))
            targets.append(f if on_device3 else np.asarray(f))
        targets = (jnp.concatenate(targets) if on_device3
                   else np.concatenate(targets))
        phase("targets precomputed")

        B = max(1, opts.refine_batch)  # cameras refined per launch
        # scan_frames folds G frames into one lax.scan launch (serial
        # inside — single-frame memory, one dispatch per G frames); only
        # meaningful at refine_batch=1 (same rationale as mode 2 above)
        SF = max(1, opts.scan_frames) if B == 1 else 1
        G = SF if B == 1 else B
        slices = [slice(i, min(i + G, n)) for i in range(0, n, G)]
        hists_np = np.asarray(test.hists)
        masks_np3 = None if masks is None else np.asarray(masks)

        def stage3(sl):
            """Async host->device staging of the NEXT slice's inputs (same
            pattern as mode 2 above: device_put returns immediately, so
            the 2.5 MB/frame render-scale targets stream over the tunnel
            while the current slice's scan computes). A short tail slice
            is padded by repeating the last frame so every launch reuses
            ONE compiled executable (a fresh tail shape would recompile
            the whole scan program — minutes through the remote relay)."""
            idx = np.minimum(np.arange(sl.start, sl.start + G), sl.stop - 1)
            tg = (jnp.take(targets, jnp.asarray(idx, jnp.int32), axis=0)
                  if on_device3 else jax.device_put(targets[idx]))
            return (jax.device_put(init_poses[idx]),
                    tg,
                    jax.device_put(hists_np[idx]),
                    None if masks_np3 is None
                    else jax.device_put(masks_np3[idx]))

        # bounded in-flight queue: a per-slice np.asarray sync here would
        # stall dispatch of the next launch behind the current scan (the
        # mode-2 comment above measures that at ~0.45 s/frame through the
        # axon tunnel); materialize refined poses LOOKAHEAD launches late
        LOOKAHEAD = 4
        pending: list[tuple[slice, object]] = []
        from nefes_tpu.refine.pose_opt import (
            refine_pose_indexed, refine_poses_scanned,
        )
        if B == 1 and SF == 1 and on_device3:
            # FAST PATH (device-resident targets): one launch per frame
            # over the full arrays with a traced index — zero per-frame
            # staging (same measured rationale as the mode-2 fast path
            # above; BENCH r5 serving_ab)
            poses_dev = jnp.asarray(init_poses)
            hists_dev3 = jnp.asarray(hists_np)
            masks_dev3 = (None if masks_np3 is None
                          else jnp.asarray(masks_np3))
            for i in range(n):
                refined = refine_pose_indexed(
                    model, variables, poses_dev, targets, hists_dev3, i,
                    ws_vec, hwf_render, ws.near, ws.far,
                    rcfg_render, rcfg,
                    masks=masks_dev3, has_mask=masks_dev3 is not None)
                pending.append((slice(i, i + 1), refined[None]))
                while len(pending) > LOOKAHEAD:
                    sl_p, ref_p = pending.pop(0)
                    out_poses[sl_p] = np.asarray(ref_p)
                if i % 50 == 0:
                    print(f"queued {i}/total {n}", flush=True)
            slices = []
        staged = stage3(slices[0]) if slices else None
        for si, sl in enumerate(slices):
            poses_d, tgts_d, hists_d, masks_d = staged
            staged = stage3(slices[si + 1]) if si + 1 < len(slices) else None
            nb = sl.stop - sl.start
            if SF > 1:
                refined = refine_poses_scanned(
                    model, variables, poses_d, tgts_d, hists_d,
                    ws, hwf_render, rcfg_render, rcfg, masks=masks_d)
            else:
                refined, _ = refine_poses_batch(
                    model, variables, poses_d, tgts_d, hists_d,
                    ws, hwf_render, rcfg_render, rcfg, masks=masks_d)
            pending.append((sl, refined[:nb]))
            while len(pending) > LOOKAHEAD:
                sl_p, ref_p = pending.pop(0)
                out_poses[sl_p] = np.asarray(ref_p)
            if si % max(1, 50 // B) == 0:
                print(f"queued {sl.start}/total {n}", flush=True)
        for sl_p, ref_p in pending:
            out_poses[sl_p] = np.asarray(ref_p)
        phase("refinement drained")
        results = pose_errors(out_poses, test.poses)

    dt = time.time() - t0
    s = summarize(results)
    print(f"Total execution time = {dt:.3f} sec "
          f"({dt / max(n, 1):.3f} s/frame)")
    print(f"Median error {s['median_t_m']}m and {s['median_r_deg']} degrees.")
    print(f"Mean error {s['mean_t_m']}m and {s['mean_r_deg']} degrees.")

    save_dir = opts.save_dir or (
        f"tmp/{opts.PoseEstimatorType}_NeFeS{opts.opt_iter}_"
        f"{opts.dataset_type}/{scene_name}")
    os.makedirs(save_dir, exist_ok=True)
    out_txt = (f"{save_dir}/{opts.PoseEstimatorType}_{scene_name}_"
               f"NeFeS{opts.opt_iter}_APR_pose_results.txt")
    save_pose_txt(out_txt, out_poses)
    print(f"saved {out_txt}")
    return s


if __name__ == "__main__":
    main()
