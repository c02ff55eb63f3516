"""NeFeS training CLI — the run_nefes.py equivalent.

Usage:
  python -m nefes_tpu.cli.train --config <scene_config.txt> [--flag val ...]

Accepts the reference's per-scene config txts (script/config/**). The
3-stage progressive schedule follows run_nefes.py:34-40: stage-1 runs are
color-only for `epochs`; stage-2 runs (new_schedule=2) train color+feature
until epoch 200 then color+feature+fusion with patch sampling.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np


def build_scene(opts, train: bool, pose_avg_override=None):
    from nefes_tpu.data import (
        load_7scenes_colmap, load_7scenes_dslam, load_cambridge,
    )
    scene = os.path.basename(opts.datadir.rstrip("/"))
    if opts.dataset_type == "7Scenes_colmap":
        root = os.path.dirname(opts.datadir.rstrip("/"))
        return load_7scenes_colmap(scene, root, opts.data_root, train=train,
                                   trainskip=opts.trainskip,
                                   testskip=opts.testskip, df=opts.df,
                                   hist_bin=opts.hist_bin,
                                   load_pose_avg_stats=opts.load_pose_avg_stats,
                                   pose_avg_override=pose_avg_override)
    if opts.dataset_type == "7Scenes":
        root = os.path.dirname(opts.datadir.rstrip("/"))
        return load_7scenes_dslam(scene, root, opts.data_root, train=train,
                                  trainskip=opts.trainskip,
                                  testskip=opts.testskip, df=opts.df,
                                  hist_bin=opts.hist_bin,
                                  load_pose_avg_stats=opts.load_pose_avg_stats,
                                  pose_avg_override=pose_avg_override)
    if opts.dataset_type == "Cambridge":
        root = os.path.dirname(opts.datadir.rstrip("/"))
        return load_cambridge(scene, root, train=train,
                              trainskip=opts.trainskip,
                              testskip=opts.testskip, df=opts.df,
                              semantic=opts.semantic,
                              tinyscale=opts.tinyscale,
                              hist_bin=opts.hist_bin,
                              load_pose_avg_stats=opts.load_pose_avg_stats,
                              pose_avg_override=pose_avg_override)
    raise ValueError(f"unknown dataset_type {opts.dataset_type!r}")


def embed_configs(opts):
    from nefes_tpu.fields.embedder import EmbedConfig
    # reduce_embedding modes (reference get_embedder reduce_mode):
    # 0 = half the frequency bands, 1 = identity (no encoding),
    # 2 = Nerfies coarse-to-fine window, annealed per epoch as a traced
    # argument of the jitted train steps (see window_for_epoch below)
    if opts.reduce_embedding == 0:
        xyz = EmbedConfig.reduced(opts.multires)
        dirs = EmbedConfig.reduced(opts.multires_views)
    elif opts.reduce_embedding == 1:
        xyz = EmbedConfig.identity()
        dirs = EmbedConfig.identity()
    else:
        xyz = EmbedConfig(num_freqs=opts.multires)
        dirs = EmbedConfig(num_freqs=opts.multires_views)
    return xyz, dirs


def is_zoo_field(opts) -> bool:
    """True when the flags select a non-NFF field (reference create_nerf
    dispatch: models/options.py:43-48 + nerfh.py:539-552)."""
    return (opts.tcnn or opts.sh_nff or opts.ffmlp
            or not opts.nerfh_nff or not opts.NeRFW)


def build_model(opts):
    if is_zoo_field(opts):
        from nefes_tpu.train.field_zoo import build_zoo_model
        return build_zoo_model(opts)
    from nefes_tpu.train import ModelConfig, NeFeSModel
    xyz, dirs = embed_configs(opts)
    cfg = ModelConfig(
        depth=opts.netdepth, width=opts.netwidth,
        feature_dim=opts.feature_dim,
        fusion_residual=opts.use_fusion_res,
        fusion_no_bn=opts.no_fusion_BN,
        hist_bin=opts.hist_bin,
        encode_hist=opts.encode_hist,
        xyz_embed=xyz,
        dir_embed=dirs,
    )
    return cfg, NeFeSModel(cfg)


def window_for_epoch(opts, cfg, epoch: int):
    """Nerfies coarse-to-fine band weights for reduce_embedding=2
    (reference embed_DNeRF + i_epoch rethreading, run_nefes.py:370-371);
    None for every other mode."""
    if opts.reduce_embedding != 2:
        return None
    from nefes_tpu.fields.embedder import train_windows
    n_full = (opts.epochToMaxFreq if opts.epochToMaxFreq > 0
              else max(opts.epochs, 1))
    return train_windows(float(epoch), cfg.xyz_embed, cfg.dir_embed, n_full)


def precompute_targets(opts, scene, dfnet_bundle):
    """Downsampled target rgb (+ DFNet features at render scale) for every
    training image. DFNet is frozen, so features are computed ONCE per
    scene instead of every batch as the reference does
    (run_nefes.py:137-139) — a pure win."""
    import jax.numpy as jnp
    from nefes_tpu.utils.image import resize_bilinear
    h, w = opts.render_hw(scene.H, scene.W)
    rgb = np.asarray(resize_bilinear(jnp.asarray(scene.images), h, w))
    feats = None
    if dfnet_bundle is not None:
        from nefes_tpu.features.dfnet import extract_target_features
        dfnet, dfvars = dfnet_bundle
        out = []
        for i in range(0, len(scene.images), 8):
            f = extract_target_features(
                dfnet, dfvars, jnp.asarray(scene.images[i:i + 8]), h, w)
            out.append(np.asarray(f))
        feats = np.concatenate(out)
    return rgb, feats


def main(argv=None):
    from nefes_tpu.cli.options import options_from_cli
    opts = options_from_cli(argv)

    import jax
    import jax.numpy as jnp
    from nefes_tpu.train import (
        create_train_state, make_optimizer, stage_for_epoch, lr_for_epoch,
        train_step_rays, train_step_patch, save_checkpoint,
        latest_checkpoint, restore_checkpoint,
    )
    from nefes_tpu.train.trainer import AuxConfig

    scene = build_scene(opts, train=True)
    cfg, model = build_model(opts)
    tx = make_optimizer(grad_clip=opts.grad_clip)
    state = create_train_state(model, jax.random.key(0), tx)

    expdir = os.path.join(opts.basedir, opts.expname)
    os.makedirs(expdir, exist_ok=True)
    with open(os.path.join(expdir, "args.txt"), "w") as f:
        for k in sorted(vars(opts)):
            f.write(f"{k} = {getattr(opts, k)}\n")

    ckpt = None if opts.no_reload else latest_checkpoint(
        os.path.join(expdir, "ckpts"))
    if opts.ft_path:
        ckpt = opts.ft_path
    if ckpt:
        print(f"restoring from {ckpt}")
        state = restore_checkpoint(ckpt, state)
        if (opts.new_schedule == 2 and not opts.render_test
                and ckpt == opts.ft_path):
            # reset ONLY on the explicit fine-tune entry (ft_path); an
            # auto-resume of a crashed stage-2 run from its own latest
            # checkpoint must keep its clock/optimizer
            # fine-tune start (reference run_nefes.py:323-326): the stage-2
            # schedule counts epochs from 0 (feature phase until 200, then
            # +fusion) — keep the restored params but reset the clock and
            # the optimizer (the reference never reloads optimizer state,
            # nerfh_nff.py:703-705)
            state = state.replace(
                epoch=jnp.zeros((), jnp.int32),
                opt_state=tx.init(state.params))
            print("new_schedule=2: reset epoch=0 + fresh optimizer "
                  "for fine-tuning")

    # frozen DFNet for feature targets (stages 1-2)
    dfnet_bundle = None
    zoo = is_zoo_field(opts)
    needs_feat = opts.new_schedule == 2 or opts.color_feat_loss \
        or opts.color_feat_fusion_loss or opts.color_feat_fusion_nerfw_loss
    if zoo and needs_feat:
        raise ValueError(
            "feature/fusion losses need the NeRFH-NFF field's feature "
            "head; the selected zoo field "
            f"({model.cfg.kind}) is color-only — train it with "
            "new_schedule=1 (the reference's legacy fields are likewise "
            "outside the run_nefes feature schedule)")
    if needs_feat:
        from nefes_tpu.features.dfnet import DFNet
        from nefes_tpu.features.convert import convert_dfnet, \
            load_torch_state_dict
        dfnet = DFNet(output_dim=opts.feature_dim)
        if opts.pretrain_featurenet_path:
            dfvars = convert_dfnet(
                load_torch_state_dict(opts.pretrain_featurenet_path))
        else:
            print("WARNING: no pretrain_featurenet_path — random DFNet")
            h, w = opts.render_hw(scene.H, scene.W)
            dfvars = dfnet.init(jax.random.key(1),
                                jnp.zeros((1, scene.H, scene.W, 3)),
                                upsample_hw=(h, w))
        dfnet_bundle = (dfnet, dfvars)

    target_rgb, target_feat = precompute_targets(opts, scene, dfnet_bundle)
    h, w = opts.render_hw(scene.H, scene.W)
    hwf = (h, w, float(scene.focal) / opts.tinyscale)
    near, far = scene.near, scene.far
    if opts.set_near_far:
        near, far = opts.near_far

    samples_per_step = (opts.batch_size * opts.N_rand
                        * (2 * opts.N_samples + opts.N_importance))
    remat = {"on": True, "off": False}.get(
        opts.remat, samples_per_step > 4_000_000)
    rcfg = cfg.render_config(
        n_samples=opts.N_samples, n_importance=opts.N_importance,
        perturb=opts.perturb > 0, raw_noise_std=opts.raw_noise_std,
        use_fine_only=opts.use_fine_only, remat=remat,
        output_transient=opts.NeRFW,
        transient_at_test=opts.transient_at_test)
    rcfg_test = rcfg.test()

    val_cache: list = []

    def run_validation(step):
        from nefes_tpu.render.validation import holdout_views, render_test
        if not val_cache:   # load the test split once, not per validation
            # the val split must live in the SAME world frame as the
            # train split — share the train centering pose when stats
            # were computed rather than loaded
            override = (None if opts.load_pose_avg_stats
                        else scene.pose_avg_stats)
            val_cache.append(build_scene(opts, train=False,
                                         pose_avg_override=override))
        val_scene = val_cache[0]
        full_hwf = (scene.H, scene.W, float(scene.focal))
        return render_test(
            model, state.variables,
            holdout_views(scene, skip=10, limit=opts.val_views),
            holdout_views(val_scene, skip=max(1, len(val_scene)
                                              // max(opts.val_views, 1)),
                          limit=opts.val_views),
            full_hwf, near, far, rcfg_test, dfnet_bundle, step,
            basedir=opts.basedir, expname=opts.expname,
            tinyscale=opts.tinyscale,
            with_feature=dfnet_bundle is not None,
            window=window_for_epoch(opts, cfg, step),
            render_video=(opts.render_video_train, opts.render_video_test))

    if opts.render_pose_only:
        # spiral-video entry (reference --render_pose_only, options.py:19):
        # render a spiral path around the train poses and exit
        from nefes_tpu.render.validation import render_spiral_video
        full_hwf = (scene.H, scene.W, float(scene.focal))
        path = render_spiral_video(
            model, state.variables, scene, full_hwf, near, far, rcfg_test,
            os.path.join(expdir, f"{opts.expname}_spiral.mp4"),
            n_views=opts.spiral_views,
            window=window_for_epoch(opts, cfg, int(state.epoch)))
        print(f"saved spiral video {path}")
        return state

    if opts.render_test:
        # render-only entry (reference run_nefes.py:328-333): evaluate the
        # restored checkpoint on train holdouts + val set, then exit
        run_validation(int(state.epoch))
        return state

    from dataclasses import replace as dc_replace
    aux_cfg = AuxConfig.from_options(opts, far)
    if opts.l1normloss and not (zoo and model.cfg.kind == "hash"):
        print("WARNING: l1normloss regularises hash-grid tables; ignored "
              "for this field (select the hash field with --tcnn)")
        aux_cfg = dc_replace(aux_cfg, l1normloss=False)
    target_depth = None
    if opts.depth_loss:
        if scene.depths is None:
            print("WARNING: depth_loss set but the dataset carries no "
                  "dpt depth targets (Cambridge train/dpt); ignored")
            aux_cfg = dc_replace(aux_cfg, depth=False)
        else:
            from nefes_tpu.utils.image import resize_bilinear
            target_depth = np.asarray(resize_bilinear(
                jnp.asarray(scene.depths[..., None]), h, w))[..., 0]

    n = len(scene)
    rng = jax.random.key(0)
    order_rng = np.random.default_rng(0)
    print(f"training {opts.expname}: {n} views at {h}x{w}, "
          f"schedule={opts.new_schedule}, epochs={opts.epochs}")

    import contextlib
    from nefes_tpu.utils.profiling import trace
    profile_epoch = int(state.epoch)  # trace the first epoch when asked

    t0 = time.time()
    for epoch in range(int(state.epoch), opts.epochs + 1):
        stage = (0 if opts.color_loss_only
                 else stage_for_epoch(opts.new_schedule, epoch))
        lr = jnp.asarray(lr_for_epoch(epoch, opts.lrate, opts.lrate_decay))
        perm = order_rng.permutation(n)
        window = window_for_epoch(opts, cfg, epoch)
        epoch_trace = (trace(opts.profile_dir)
                       if opts.profile_dir and epoch == profile_epoch
                       else contextlib.nullcontext())
        with epoch_trace:
            for i in range(0, n - opts.batch_size + 1, opts.batch_size):
                idx = perm[i:i + opts.batch_size]
                batch = {"rgb": jnp.asarray(target_rgb[idx]),
                         "poses": jnp.asarray(scene.poses[idx]),
                         "hists": jnp.asarray(scene.hists[idx])}
                if stage >= 1:
                    batch["feat"] = jnp.asarray(target_feat[idx])
                if opts.semantic and scene.masks is not None:
                    batch["mask"] = jnp.asarray(scene.masks[idx])
                if target_depth is not None:
                    batch["depth"] = jnp.asarray(target_depth[idx])
                rng, k = jax.random.split(rng)
                if stage == 2:
                    state, loss, aux = train_step_patch(
                        model, rcfg, tx, state, batch, k, lr, hwf, near,
                        far, window=window)
                else:
                    state, loss, aux = train_step_rays(
                        model, rcfg, tx, state, batch, k, lr, hwf, near,
                        far, n_rand=opts.N_rand, stage=stage, aux=aux_cfg,
                        window=window)
        state = state.replace(epoch=jnp.asarray(epoch + 1, jnp.int32))

        if epoch % opts.i_print == 0:
            print(f"[epoch {epoch}] stage={stage} loss={float(loss):.5f} "
                  f"psnr={float(aux['psnr']):.2f} "
                  f"({time.time() - t0:.0f}s)", flush=True)
            import json
            with open(os.path.join(expdir, "metrics.jsonl"), "a") as f:
                rec = {"epoch": epoch, "stage": stage,
                       "loss": float(loss),
                       "wall_s": round(time.time() - t0, 1)}
                rec.update({k: float(v) for k, v in aux.items()})
                f.write(json.dumps(rec) + "\n")
        if epoch % opts.i_weights == 0 and epoch > 0:
            path = save_checkpoint(os.path.join(expdir, "ckpts"), state,
                                   epoch)
            print(f"saved {path}")
        if opts.i_testset > 0 and epoch % opts.i_testset == 0 and epoch > 0:
            run_validation(epoch)
    print("done")
    return state


if __name__ == "__main__":
    main()
