"""Consolidated evidence/measurement CLI for the real TPU.

    python runtime/probe.py perf        # refinement-step + component timings
    python runtime/probe.py kernel      # Pallas kernel parity + timing
    python runtime/probe.py kernel --sweep   # tile-size sweep
    python runtime/probe.py mode2       # f32-vs-bf16 APR tower A/B
    python runtime/probe.py accuracy    # HEADLINE accuracy gate -> ACCURACY_r03.json

One entry point so every evidence file shares the same timing discipline:
compile + steady-state warmup (the first post-compile execution on the
remote-TPU runtime carries executable-load overhead), and host syncs via a
SCALAR device->host read (`jax.block_until_ready` is unreliable on the
experimental axon platform, and fetching big arrays over the tunnel
pollutes timings).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
# runnable as `python runtime/probe.py` from the repo root
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

H, W, FOCAL = 60, 80, 525.505 / 2 / 4      # 7-Scenes refinement geometry
NEAR, FAR = 0.0, 4.0


def sync_scalar(out) -> float:
    """Hard host sync on a SMALL value."""
    return float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])


def timeit(name: str, fn, n: int = 10) -> float:
    for _ in range(2):          # compile + steady-state warmup
        sync_scalar(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    sync_scalar(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name}: {dt * 1000:.2f} ms", flush=True)
    return dt


# --------------------------------------------------------------------------
# perf: refinement-step and component breakdown (ex perf_probe{,2,3}.py)
# --------------------------------------------------------------------------

def cmd_perf(args):
    from nefes_tpu.data.synthetic import look_at_pose
    from nefes_tpu.fields.embedder import embed
    from nefes_tpu.refine import RefineConfig, refine_pose_single
    from nefes_tpu.refine.losses import feature_cosine_loss
    from nefes_tpu.refine.pose_opt import render_feature_image
    from nefes_tpu.render.compositor import composite
    from nefes_tpu.render.sampling import sample_pdf, stratified_samples
    from nefes_tpu.train import ModelConfig, NeFeSModel

    print("device:", jax.devices()[0], flush=True)
    cfg = ModelConfig(dtype=jnp.bfloat16)
    model = NeFeSModel(cfg)
    variables = model.init_variables(jax.random.key(0))
    params = variables["params"]
    rcfg = cfg.render_config(n_samples=64, n_importance=64,
                             output_transient=False, test_time=True,
                             perturb=False, remat=False)
    pose = jnp.asarray(look_at_pose(np.array([0.0, 0.3, 2.4], np.float32)))
    hist = jnp.zeros(10)
    hwf = (H, W, FOCAL)
    target = jnp.zeros((H, W, cfg.feature_dim))
    red = lambda o: jax.tree.map(lambda x: jnp.sum(x.astype(jnp.float32)), o)

    # --- per-iteration pieces of the refinement step ---
    fwd = jax.jit(lambda sh: red(render_feature_image(
        model, variables, pose.at[:, 3].add(sh), hist, hwf, NEAR, FAR,
        rcfg)))
    timeit("forward render_feature_image", lambda: fwd(jnp.zeros(3)))

    def loss(sh):
        _, fused = render_feature_image(model, variables,
                                        pose.at[:, 3].add(sh), hist, hwf,
                                        NEAR, FAR, rcfg)
        return feature_cosine_loss(fused, target)
    g = jax.jit(jax.grad(loss))
    timeit("fwd+bwd (pose grad)", lambda: g(jnp.zeros(3)))

    from nefes_tpu.render.renderer import render_image
    r = jax.jit(lambda sh: red(render_image(
        model.coarse_fn, model.fine_fn, params, params, H, W, FOCAL,
        pose.at[:, 3].add(sh), NEAR, FAR, rcfg)))
    timeit("render only fwd", lambda: r(jnp.zeros(3)))

    ws_vec = jnp.asarray([1.0, 1.0, 0.0, 0.0, 0.0])
    rfc = RefineConfig(opt_iter=50, lr_r=0.0087, lr_t=0.01)
    timeit("50-iter refine scan", lambda: refine_pose_single(
        model, variables, pose, target, hist, ws_vec, hwf, NEAR, FAR,
        rcfg, rfc)[1], n=3)

    # --- components at render shapes ---
    R_, N_FINE = H * W, H * W * 128
    key = jax.random.key(1)
    xyz_f = jax.random.normal(key, (N_FINE, 3))
    dir_f = jax.random.normal(key, (N_FINE, 3))
    fe = jax.jit(lambda p, x, d: model.fine_fn(
        p, embed(x, cfg.xyz_embed), embed(d, cfg.dir_embed), False, False))
    timeit("embed+fine MLP 614k", lambda: fe(params, xyz_f, dir_f))

    z = stratified_samples(None, R_, 64, 0.0, 4.0, perturb=False)
    wgt = jax.random.uniform(key, (R_, 64))
    sp = jax.jit(lambda zz, ww: sample_pdf(
        None, 0.5 * (zz[..., 1:] + zz[..., :-1]), ww[..., 1:-1], 64,
        det=True))
    timeit("sample_pdf RxS->64", lambda: sp(z, wgt))

    zs = jnp.sort(jnp.concatenate([z, z + 0.01], -1), -1)
    raw = {"static_rgb": jax.random.uniform(key, (R_, 128, 3)),
           "static_feat": jax.random.normal(key, (R_, 128, 128)),
           "static_sigma": jax.random.uniform(key, (R_, 128))}
    comp = jax.jit(lambda rr, zz: composite(rr, zz)["rgb"])
    timeit("composite Rx128 (131ch)", lambda: comp(raw, zs))


# --------------------------------------------------------------------------
# kernel: Pallas fused-field parity + timing (ex kernel_probe/kernel_sweep)
# --------------------------------------------------------------------------

def cmd_kernel(args):
    from nefes_tpu.fields.embedder import embed
    from nefes_tpu.kernels.fused_field import (
        FieldSpec, fused_field_apply, pack_params,
    )
    from nefes_tpu.train import ModelConfig, NeFeSModel

    print("device:", jax.devices()[0], flush=True)
    N = H * W * 128  # fine pass of one H/4 7-Scenes render
    cfg32 = ModelConfig(dtype=jnp.float32)
    cfg16 = ModelConfig(dtype=jnp.bfloat16)
    m32, m16 = NeFeSModel(cfg32), NeFeSModel(cfg16)
    params = m32.init_variables(jax.random.key(0))["params"]
    spec = FieldSpec.from_model(cfg16, "fine", dtype="bfloat16")
    weights = pack_params(params["fine"], spec)

    k1, k2 = jax.random.split(jax.random.key(1))
    pts = jax.random.normal(k1, (N, 3))
    dirs = jax.random.normal(k2, (N, 3))

    flax32 = jax.jit(lambda p, x, d: m32.fine_fn(
        p, embed(x, cfg32.xyz_embed), embed(d, cfg32.dir_embed),
        False, False))
    flax16 = jax.jit(lambda p, x, d: m16.fine_fn(
        p, embed(x, cfg16.xyz_embed), embed(d, cfg16.dir_embed),
        False, False))
    kern = jax.jit(lambda w, x, d: fused_field_apply(
        spec, w, x, d, sigma_only=False, output_transient=False))
    # timed variants reduce to ONE scalar on device — fetching the raw
    # (614k, 131) outputs over the axon tunnel costs seconds and would
    # measure transfer, not compute
    red = lambda o: sum(jnp.sum(x.astype(jnp.float32))
                        for x in jax.tree.leaves(o))
    flax16_t = jax.jit(lambda p, x, d: red(m16.fine_fn(
        p, embed(x, cfg16.xyz_embed), embed(d, cfg16.dir_embed),
        False, False)))
    kern_t = jax.jit(lambda w, x, d: red(fused_field_apply(
        spec, w, x, d, sigma_only=False, output_transient=False)))

    # --- three-way parity: kernel-bf16 must sit within the flax-bf16
    # band around the f32 oracle ---
    o32 = flax32(params, pts, dirs)
    o16 = flax16(params, pts, dirs)
    ok = kern(weights, pts, dirs)
    for key_ in ("static_sigma", "static_rgb", "static_feat"):
        a = np.asarray(o32[key_], np.float32)
        e_flax = np.abs(np.asarray(o16[key_], np.float32) - a).max()
        e_kern = np.abs(np.asarray(ok[key_], np.float32) - a).max()
        print(f"{key_}: |flax16-f32|max={e_flax:.4g} "
              f"|kern16-f32|max={e_kern:.4g}", flush=True)

    results = {}
    results["flax_fwd_ms"] = timeit(
        "flax bf16 fwd", lambda: flax16_t(params, pts, dirs)) * 1e3
    results["kern_fwd_ms"] = timeit(
        "kernel fwd", lambda: kern_t(weights, pts, dirs)) * 1e3

    def loss_flax(p, x, d):
        o = flax16(p, x, d)
        return (jnp.sum(o["static_rgb"]) + jnp.sum(o["static_sigma"])
                + 1e-3 * jnp.sum(o["static_feat"]))

    def loss_kern(w, x, d):
        o = kern(w, x, d)
        return (jnp.sum(o["static_rgb"]) + jnp.sum(o["static_sigma"])
                + 1e-3 * jnp.sum(o["static_feat"]))

    gf = jax.jit(lambda p, x, d: red(
        jax.grad(loss_flax, argnums=(1,))(p, x, d)))
    gk = jax.jit(lambda w, x, d: red(
        jax.grad(loss_kern, argnums=(1,))(w, x, d)))
    results["flax_fwdbwd_ms"] = timeit(
        "flax bf16 fwd+bwd(dx)", lambda: gf(params, pts, dirs)) * 1e3
    results["kern_fwdbwd_ms"] = timeit(
        "kernel fwd+bwd(dx)", lambda: gk(weights, pts, dirs)) * 1e3

    if args.sweep:
        for tile in (512, 1024, 2048, 4096):
            sp_t = FieldSpec.from_model(cfg16, "fine", dtype="bfloat16",
                                        tile=tile)
            w_t = pack_params(params["fine"], sp_t)
            kt = jax.jit(lambda w, x, d, sp_t=sp_t: fused_field_apply(
                sp_t, w, x, d, sigma_only=False, output_transient=False))
            timeit(f"kernel fwd tile={tile}", lambda: kt(w_t, pts, dirs))

    # ---- composite-fused render kernel (kernels/fused_render.py) vs the
    # unfused fine pass + XLA compositor at the refinement shape ----
    from nefes_tpu.kernels.fused_render import fused_render_apply
    from nefes_tpu.render.compositor import composite

    R, S = H * W, 128
    k3, k4 = jax.random.split(jax.random.key(2))
    rays_o = jax.random.normal(k3, (R, 3)) * 0.1
    rays_d = jax.random.normal(k4, (R, 3)) + jnp.asarray([0., 0., -1.])
    viewdirs = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    z = jnp.sort(jax.random.uniform(k3, (R, S), minval=0.3, maxval=4.0),
                 axis=-1)
    pts3 = rays_o[:, None, :] + rays_d[:, None, :] * z[..., None]

    def unfused(pts3, vd, z):
        xe = embed(pts3, cfg16.xyz_embed)
        de = embed(jnp.broadcast_to(vd[:, None, :], pts3.shape),
                   cfg16.dir_embed)
        raw = m16.fine_fn(params, xe, de, False, False)
        return composite(raw, z, output_transient=False, test_time=True)

    uf = jax.jit(lambda p3, vd, zz: unfused(p3, vd, zz)["rgb"])
    fr = jax.jit(lambda p3, vd, zz: fused_render_apply(
        spec, weights, p3, vd, zz)["rgb"])
    results["unfused_fine_composite_fwd_ms"] = timeit(
        "unfused fine+composite fwd", lambda: uf(pts3, viewdirs, z)) * 1e3
    results["fused_render_fwd_ms"] = timeit(
        "fused render fwd", lambda: fr(pts3, viewdirs, z)) * 1e3

    def loss_uf(p3, vd, zz):
        o = unfused(p3, vd, zz)
        return jnp.sum(o["rgb"]) + 1e-3 * jnp.sum(o["feat"])

    def loss_fr(p3, vd, zz):
        o = fused_render_apply(spec, weights, p3, vd, zz)
        return jnp.sum(o["rgb"]) + 1e-3 * jnp.sum(o["feat"])

    guf = jax.jit(lambda p3, vd, zz: red(
        jax.grad(loss_uf, argnums=(0, 2))(p3, vd, zz)))
    gfr = jax.jit(lambda p3, vd, zz: red(
        jax.grad(loss_fr, argnums=(0, 2))(p3, vd, zz)))
    results["unfused_fine_composite_fwdbwd_ms"] = timeit(
        "unfused fine+composite fwd+bwd",
        lambda: guf(pts3, viewdirs, z)) * 1e3
    results["fused_render_fwdbwd_ms"] = timeit(
        "fused render fwd+bwd", lambda: gfr(pts3, viewdirs, z)) * 1e3
    # numerics sanity on real hardware
    a = np.asarray(uf(pts3, viewdirs, z))
    b = np.asarray(fr(pts3, viewdirs, z))
    results["fused_render_rgb_maxerr"] = float(np.abs(a - b).max())
    print(json.dumps(results))


# --------------------------------------------------------------------------
# mode2: f32 vs bf16 APR tower A/B (ex probe_mode2_bf16.py)
# --------------------------------------------------------------------------

def cmd_mode2(args):
    from nefes_tpu.data.synthetic import look_at_pose
    from nefes_tpu.features.dfnet import DFNet, extract_target_features
    from nefes_tpu.refine import RefineConfig, refine_apr_single
    from nefes_tpu.train import ModelConfig, NeFeSModel

    FULL_H, FULL_W = 240, 320
    cfg = ModelConfig(dtype=jnp.bfloat16)
    model = NeFeSModel(cfg)
    variables = model.init_variables(jax.random.key(0))
    rcfg = cfg.render_config(n_samples=64, n_importance=64,
                             output_transient=False, test_time=True,
                             perturb=False, remat=False)
    rfc = RefineConfig(opt_iter=50)
    img = jax.random.uniform(jax.random.key(3), (FULL_H, FULL_W, 3))
    hist = jnp.zeros(10)
    ws_vec = jnp.asarray([1.0, 1.0, 0.0, 0.0, 0.0])

    for name, dt in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        dfnet = DFNet(output_dim=cfg.feature_dim, dtype=dt)
        dfvars = dfnet.init(jax.random.key(1), img[None],
                            upsample_hw=(FULL_H, FULL_W))
        tgt = jax.lax.stop_gradient(extract_target_features(
            dfnet, dfvars, img[None], FULL_H, FULL_W)[0])

        def run(im):
            return refine_apr_single(
                model, variables, dfnet, dfvars, im, tgt, hist, ws_vec,
                (H, W, FOCAL), (FULL_H, FULL_W, FOCAL * 4), NEAR, FAR,
                rcfg, rfc, svd_reg=True)

        dtm = timeit(f"mode-2 50-iter scan ({name})",
                     lambda: run(img)["losses"], n=3)
        out = run(img)
        print(f"  {name}: {dtm:.3f} s/frame, final loss "
              f"{float(np.asarray(out['losses'])[-1]):.5f}", flush=True)


# --------------------------------------------------------------------------
# accuracy: the HEADLINE pipeline gate (VERDICT r2 item 1)
# --------------------------------------------------------------------------

def cmd_accuracy(args):
    """End-to-end accuracy evidence for the PAPER-HEADLINE configuration,
    no external data: full 3-stage NeFeS training (color -> color+feature
    -> +fusion patch steps, the EPOCH_TO_FUSION transition of
    run_nefes.py:34-40) against a real frozen DFNet feature extractor,
    a DFNet APR trained on the train split, then MODE-2 APR-weight
    refinement with the verification fail-safe
    (DFM_APR_refine.py:158-277) — the run_nefes.py:34-40 +
    test_refinement.py pipeline in miniature. Writes ACCURACY_r03.json.

    Pretrained paper checkpoints/datasets don't ship in this
    environment, so the DFNet is randomly initialised (still the real
    VGG16-hypercolumn tower) and the scene is synthetic; every pipeline
    stage, loss, and fail-safe is the shipped implementation.
    """
    from nefes_tpu.data.synthetic import make_synthetic_scene
    from nefes_tpu.evaluation.metrics import pose_errors
    from nefes_tpu.features.dfnet import DFNet, extract_target_features
    from nefes_tpu.refine import (
        RefineConfig, apply_verification, refine_apr_batch,
    )
    from nefes_tpu.refine.losses import feature_cosine_loss
    from nefes_tpu.refine.pose_opt import render_feature_image
    from nefes_tpu.train import (
        ModelConfig, NeFeSModel, create_train_state, lr_for_epoch,
        make_optimizer, train_step_patch, train_step_rays,
    )
    import optax

    import pickle

    t_start = time.time()
    HH, WW = args.image_h, args.image_w            # >=128x96 (VERDICT)
    TINY = 4
    h, w = HH // TINY, WW // TINY
    N_TRAIN, N_TEST = args.n_train, 8
    cache = args.cache
    cached = None
    if cache and os.path.exists(cache):
        with open(cache, "rb") as f:
            cached = pickle.load(f)
        print(f"loaded trained state from {cache}", flush=True)

    scene = make_synthetic_scene(n_views=N_TRAIN + N_TEST, H=HH, W=WW,
                                 focal=1.15 * WW)
    idx = np.arange(N_TRAIN + N_TEST)
    step = (N_TRAIN + N_TEST) // N_TEST
    test_idx = idx[2::step][:N_TEST]
    train_idx = np.setdiff1d(idx, test_idx)[:N_TRAIN]

    cfg = ModelConfig(depth=8, width=128, feature_dim=128,
                      dtype=jnp.bfloat16)    # the paper architecture
    model = NeFeSModel(cfg)
    tx = make_optimizer()
    state = create_train_state(model, jax.random.key(0), tx)
    rcfg = cfg.render_config(n_samples=64, n_importance=64)
    hwf = (h, w, float(scene.focal) / TINY)
    full_hwf = (HH, WW, float(scene.focal))

    # frozen DFNet feature extractor (the real tower; random init)
    dfnet = DFNet(output_dim=cfg.feature_dim, dtype=jnp.bfloat16)
    dfvars = dfnet.init(jax.random.key(1),
                        jnp.zeros((1, HH, WW, 3)), upsample_hw=(h, w))

    from nefes_tpu.utils.image import resize_bilinear
    imgs_small = np.asarray(resize_bilinear(jnp.asarray(scene.images),
                                            h, w))
    feats = np.concatenate([
        np.asarray(extract_target_features(
            dfnet, dfvars, jnp.asarray(scene.images[i:i + 8]), h, w))
        for i in range(0, len(scene.images), 8)])

    # ---- 3-stage NeFeS training (the run_nefes.py schedule) ----
    B = 4
    rng = jax.random.key(2)
    if cached is None:
        order = np.random.default_rng(0)
        stage_epochs = ((0, args.epochs_color), (1, args.epochs_feat),
                        (2, args.epochs_fusion))
        ep_global = 0
        for stage, n_ep in stage_epochs:
            for _ in range(n_ep):
                lr = jnp.asarray(lr_for_epoch(ep_global, 5e-4, 0.5))
                perm = order.permutation(train_idx)
                for i in range(0, N_TRAIN - B + 1, B):
                    sel = perm[i:i + B]
                    batch = {"rgb": jnp.asarray(imgs_small[sel]),
                             "poses": jnp.asarray(scene.poses[sel]),
                             "hists": jnp.asarray(scene.hists[sel])}
                    if stage >= 1:
                        batch["feat"] = jnp.asarray(feats[sel])
                    rng, k = jax.random.split(rng)
                    if stage == 2:
                        state, loss, aux = train_step_patch(
                            model, rcfg, tx, state, batch, k, lr, hwf,
                            scene.near, scene.far)
                    else:
                        state, loss, aux = train_step_rays(
                            model, rcfg, tx, state, batch, k, lr, hwf,
                            scene.near, scene.far,
                            n_rand=min(1024, h * w), stage=stage)
                if ep_global % 25 == 0:
                    parts = " ".join(f"{k}={float(v):.4f}"
                                     for k, v in aux.items()
                                     if k != "psnr")
                    print(f"epoch {ep_global} stage={stage} "
                          f"loss={float(loss):.4f} "
                          f"psnr={float(aux['psnr']):.2f} {parts}",
                          flush=True)
                ep_global += 1
        train_psnr = float(aux["psnr"])
        if cache:
            with open(cache, "wb") as f:
                pickle.dump(
                    {"variables": jax.tree.map(np.asarray,
                                               state.variables),
                     "train_psnr": train_psnr}, f)
            print(f"saved trained field to {cache}", flush=True)
    else:
        state = state.replace(variables=jax.tree.map(
            jnp.asarray, cached["variables"]))
        train_psnr = cached["train_psnr"]

    # ---- fusion-vs-no-fusion feature quality on TEST views ----
    tcfg = rcfg.test()
    cos_fused, cos_raw = [], []
    for i in test_idx:
        rgb_img, fused = render_feature_image(
            model, state.variables, jnp.asarray(scene.poses[i]),
            jnp.asarray(scene.hists[i]), hwf, scene.near, scene.far, tcfg)
        from nefes_tpu.render.renderer import render_image
        raw = render_image(model.coarse_fn, model.fine_fn,
                           state.params, state.params, h, w,
                           hwf[2], jnp.asarray(scene.poses[i]),
                           scene.near, scene.far, tcfg)["feat"]
        tgt = jnp.asarray(feats[i])
        cos_fused.append(float(feature_cosine_loss(fused, tgt,
                                                   per_pixel=True)))
        cos_raw.append(float(feature_cosine_loss(raw, tgt,
                                                 per_pixel=True)))

    # ---- DFM feature finetuning (the reference's DFNet recipe: the
    # feature space is TRAINED so renders and real images match —
    # feature/misc.py render_nerfw_imgs + triplet/cosine losses over
    # rendered views). Only the adaptation blocks train (adapt_*), so
    # the VGG trunk and hence the pose head stay untouched; negatives
    # (features vs OTHER views' renders) keep the space discriminative
    # instead of collapsing onto the matching objective. ----
    if args.feat_steps > 0:
        from nefes_tpu.geometry.se3 import learn_pose
        from nefes_tpu.refine.losses import feature_cosine_loss as fcl
        from nefes_tpu.utils.image import resize_bicubic as _rb

        def render_up_at(pose34, hist):
            _, fused = render_feature_image(
                model, state.variables, jnp.asarray(pose34),
                jnp.asarray(hist), hwf, scene.near, scene.far, tcfg)
            return np.asarray(_rb(fused[None], HH, WW)[0])

        # positives: renders at the GT poses. negatives: renders at
        # POSE-PERTURBED views at the APR error scale (~5 cm / 2 deg) —
        # the feature space must distinguish the query view from nearby
        # wrong poses (a local basin), not from other scene views
        # (reference pose_perturbation, feature/misc.py:594-677)
        rng_np = np.random.default_rng(7)
        renders_up, renders_neg = [], []
        for i in train_idx:
            renders_up.append(render_up_at(scene.poses[i],
                                           scene.hists[i]))
            dr = rng_np.normal(0, np.deg2rad(2.0) / 1.7, 3)
            dt = rng_np.normal(0, 0.05 / 1.7, 3)
            pert = np.asarray(learn_pose(
                jnp.asarray(dr, jnp.float32), jnp.asarray(dt, jnp.float32),
                jnp.asarray(scene.poses[i])))[:3, :4]
            renders_neg.append(render_up_at(pert, scene.hists[i]))
        renders_up = jnp.asarray(np.stack(renders_up))   # (Nt, HH, WW, C)
        renders_neg = jnp.asarray(np.stack(renders_neg))
        imgs_full_tr = jnp.asarray(scene.images[train_idx])

        adapt_keys = [k for k in dfvars["params"] if k.startswith("adapt")]
        ft_tx = optax.adam(args.feat_lr)
        ft_params = {k: dfvars["params"][k] for k in adapt_keys}
        ft_opt = ft_tx.init(ft_params)
        frozen = {k: v for k, v in dfvars["params"].items()
                  if k not in adapt_keys}

        # big arrays MUST be jit arguments, not closure captures —
        # captured constants are baked into the compile payload and the
        # remote-compile relay rejects >~100 MB requests (HTTP 413)
        @jax.jit
        def ft_step(ft_params, ft_opt, frozen, bstats, imgs_b, r_pos,
                    r_neg):
            def lf(fp):
                v = {"params": {**frozen, **fp}, "batch_stats": bstats}
                f = extract_target_features(dfnet, v, imgs_b, HH, WW)
                pos = jax.vmap(fcl)(f, r_pos).mean()
                neg = jax.vmap(fcl)(f, r_neg).mean()
                return pos + jnp.maximum(0.0, 0.3 + pos - neg)
            l, g = jax.value_and_grad(lf)(ft_params)
            up, ft_opt = ft_tx.update(g, ft_opt, ft_params)
            return optax.apply_updates(ft_params, up), ft_opt, l

        n_tr = len(train_idx)
        for step in range(args.feat_steps):
            rng, k1 = jax.random.split(rng)
            sel = jax.random.randint(k1, (4,), 0, n_tr)
            ft_params, ft_opt, ft_l = ft_step(
                ft_params, ft_opt, frozen, dfvars["batch_stats"],
                imgs_full_tr[sel], renders_up[sel], renders_neg[sel])
            if step % 50 == 0:
                print(f"feat-ft step {step} loss={float(ft_l):.4f}",
                      flush=True)
        dfvars = {"params": {**frozen, **ft_params},
                  "batch_stats": dfvars["batch_stats"]}

    # ---- DFNet APR trained on the train split ----
    apr = DFNet(output_dim=cfg.feature_dim, dtype=jnp.bfloat16)
    apr_vars = apr.init(jax.random.key(3), jnp.zeros((1, HH, WW, 3)),
                        upsample_hw=(HH, WW))
    # AdamW + photometric augmentation: without them the APR overfits the
    # train split to ~1e-5 loss — a razor-sharp minimum whose pose output
    # is chaotic under the small weight steps mode-2 refinement applies
    apr_tx = optax.adamw(optax.cosine_decay_schedule(
        args.apr_lr, args.apr_steps, alpha=0.02), weight_decay=1e-4)
    apr_opt = apr_tx.init(apr_vars["params"])
    gt12 = jnp.asarray(scene.poses.reshape(-1, 12))
    imgs_full = jnp.asarray(scene.images)

    @jax.jit
    def apr_step(p, opt, sel, key):
        def lf(p):
            v = {"params": p, "batch_stats": apr_vars["batch_stats"]}
            kb, kn = jax.random.split(key)
            # brightness/noise jitter (the reference trains its APRs with
            # ColorJitter, dataset_loaders/cambridge_scenes.py:263-264)
            scale = jax.random.uniform(kb, (sel.shape[0], 1, 1, 1),
                                       minval=0.92, maxval=1.08)
            imgs = jnp.clip(imgs_full[sel] * scale
                            + 0.005 * jax.random.normal(
                                kn, imgs_full[sel].shape), 0.0, 1.0)
            _, pose12 = apr.apply(v, imgs, return_feature=False,
                                  return_pose=True)
            return jnp.mean((pose12 - gt12[sel]) ** 2)
        l, g = jax.value_and_grad(lf)(p)
        up, opt = apr_tx.update(g, opt, p)
        return optax.apply_updates(p, up), opt, l

    apr_params = apr_vars["params"]
    tr = jnp.asarray(train_idx)
    for step in range(args.apr_steps):
        rng, k = jax.random.split(rng)
        sel = jax.random.choice(k, tr, (8,), replace=False)
        apr_params, apr_opt, apr_loss = apr_step(apr_params, apr_opt,
                                                 sel, k)
        if step % 100 == 0:
            print(f"apr step {step} loss={float(apr_loss):.5f}",
                  flush=True)
    apr_vars = {"params": apr_params,
                "batch_stats": apr_vars["batch_stats"]}

    # ---- MODE-2 refinement with verification (the headline) ----
    test_imgs = jnp.asarray(scene.images[test_idx])
    test_hists = jnp.asarray(scene.hists[test_idx])
    targets = jax.lax.stop_gradient(extract_target_features(
        dfnet, dfvars, test_imgs, HH, WW))

    # DFM landscape diagnostic: the refiner can only work if the loss it
    # descends is lower at the GT pose than at the APR estimate. Report
    # the median loss at both poses, fused and raw — separates "field/
    # fusion can't guide" failures from optimiser failures.
    from nefes_tpu.refine.losses import feature_cosine_loss
    from nefes_tpu.render.renderer import render_image as _ri
    from nefes_tpu.utils.image import resize_bicubic

    def dfm_losses_at(pose34, i):
        rgb_img, fused = render_feature_image(
            model, state.variables, jnp.asarray(pose34), test_hists[i],
            hwf, scene.near, scene.far, tcfg)
        raw = _ri(model.coarse_fn, model.fine_fn, state.params,
                  state.params, h, w, hwf[2], jnp.asarray(pose34),
                  scene.near, scene.far, tcfg)["feat"]
        out = []
        for f in (fused, raw):
            up = resize_bicubic(f[None], HH, WW)[0]
            out.append(float(feature_cosine_loss(
                up[10:-10, 10:-10], targets[i][10:-10, 10:-10])))
        return out

    apr_poses0 = []
    for i in range(N_TEST):
        from nefes_tpu.refine.apr_opt import apr_pose
        apr_poses0.append(np.asarray(apr_pose(
            apr, apr_vars, test_imgs[i], svd_reg=True)))
    at_init = np.array([dfm_losses_at(apr_poses0[i], i)
                        for i in range(N_TEST)])
    at_gt = np.array([dfm_losses_at(scene.poses[test_idx[i]], i)
                      for i in range(N_TEST)])
    landscape = {
        "dfm_loss_at_init_fused": float(np.median(at_init[:, 0])),
        "dfm_loss_at_gt_fused": float(np.median(at_gt[:, 0])),
        "dfm_loss_at_init_raw": float(np.median(at_init[:, 1])),
        "dfm_loss_at_gt_raw": float(np.median(at_gt[:, 1])),
    }
    print("DFM landscape:", json.dumps(landscape), flush=True)
    ws_vec = jnp.asarray([1.0, 1.0, 0.0, 0.0, 0.0])
    gt = scene.poses[test_idx]

    # refinement runs in f32 end to end (the reference pins f32 for the
    # refinement forward, DFM_pose_refine.py:131 — against a shallow DFM
    # basin, bf16 loss noise is material); the trained f32 params apply
    # unchanged under f32 modules
    from dataclasses import replace as dc_replace
    model_r = NeFeSModel(dc_replace(cfg, dtype=jnp.float32))
    apr_r = DFNet(output_dim=cfg.feature_dim, dtype=jnp.float32)
    tcfg_r = model_r.cfg.render_config(
        n_samples=64, n_importance=64, output_transient=False,
        perturb=False).test()

    def run_refine(lr, iters, per_pixel=False):
        rfc = RefineConfig(opt_iter=iters, learning_rate=lr,
                           per_pixel=per_pixel)
        out = refine_apr_batch(model_r, state.variables, apr_r, apr_vars,
                               test_imgs, targets, test_hists, ws_vec,
                               hwf, full_hwf, scene.near, scene.far,
                               tcfg_r, rfc, svd_reg=True)
        verified = np.asarray(apply_verification(out))
        refined = np.asarray(out["refined_pose"])
        init_poses = np.asarray(out["initial_pose"])
        e_init = pose_errors(init_poses, gt)
        e_ver = pose_errors(verified, gt)
        return {"lr": lr, "iters": iters, "per_pixel": per_pixel,
                "out": out, "verified": verified, "refined": refined,
                "init_poses": init_poses, "err_init": e_init,
                "err_ver": e_ver,
                "median_t": float(np.median(e_ver[:, 0])),
                "median_r": float(np.median(e_ver[:, 1]))}

    configs = [(lr, args.opt_iter, False) for lr in args.refine_lrs]
    if args.sweep_refine:
        configs += [(2e-6, 150, False),
                    (1e-5, 50, True), (7e-6, 50, True), (5e-6, 50, True),
                    (5e-6, 100, True), (3e-6, 100, True)]
    if args.sweep_small:
        # per-pixel DFM at the given lrs (the measured-best family)
        configs = [(lr, args.opt_iter, True) for lr in args.refine_lrs] \
            + [(2e-6, 150, False)]
    runs = [run_refine(*c) for c in configs]
    for r in runs:
        print(f"refine lr={r['lr']} iters={r['iters']} "
              f"pp={r['per_pixel']}: median {r['median_t']:.4f} m / "
              f"{r['median_r']:.3f} deg "
              f"(init {np.median(r['err_init'][:, 0]):.4f} m / "
              f"{np.median(r['err_init'][:, 1]):.3f} deg)", flush=True)
    best = min(runs, key=lambda r: r["median_t"])
    out, verified = best["out"], best["verified"]
    refined, init_poses = best["refined"], best["init_poses"]
    err_init, err_ver = best["err_init"], best["err_ver"]
    err_ref = pose_errors(refined, gt)
    retreats = int(np.sum(np.any(verified != refined, axis=(1, 2))))

    # ---- mode-3 (SE(3)-delta) evidence on the same field/frames (the
    # r02 harness's mode, kept regenerable after the probe consolidation;
    # reference DFM_post_processing2, DFM_pose_refine.py:350-452) ----
    from nefes_tpu.refine import refine_poses_batch
    targets_rs = jax.lax.stop_gradient(extract_target_features(
        dfnet, dfvars, test_imgs, h, w))
    m3_out, _ = refine_poses_batch(
        model_r, state.variables, jnp.asarray(np.stack(apr_poses0)),
        targets_rs, test_hists, scene.world, hwf, tcfg_r,
        RefineConfig(opt_iter=args.opt_iter, lr_r=0.004, lr_t=0.01,
                     per_pixel=best["per_pixel"]))
    err_m3 = pose_errors(np.asarray(m3_out), gt)
    mode3 = {
        "mode3_median_t_after_m": float(np.median(err_m3[:, 0])),
        "mode3_median_r_after_deg": float(np.median(err_m3[:, 1])),
        "mode3_improved_frames_frac": float(np.mean(
            err_m3[:, 0] < np.array([pose_errors(
                apr_poses0[i][None], gt[i:i + 1])[0, 0]
                for i in range(N_TEST)]))),
    }
    print("mode-3:", json.dumps(mode3), flush=True)

    result = {
        "pipeline": "3-stage train -> DFNet APR -> mode-2 + verification",
        "image_hw": [HH, WW], "n_train_views": int(N_TRAIN),
        "field": "D8/W128/F128 bf16",
        "opt_iter": best["iters"], "frames": int(N_TEST),
        "per_pixel_dfm": best["per_pixel"],
        "train_psnr_db": round(train_psnr, 2),
        "refine_lr": best["lr"],
        "feat_cos_loss_fused_renderscale": round(float(np.mean(cos_fused)),
                                                 4),
        "feat_cos_loss_raw_renderscale": round(float(np.mean(cos_raw)), 4),
        # the comparison that matters is at the DFM operating point:
        # full-res bicubic-upsampled features vs full-res DFNet targets
        # (the landscape medians below) — fusion recovers detail the raw
        # upsampled features lack
        "fusion_beats_raw_at_dfm_scale": bool(
            landscape["dfm_loss_at_init_fused"]
            < landscape["dfm_loss_at_init_raw"]),
        "median_t_before_m": float(np.median(err_init[:, 0])),
        "median_t_after_m": float(np.median(err_ver[:, 0])),
        "median_r_before_deg": float(np.median(err_init[:, 1])),
        "median_r_after_deg": float(np.median(err_ver[:, 1])),
        "median_t_after_no_verif_m": float(np.median(err_ref[:, 0])),
        "median_r_after_no_verif_deg": float(np.median(err_ref[:, 1])),
        "retreat_frames": retreats,
        "frames_worse_after_verification": int(np.sum(
            err_ver[:, 0] > err_init[:, 0] + 1e-9)),
        "improved_frames_frac": float(np.mean(
            err_ver[:, 0] < err_init[:, 0])),
        **mode3,
        **landscape,
        "wall_s": round(time.time() - t_start, 1),
        "device": str(jax.devices()[0]),
    }
    result["t_improvement_x"] = round(
        result["median_t_before_m"]
        / max(result["median_t_after_m"], 1e-9), 2)
    result["r_improvement_x"] = round(
        result["median_r_before_deg"]
        / max(result["median_r_after_deg"], 1e-9), 2)
    print(json.dumps(result, indent=1))
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)
    sub.add_parser("perf")
    pk = sub.add_parser("kernel")
    pk.add_argument("--sweep", action="store_true")
    sub.add_parser("mode2")
    pa = sub.add_parser("accuracy")
    pa.add_argument("--image_h", type=int, default=96)
    pa.add_argument("--image_w", type=int, default=128)
    pa.add_argument("--n_train", type=int, default=40)
    pa.add_argument("--epochs_color", type=int, default=120)
    pa.add_argument("--epochs_feat", type=int, default=100)
    pa.add_argument("--epochs_fusion", type=int, default=200)
    pa.add_argument("--apr_steps", type=int, default=1500)
    pa.add_argument("--apr_lr", type=float, default=2e-4)
    # candidate mode-2 APR learning rates (reference default 1e-5,
    # dm/options.py:31; 1e-4 diverged — verification retreated every
    # frame); the harness reports the best by verified median
    pa.add_argument("--refine_lrs", type=float, nargs="+",
                    default=[1e-5, 5e-6, 2e-6])
    pa.add_argument("--opt_iter", type=int, default=50)
    pa.add_argument("--sweep_refine", action="store_true")
    pa.add_argument("--sweep_small", action="store_true")
    pa.add_argument("--feat_steps", type=int, default=300)
    pa.add_argument("--feat_lr", type=float, default=1e-4)
    pa.add_argument("--cache", default="",
                    help="pickle path to save/reuse the trained field+APR"
                         " (skips the ~15 min training when it exists)")
    pa.add_argument("--out", default="ACCURACY_r03.json")
    args = p.parse_args()
    {"perf": cmd_perf, "kernel": cmd_kernel, "mode2": cmd_mode2,
     "accuracy": cmd_accuracy}[args.cmd](args)


if __name__ == "__main__":
    main()
