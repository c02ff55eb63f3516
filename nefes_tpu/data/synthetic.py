"""Procedural synthetic scene for dataset-free end-to-end tests.

The reference has no test data generator at all (SURVEY.md §4); tiny
analytic scenes let the full train → render → refine loop be exercised on
CPU in seconds. Ground-truth images are produced by volume-rendering an
analytic density/color field through the SAME compositor as the model —
so a trained field can in principle reach zero loss.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from nefes_tpu.data.scene import SceneData, compute_histograms
from nefes_tpu.geometry.transforms import WorldSetup
from nefes_tpu.fields.embedder import EmbedConfig
from nefes_tpu.render.renderer import RenderConfig, render_image

_BLOBS = np.array([  # (x, y, z, radius, r, g, b)
    [0.0, 0.0, 0.0, 0.45, 0.9, 0.2, 0.1],
    [0.6, 0.3, -0.2, 0.30, 0.1, 0.8, 0.3],
    [-0.5, -0.3, 0.3, 0.35, 0.2, 0.3, 0.9],
], dtype=np.float32)


def blob_field(params, xyz_emb, dir_emb=None, sigma_only=False,
               output_transient=False, texture_amp: float = 0.0,
               texture_freq: float = 1.0):
    """Analytic soft-blob field usable as a renderer FieldFn.

    texture_amp > 0 modulates the albedo with a band-limited procedural
    pattern (wavelengths ~0.2-0.5 world units, several pixels at the
    test camera geometry). Flat-shaded blobs give a VGG feature
    extractor almost nothing spatially — features go near-constant per
    region, which makes a constant FusionNet output a strong local
    optimum of the L1 fusion loss and leaves the DFM landscape flat.
    Real scenes (the reference's operating regime) are texture-rich;
    this keeps the synthetic stand-in in that regime.

    texture_freq scales the pattern's frequencies (and adds a second
    octave when > 1): at 1.0 the D8/W128/F128 paper field renders the
    resulting DFNet targets at the feature-noise floor (measured r5:
    feat-cos 0.003, leaving feature fusion nothing to add — the scene is
    then EASIER than the reference's operating regime, where rendered
    features are lossy); texture_freq 2-3 puts the feature head in the
    underfitting regime real scenes occupy."""
    xyz = xyz_emb[..., :3]
    blobs = jnp.asarray(_BLOBS)
    d = jnp.linalg.norm(xyz[..., None, :] - blobs[None, :, :3], axis=-1)
    occ = jax.nn.sigmoid((blobs[:, 3] - d) * 40.0)          # (..., K)
    sigma = 200.0 * occ.max(-1)
    out = {"static_sigma": sigma}
    if sigma_only:
        return out
    w = occ / jnp.clip(occ.sum(-1, keepdims=True), 1e-6)
    rgb = (w[..., None] * blobs[:, 4:7]).sum(-2)
    if texture_amp > 0.0:
        x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
        f = texture_freq
        tex = (0.55 * jnp.sin(13.0 * f * x + 2.0 * jnp.sin(5.0 * f * y))
               * jnp.sin(17.0 * f * y + 1.3)
               + 0.45 * jnp.sin(23.0 * f * z + 3.0 * jnp.sin(7.0 * f * x))
               * jnp.sin(29.0 * f * (x + y) + 0.7))
        if f > 1.0:
            # second octave: finer, phase-offset, half amplitude;
            # renormalized so texture_amp keeps the same dynamic range
            tex = (tex + 0.25 * (jnp.sin(31.0 * f * x + 1.1)
                                 * jnp.sin(37.0 * f * y + 2.3)
                                 + jnp.sin(41.0 * f * (y + z) + 0.4)
                                 * jnp.sin(43.0 * f * x + 1.9))) / 1.5
        rgb = rgb * (1.0 - texture_amp * 0.5 * (1.0 + tex[..., None]))
    out["static_rgb"] = rgb
    # synthetic "feature": 8-D positional signature with both smooth and
    # high-frequency components (the sharper bands give DFM refinement a
    # usable translation basin in tests)
    out["static_feat"] = jnp.concatenate(
        [jnp.sin(xyz * 3.0), jnp.sin(xyz * 9.0 + 0.5),
         occ.max(-1, keepdims=True), d.min(-1, keepdims=True)], axis=-1)
    return out


def look_at_pose(eye: np.ndarray, target: np.ndarray = np.zeros(3),
                 up: np.ndarray = np.array([0.0, 1.0, 0.0])) -> np.ndarray:
    """OpenGL c2w (3, 4): camera at eye, -z toward target."""
    fwd = target - eye
    fwd = fwd / np.linalg.norm(fwd)
    z = -fwd
    x = np.cross(up, z)
    x = x / np.linalg.norm(x)
    y = np.cross(z, x)
    return np.stack([x, y, z, eye], axis=1).astype(np.float32)


def make_synthetic_scene(n_views: int = 12, H: int = 24, W: int = 32,
                         focal: float = 30.0, radius: float = 2.5,
                         near: float = 0.5, far: float = 5.0,
                         seed: int = 0,
                         texture_amp: float = 0.0,
                         texture_freq: float = 1.0) -> SceneData:
    """Cameras on a jittered circle, GT images rendered from blob_field
    (texture_amp > 0 => procedurally textured albedo; texture_freq > 1
    adds finer octaves — see blob_field)."""
    rng = np.random.default_rng(seed)
    poses = []
    for i in range(n_views):
        ang = 2 * np.pi * i / n_views
        eye = np.array([radius * np.sin(ang),
                        0.4 + 0.2 * rng.standard_normal(),
                        radius * np.cos(ang)], dtype=np.float32)
        poses.append(look_at_pose(eye))
    poses = np.stack(poses)

    cfg = RenderConfig(n_samples=96, n_importance=0, perturb=False,
                       output_transient=False, test_time=True,
                       xyz_embed=EmbedConfig(num_freqs=1),
                       dir_embed=EmbedConfig(num_freqs=1))
    from functools import partial
    field = (partial(blob_field, texture_amp=texture_amp,
                     texture_freq=texture_freq)
             if texture_amp > 0.0 else blob_field)
    imgs = []
    for p in poses:
        out = render_image(field, None, None, None, H, W, focal,
                           jnp.asarray(p), near, far, cfg)
        imgs.append(np.asarray(out["rgb"]))
    images = np.clip(np.stack(imgs), 0.0, 1.0)

    ws = WorldSetup(near=near, far=far, pose_scale=1.0, pose_scale2=1.0,
                    move_all_cam_vec=(0.0, 0.0, 0.0))
    return SceneData(images=images, poses=poses,
                     hists=compute_histograms(images),
                     hwf=(H, W, focal), near=near, far=far, world=ws)


def render_gt_features(scene: SceneData, feature_dim: int = 8) -> np.ndarray:
    """Render per-view GT 'DFNet' features from the analytic field (stand-in
    for the frozen feature extractor in synthetic e2e tests)."""
    cfg = RenderConfig(n_samples=96, n_importance=0, perturb=False,
                       output_transient=False, test_time=True,
                       xyz_embed=EmbedConfig(num_freqs=1),
                       dir_embed=EmbedConfig(num_freqs=1))
    feats = []
    for p in scene.poses:
        out = render_image(blob_field, None, None, None, scene.H, scene.W,
                           scene.focal, jnp.asarray(p), scene.near,
                           scene.far, cfg)
        feats.append(np.asarray(out["feat"])[..., :feature_dim])
    return np.stack(feats)
