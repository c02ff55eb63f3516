"""SceneData — the framework's dataset interface.

Replaces the reference's torch Dataset/DataLoader stack (dataset_loaders/)
with static numpy arrays: TPU training consumes whole-scene tensors resident
in host RAM, sliced per step and shipped once per batch (no worker
processes, no per-item __getitem__ — scenes here are a few GB max, and the
reference's Cambridge loader already preloads everything to RAM anyway,
cambridge_scenes.py:276-316).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from nefes_tpu.geometry.transforms import WorldSetup


@dataclass
class SceneData:
    """One split (train or test) of one scene."""

    images: np.ndarray | None      # (N, H, W, 3) float32 [0,1]; None if lazy
    poses: np.ndarray              # (N, 3, 4) c2w in field world frame
    hists: np.ndarray | None       # (N, hist_bin) luminance histograms
    hwf: tuple[int, int, float]    # (H, W, focal)
    near: float
    far: float
    world: WorldSetup
    masks: np.ndarray | None = None      # (N, Hm, Wm) semantic static masks
    image_paths: list = field(default_factory=list)
    raw_poses: np.ndarray | None = None  # dataset-frame poses pre-alignment
    depths: np.ndarray | None = None     # (N, H, W) DPT mono-depth targets
    pose_avg_stats: np.ndarray | None = None  # (3, 4) world-centering pose

    def __len__(self) -> int:
        return len(self.poses)

    @property
    def H(self) -> int:
        return self.hwf[0]

    @property
    def W(self) -> int:
        return self.hwf[1]

    @property
    def focal(self) -> float:
        return self.hwf[2]


def compute_histograms(images: np.ndarray, bins: int = 10) -> np.ndarray:
    from nefes_tpu.data.histograms import luminance_histogram
    return np.stack([luminance_histogram(img, bins) for img in images])
