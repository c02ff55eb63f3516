"""Device mesh + sharding rules — the framework's distributed backbone.

The reference's only multi-device path is a single-process
torch.nn.DataParallel wrapper (nerfh_nff.py:647-650; SURVEY.md §2.10).
TPU-native replacement: a jax.sharding Mesh with two logical axes

  "data"  — batch images (data parallelism; gradient all-reduce over ICI)
  "rays"  — rays within an image (the sequence-parallel analogue for
            neural rendering: compositing is per-ray, so ray sharding is
            embarrassingly parallel until the loss reduction)

Parameters are replicated (the whole NeFeS model is ~2M params — tensor
parallelism would be all overhead at W=128; the axes that matter are the
ray/batch axes, which XLA shards cleanly with zero collectives until the
final psum of the loss/grads).
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, data: int | None = None,
              rays: int | None = None) -> Mesh:
    """Build a (data, rays) mesh. Defaults: all devices on "data"."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None and rays is None:
        data, rays = n, 1
    elif data is None:
        data = n // rays
    elif rays is None:
        rays = n // data
    assert data * rays == n, (data, rays, n)
    arr = np.array(devices).reshape(data, rays)
    return Mesh(arr, axis_names=("data", "rays"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading batch dim over "data" (and leave rays local)."""
    return NamedSharding(mesh, P("data"))


def batch_ray_sharding(mesh: Mesh) -> NamedSharding:
    """(B, N_rays, ...) arrays: batch over "data", rays over "rays"."""
    return NamedSharding(mesh, P("data", "rays"))


def shard_batch(mesh: Mesh, batch: dict) -> dict:
    """Place a train batch dict: image-indexed leaves over "data"."""
    s = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)


def replicate(mesh: Mesh, tree):
    r = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, r), tree)
