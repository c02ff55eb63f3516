"""Orbax checkpointing — replaces the reference's torch.save .tar dicts
(run_nefes.py:375-385, reload at nerfh_nff.py:688-706).

Unlike the reference (which comments out optimizer-state reload), we
checkpoint the FULL train state (params + batch_stats + opt state + epoch)
so resume is exact."""

from __future__ import annotations

import os
from pathlib import Path

import jax
import numpy as np
import orbax.checkpoint as ocp

from nefes_tpu.train.trainer import TrainState


def save_checkpoint(ckpt_dir: str | Path, state: TrainState, epoch: int) -> str:
    ckpt_dir = Path(ckpt_dir).absolute()
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    path = ckpt_dir / f"epoch_{epoch:06d}"
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, jax.device_get(state), force=True)
    return str(path)


def latest_checkpoint(ckpt_dir: str | Path) -> str | None:
    ckpt_dir = Path(ckpt_dir)
    if not ckpt_dir.is_dir():
        return None
    cands = sorted(p for p in ckpt_dir.iterdir() if p.name.startswith("epoch_"))
    return str(cands[-1]) if cands else None


def restore_checkpoint(path: str | Path, template: TrainState) -> TrainState:
    """Restore into the structure of ``template`` (shapes must match)."""
    with ocp.PyTreeCheckpointer() as ckptr:
        restored = ckptr.restore(Path(path).absolute(),
                                 item=jax.device_get(template))
    return jax.tree.map(lambda t, r: np.asarray(r), template, restored)
