"""Training driver for the deep flow backends.

TPU-native replacement for codebase/RAFT/train.py:136-214 and
train_FlowFormer.py: a jitted, mesh-sharded train step (dp over 'data', tp
over 'model'), orbax checkpointing every ``val_freq`` steps with resume
(the reference torch.saves every VAL_FREQ=5000, :185-198; resume via
--restore_ckpt, :141-142), metric logging, and the staged curriculum
(chairs→things→sintel→kitti, train_standard.sh:3-6) expressed as a list of
stage configs.
"""

from __future__ import annotations

import dataclasses
import pathlib
import time
from typing import Callable, Iterable, Optional

import jax
import numpy as np


@dataclasses.dataclass
class StageConfig:
    """One curriculum stage (mirrors the reference's shell schedule)."""

    name: str = "chairs"
    num_steps: int = 100_000
    batch_size: int = 8
    lr: float = 4e-4
    image_size: tuple[int, int] = (368, 496)
    wdecay: float = 1e-4
    gamma: float = 0.8


class MetricLogger:
    """Running-mean metric printer (the reference's Logger,
    train.py:89-133, without the TensorBoard dependency; writes JSONL)."""

    def __init__(self, log_path: Optional[str] = None, sum_freq: int = 100):
        self.sum_freq = sum_freq
        self.running: dict[str, float] = {}
        self.count = 0
        self.step = 0
        self.log_path = pathlib.Path(log_path) if log_path else None
        if self.log_path:
            self.log_path.parent.mkdir(parents=True, exist_ok=True)
            self.log_path.write_text("")

    def push(self, metrics: dict):
        self.step += 1
        self.count += 1
        for k, v in metrics.items():
            self.running[k] = self.running.get(k, 0.0) + float(v)
        if self.step % self.sum_freq == 0:
            means = {k: v / self.count for k, v in self.running.items()}
            line = {"step": self.step, **{k: round(v, 5) for k, v in means.items()}}
            print(line)
            if self.log_path:
                import json

                with open(self.log_path, "a") as f:
                    f.write(json.dumps(line) + "\n")
            self.running = {}
            self.count = 0


def save_checkpoint(ckpt_dir: str | pathlib.Path, step: int, state) -> None:
    """Orbax checkpoint (replaces torch.save, train.py:185-187)."""
    import orbax.checkpoint as ocp

    path = pathlib.Path(ckpt_dir).absolute()
    with ocp.CheckpointManager(path) as mgr:
        mgr.save(step, args=ocp.args.StandardSave(state))
        mgr.wait_until_finished()


def restore_checkpoint(ckpt_dir: str | pathlib.Path, state):
    """Restore the latest checkpoint into the given abstract/real state
    (replaces --restore_ckpt, train.py:141-142).  Returns (state, step)."""
    import orbax.checkpoint as ocp

    path = pathlib.Path(ckpt_dir).absolute()
    with ocp.CheckpointManager(path) as mgr:
        step = mgr.latest_step()
        if step is None:
            return state, 0
        restored = mgr.restore(step, args=ocp.args.StandardRestore(state))
    return restored, step


def train_loop(
    train_step: Callable,
    state,
    batches: Iterable[dict],
    num_steps: int,
    logger: Optional[MetricLogger] = None,
    ckpt_dir: Optional[str] = None,
    val_freq: int = 5000,
    validate_fn: Optional[Callable] = None,
):
    """Generic step loop: batch in → jitted sharded step → metrics out.

    ``batches`` yields dicts with image1/image2/flow/valid already sharded
    (see nsof_tpu.parallel.train.make_train_step).
    """
    logger = logger or MetricLogger()
    t0 = time.perf_counter()
    for step, batch in enumerate(batches):
        if step >= num_steps:
            break
        state, metrics = train_step(state, batch)
        logger.push(jax.device_get(metrics))
        if ckpt_dir and (step + 1) % val_freq == 0:
            save_checkpoint(ckpt_dir, step + 1, jax.device_get(state))
            if validate_fn is not None:
                val = validate_fn(state)
                print({"step": step + 1, **val})
    wall = time.perf_counter() - t0
    if ckpt_dir:
        save_checkpoint(ckpt_dir, num_steps, jax.device_get(state))
    return state, {"wall_s": wall}


def validate_epe(apply_fn, params, pairs: Iterable[tuple]) -> dict:
    """EPE validation over (img1, img2, flow_gt) triples (the reference's
    validate_chairs/sintel EPE, codebase/RAFT/evaluate.py:21-60)."""
    epes = []
    for img1, img2, gt in pairs:
        pred = np.asarray(apply_fn(params, img1, img2))
        epes.append(
            float(np.sqrt(((pred - np.asarray(gt)) ** 2).sum(-1)).mean())
        )
    return {"epe": float(np.mean(epes)), "n": len(epes)}
