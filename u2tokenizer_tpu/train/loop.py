"""Training loop: SFT driver with sharded steps, checkpointing, logging.

The orchestration layer the reference delegates to HF Trainer
(src/train/train_stage1.py:411 u2Trainer.train). Epoch/step accounting,
metric logging (stdout + jsonl; wandb/tensorboard optional), periodic orbax
saves with auto-resume, and eval-time token accuracy
(compute_metrics parity, train_stage1.py:138-152).
"""

from __future__ import annotations

import json
import os
import sys
import time
from typing import Callable, Dict, Iterable, Optional

import jax
import numpy as np

from ..config import TrainConfig
from .checkpoint import CheckpointManager
from .sft import TrainState


def device_prefetch(batches, batch_shardings=None, depth: int = 2):
    """Overlap host->device transfer with compute: keep ``depth`` batches
    in flight on device ahead of the training step (device_put is async, so
    enqueueing the next transfer before consuming the current batch hides
    PCIe/DMA latency behind the step — the TPU analogue of the reference's
    DataLoader pin_memory+workers overlap)."""
    from collections import deque

    buf = deque()

    def put(batch):
        if batch_shardings is not None:
            return jax.device_put(batch,
                                  {k: batch_shardings[k] for k in batch})
        return jax.device_put(batch)

    for batch in batches:
        buf.append(put(batch))
        if len(buf) >= depth:
            yield buf.popleft()
    while buf:
        yield buf.popleft()


class MetricLogger:
    """stdout + metrics.jsonl; hooks for wandb/tensorboard if present."""

    def __init__(self, output_dir: str, use_wandb: bool = False,
                 wandb_project: Optional[str] = None,
                 wandb_run_name: Optional[str] = None):
        os.makedirs(output_dir, exist_ok=True)
        self._f = open(os.path.join(output_dir, "metrics.jsonl"), "a")
        self._wandb = None
        if use_wandb:
            try:
                import wandb

                self._wandb = wandb
                wandb.init(project=wandb_project, name=wandb_run_name)
            except Exception as e:  # wandb genuinely optional
                print(f"wandb unavailable ({e}); logging to jsonl only",
                      file=sys.stderr)

    def log(self, step: int, metrics: Dict[str, float]) -> None:
        record = {"step": step, **{k: float(v) for k, v in metrics.items()}}
        self._f.write(json.dumps(record) + "\n")
        self._f.flush()
        msg = " ".join(f"{k}={v:.5g}" for k, v in record.items() if k != "step")
        print(f"[step {step}] {msg}", flush=True)
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)

    def close(self):
        self._f.close()


def run_training(
    cfg: TrainConfig,
    state: TrainState,
    train_step: Callable,
    data_iter_fn: Callable[[int], Iterable[dict]],
    batch_shardings=None,
    steps_per_epoch: Optional[int] = None,
    eval_fn: Optional[Callable[[TrainState], Dict[str, float]]] = None,
    eval_steps: Optional[int] = None,
    logger: Optional[MetricLogger] = None,
) -> TrainState:
    """Run the SFT loop.

    data_iter_fn(epoch) -> iterable of host batches; they are device_put with
    batch_shardings. Auto-resumes from the latest checkpoint in
    cfg.output_dir/checkpoints.
    """
    logger = logger or MetricLogger(cfg.output_dir)
    ckpt = CheckpointManager(
        os.path.join(cfg.output_dir, "checkpoints"),
        save_total_limit=cfg.save_total_limit,
        save_interval_steps=cfg.save_steps)

    # Restore against an ABSTRACT template (shape/dtype/sharding only):
    # orbax then never needs the template's concrete buffers, and callers
    # that already know they are resuming may pass ShapeDtypeStruct leaves
    # for the trainable state instead of materializing a tree that the
    # restore would immediately duplicate (the 8B QLoRA resume leg OOMed
    # exactly this way: init copy + restored copy of trainables+opt both
    # resident when the first step's activations allocated).
    def _abstract(x):
        if isinstance(x, jax.ShapeDtypeStruct):
            return x
        if isinstance(x, jax.Array):
            return jax.ShapeDtypeStruct(x.shape, x.dtype,
                                        sharding=x.sharding)
        return x

    restored = ckpt.restore(jax.tree_util.tree_map(_abstract, state))
    if restored is not None:
        state = restored
        print(f"resumed from step {int(np.asarray(state.step))}", flush=True)
    elif any(isinstance(l, jax.ShapeDtypeStruct)
             for l in jax.tree_util.tree_leaves(state)):
        raise ValueError(
            "state contains abstract (ShapeDtypeStruct) leaves but there is "
            "no checkpoint to restore them from — pass concrete arrays for "
            "a from-scratch run")

    start_step = int(np.asarray(state.step))
    total_steps = cfg.max_steps
    if total_steps is None and steps_per_epoch is not None:
        total_steps = int(steps_per_epoch * cfg.num_epochs)

    step = start_step
    t_last = time.time()
    done = False
    epoch = 0 if steps_per_epoch is None else start_step // max(steps_per_epoch, 1)
    # in-epoch fast-forward after a mid-epoch resume: skip the batches the
    # pre-kill run already consumed so the data stream re-aligns with the
    # step counter (HF Trainer's default resume semantics,
    # ignore_data_skip=False). The skipped batches are still materialized
    # by the loader (same behavior as the reference) so per-sample RNG
    # streams advance consistently.
    skip = 0
    if restored is not None and steps_per_epoch:
        skip = start_step % max(steps_per_epoch, 1)
        if skip:
            print(f"resume: skipping {skip} already-consumed batches of "
                  f"epoch {epoch}", flush=True)
    while not done:
        data_iter = data_iter_fn(epoch)
        if skip:
            import itertools

            data_iter = itertools.islice(data_iter, skip, None)
            skip = 0
        for batch in device_prefetch(data_iter, batch_shardings):
            state, metrics = train_step(state, batch)
            step += 1
            if step % cfg.log_steps == 0:
                metrics = {k: float(np.asarray(v)) for k, v in metrics.items()}
                dt = time.time() - t_last
                metrics["steps_per_s"] = cfg.log_steps / dt
                t_last = time.time()
                logger.log(step, metrics)
            if eval_fn is not None and eval_steps and step % eval_steps == 0:
                logger.log(step, {f"eval_{k}": v
                                  for k, v in eval_fn(state).items()})
            ckpt.save(step, state)
            if total_steps is not None and step >= total_steps:
                done = True
                break
        epoch += 1
        if total_steps is None:  # epoch-bounded
            if epoch >= cfg.num_epochs:
                done = True

    ckpt.save(step, state, force=True)
    ckpt.close()
    return state


def evaluate_token_accuracy(model, loss_fn, state: TrainState,
                            batches: Iterable[dict]) -> Dict[str, float]:
    """Validation loss/accuracy (reference compute_metrics,
    train_stage1.py:138-152)."""
    losses, accs = [], []
    for batch in batches:
        _, metrics = loss_fn(state.params, batch)
        losses.append(float(np.asarray(metrics["loss"])))
        accs.append(float(np.asarray(metrics["token_accuracy"])))
    return {"loss": float(np.mean(losses)) if losses else float("nan"),
            "token_accuracy": float(np.mean(accs)) if accs else float("nan")}
