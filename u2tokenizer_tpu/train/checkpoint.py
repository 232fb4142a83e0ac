"""Orbax checkpointing with auto-resume.

Replaces the reference's HF Trainer checkpointing (save_strategy="steps",
save_steps, save_total_limit — src/train/train_stage1.py:125-127) and the
ZeRO-3-aware gather-on-save (train_stage1.py:159-175): orbax saves the
sharded TrainState directly; restore reads back onto the current mesh.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, save_total_limit: int = 2,
                 save_interval_steps: int = 2000, async_save: bool = True):
        """``async_save``: snapshot device buffers and write in a background
        thread so the training loop never blocks on checkpoint IO (orbax
        async checkpointing); in-flight saves are joined before a new save,
        on latest_step/restore, and on close."""
        directory = os.path.abspath(directory)
        os.makedirs(directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=save_total_limit,
                save_interval_steps=save_interval_steps,
                enable_async_checkpointing=async_save,
            ),
        )

    def save(self, step: int, state: Any, force: bool = False,
             wait: bool = False) -> bool:
        self._mgr.wait_until_finished()  # join any in-flight async save
        if step in (self._mgr.all_steps() or ()):  # idempotent: the final
            return False  # force-save may coincide with an in-loop save
        saved = self._mgr.save(
            step, args=ocp.args.StandardSave(state), force=force)
        if wait:
            self._mgr.wait_until_finished()
        return saved

    def latest_step(self) -> Optional[int]:
        self._mgr.wait_until_finished()
        return self._mgr.latest_step()

    def restore(self, state_template: Any, step: Optional[int] = None) -> Any:
        self._mgr.wait_until_finished()
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            return None
        return self._mgr.restore(
            step, args=ocp.args.StandardRestore(state_template))

    def close(self):
        self._mgr.close()


def save_params_msgpack(path: str, params: Any) -> None:
    """Single-file flax msgpack export (portable model weights)."""
    from flax import serialization

    with open(path, "wb") as f:
        f.write(serialization.to_bytes(jax.device_get(params)))


def load_params_msgpack(path: str, template: Any) -> Any:
    from flax import serialization

    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())
