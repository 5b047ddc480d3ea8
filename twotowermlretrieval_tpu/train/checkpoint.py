"""Checkpoint / resume for params + optimizer state + data-order position.

The reference has **no mid-training checkpointing** — a crash loses the run;
only an end-of-run ``model.pth`` export exists (ref: backend/main.py:92-153,
303-304, SURVEY.md §5). Here every N steps the full :class:`TrainState`
(trainable + frozen params, Adam moments, step counter, dropout rng) plus
the data-iterator position (epoch + epoch-seed + batch index) goes through
Orbax, making runs preemption-tolerant: restore + skip-ahead reproduces the
exact batch order (the batcher shuffles deterministically from the epoch
seed).
"""

from __future__ import annotations

import json
import os
import shutil
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

from twotowermlretrieval_tpu.train.train_step import TrainState


def _is_primary() -> bool:
    return jax.process_count() == 1 or jax.process_index() == 0


def _barrier(name: str) -> None:
    """Cross-process sync point (no-op single-process). Host-side file
    mutations (rmtree, position write, gc) run on process 0 only; the
    barriers keep other processes from racing Orbax's collective save
    into a directory that is still being cleared."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)


class CheckpointManager:
    def __init__(self, directory: str | Path, max_to_keep: int = 3):
        self.directory = Path(directory).resolve()
        self.directory.mkdir(parents=True, exist_ok=True)  # idempotent, race-safe
        self.max_to_keep = max_to_keep
        self._ckptr = ocp.StandardCheckpointer()

    # ------------------------------------------------------------------
    def save(self, state: TrainState, data_position: Optional[Dict[str, Any]] = None) -> Path:
        step = int(state.step)
        path = self.directory / f"step_{step:08d}"
        if _is_primary() and path.exists():
            shutil.rmtree(path)
        _barrier(f"ckpt-pre-save-{step}")
        # typed PRNG keys aren't serializable; store raw key data
        savable = state._replace(rng=jax.random.key_data(state.rng))
        # collective in multi-process runs: every process contributes its
        # addressable shards, process 0 writes the metadata
        self._ckptr.save(path, savable._asdict())
        # orbax saves async + atomic-renames the directory; sync before
        # touching anything next to it
        self._ckptr.wait_until_finished()
        _barrier(f"ckpt-post-save-{step}")
        if _is_primary():
            # atomic position write: a crash mid-write must not leave a
            # torn JSON that silently resumes from epoch 0 with
            # mid-training params
            pos_file = self._position_file(step)
            tmp = pos_file.with_suffix(f".tmp.{os.getpid()}")
            tmp.write_text(json.dumps(data_position or {}))
            os.replace(tmp, pos_file)
            self._gc()
        _barrier(f"ckpt-done-{step}")
        return path

    def restore(self, template: TrainState, step: Optional[int] = None) -> Tuple[TrainState, Dict[str, Any]]:
        """Restore into the structure of ``template`` (built by
        create_train_state with the same config)."""
        path = self._step_path(step)
        target = template._replace(rng=jax.random.key_data(template.rng))._asdict()
        restored = self._ckptr.restore(path, target)
        state = TrainState(**restored)
        state = state._replace(rng=jax.random.wrap_key_data(state.rng))
        pos_file = self._position_file(int(state.step))
        position: Dict[str, Any] = {}
        if pos_file.exists():
            try:
                position = json.loads(pos_file.read_text())
            except json.JSONDecodeError:
                print(
                    f"WARNING: corrupt data-position file {pos_file}; "
                    "resuming from the epoch start", flush=True,
                )
        return state, position

    # ------------------------------------------------------------------
    def all_steps(self):
        return sorted(
            int(p.name.split("_")[1]) for p in self.directory.glob("step_*") if p.is_dir()
        )

    def latest_step(self) -> Optional[int]:
        steps = self.all_steps()
        return steps[-1] if steps else None

    def _step_path(self, step: Optional[int]) -> Path:
        if step is None:
            step = self.latest_step()
            if step is None:
                raise FileNotFoundError(f"no checkpoints under {self.directory}")
        return self.directory / f"step_{step:08d}"

    def _position_file(self, step: int) -> Path:
        # kept outside the step dir: orbax owns that directory's lifecycle
        return self.directory / f"step_{step:08d}.position.json"

    def _gc(self) -> None:
        steps = self.all_steps()
        for old in steps[: -self.max_to_keep]:
            shutil.rmtree(self.directory / f"step_{old:08d}", ignore_errors=True)
            self._position_file(old).unlink(missing_ok=True)
