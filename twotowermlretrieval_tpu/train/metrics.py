"""Metric registry -> sinks (stdout JSONL, optional W&B).

The reference logs through two channels — W&B (init/watch/log,
ref: backend/main.py:228-234, 264-296) and emoji prints. Here metrics flow
through one logger with pluggable sinks: a JSONL file/stream (always, so
runs are machine-readable without external services) and W&B when the
package is importable and enabled (the environment may not have it).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path
from typing import Any, Dict, Optional


def _jsonable(v):
    """Scalars -> float; arrays -> lists; anything else passes through
    (the sink must never kill the training loop over a metric value)."""
    if hasattr(v, "__float__"):
        try:
            return float(v)
        except (TypeError, ValueError):
            pass
    if hasattr(v, "tolist"):
        return v.tolist()
    return v


class MetricLogger:
    def __init__(
        self,
        jsonl_path: Optional[str | Path] = None,
        stdout: bool = True,
        use_wandb: bool = False,
        wandb_project: str = "two-tower-retrieval-tpu",
        wandb_config: Optional[Dict[str, Any]] = None,
        run_name: Optional[str] = None,
    ):
        self.stdout = stdout
        self._file = open(jsonl_path, "a") if jsonl_path else None
        self.run_name = run_name or f"run-{time.strftime('%Y%m%d_%H%M%S')}"
        self._wandb = None
        if use_wandb:
            try:
                import wandb  # type: ignore

                wandb.init(project=wandb_project, config=wandb_config, name=self.run_name)
                self._wandb = wandb
            except Exception as e:  # noqa: BLE001 — wandb is best-effort
                print(f"wandb unavailable ({e}); falling back to JSONL only", file=sys.stderr)

    def log(self, metrics: Dict[str, Any], step: int) -> None:
        record = {"step": int(step), "time": time.time()}
        record.update({k: _jsonable(v) for k, v in metrics.items()})
        line = json.dumps(record)
        if self.stdout:
            print(line, flush=True)
        if self._file:
            self._file.write(line + "\n")
            self._file.flush()
        if self._wandb:
            self._wandb.log(metrics, step=step)

    def finish(self) -> None:
        if self._file:
            self._file.close()
            self._file = None
        if self._wandb:
            self._wandb.finish()
            self._wandb = None
