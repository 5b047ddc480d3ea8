"""Tracing and step timing.

The reference's only observability is wall-clock prints
(ref: backend/main.py:237, 300; frontend/main.py:113-114, 200-201 —
SURVEY.md §5 'tracing: none'). Here:

- :func:`trace` — context manager around ``jax.profiler`` emitting a
  TensorBoard/XProf trace directory (device timeline, HLO ops, memory);
- :func:`annotate` — named trace regions (shows up inside the timeline);
- :class:`StepTimer` — cheap host-side per-step timing with a
  dispatch/blocked split: ``dispatch_ms`` is the async enqueue cost (host
  work: python + tracing cache hits), ``blocked_ms`` the time the host then
  waits on the device — together they separate host-bound from device-bound
  steps without a full trace.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str, create_perfetto_link: bool = False):
    """Capture a device trace: ``with trace('/tmp/trace'): step(...)``.
    View with TensorBoard's profile plugin or xprof."""
    jax.profiler.start_trace(log_dir, create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region inside a trace (jax.profiler.TraceAnnotation)."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Host-side dispatch/blocked timing for an async-dispatch step fn."""

    def __init__(self, window: int = 100):
        self.window = window
        self.dispatch_ms: List[float] = []
        self.blocked_ms: List[float] = []

    def run(self, fn, *args, block_on=None):
        """Call ``fn(*args)``; returns its outputs. ``block_on``: a pytree
        from the outputs to block on (defaults to all outputs)."""
        t0 = time.perf_counter()
        out = fn(*args)
        t1 = time.perf_counter()
        jax.block_until_ready(block_on if block_on is not None else out)
        t2 = time.perf_counter()
        self.dispatch_ms.append((t1 - t0) * 1000)
        self.blocked_ms.append((t2 - t1) * 1000)
        if len(self.dispatch_ms) > self.window:
            self.dispatch_ms.pop(0)
            self.blocked_ms.pop(0)
        return out

    def summary(self) -> Dict[str, float]:
        import numpy as np

        if not self.dispatch_ms:
            return {}
        d, b = np.asarray(self.dispatch_ms), np.asarray(self.blocked_ms)
        return {
            "dispatch_ms_p50": float(np.percentile(d, 50)),
            "blocked_ms_p50": float(np.percentile(b, 50)),
            "step_ms_p50": float(np.percentile(d + b, 50)),
            "step_ms_p99": float(np.percentile(d + b, 99)),
            "host_bound_fraction": float(d.sum() / max((d + b).sum(), 1e-9)),
        }
