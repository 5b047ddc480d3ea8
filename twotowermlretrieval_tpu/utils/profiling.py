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


class TraceWindow:
    """A jax.profiler trace spanning the first ``n`` traced events.

    Lazy start — the first ``event()`` begins the capture, so startup /
    warmup compiles stay out of the timeline — and an exact-once stop
    after the n-th event completes. ``close()`` finalizes an UNFILLED
    window (trace data is only written at stop; the training driver
    finalizes the same way when the run ends inside its capture window).
    Thread-safe. Profiler failures DISABLE the window with one warning
    instead of propagating: a profiling flag must never fail the
    workload it observes.
    """

    def __init__(self, log_dir: str, n: int, what: str = "events"):
        if n < 1:
            raise ValueError(f"trace window needs n >= 1, got {n}")
        import threading

        self._dir = log_dir
        self._remaining = n
        self._what = what
        self._lock = threading.Lock()
        self._started = False
        self._finished = False  # stopped OR disabled by a profiler error

    @property
    def done(self) -> bool:
        return self._finished

    @contextlib.contextmanager
    def event(self):
        """Context manager around one traced event; a no-op once done."""
        with self._lock:
            if not self._finished and not self._started:
                try:
                    jax.profiler.start_trace(self._dir)
                    self._started = True
                    print(f"profiler: tracing the next {self._remaining} "
                          f"{self._what} to {self._dir}", flush=True)
                except Exception as e:  # noqa: BLE001 — never fail the workload
                    self._finished = True
                    print(f"profiler: disabled — start_trace failed "
                          f"({type(e).__name__}: {e})", flush=True)
        try:
            yield
        finally:
            stop = False
            with self._lock:
                if self._started and not self._finished:
                    self._remaining -= 1
                    if self._remaining <= 0:
                        self._finished = True
                        stop = True
            if stop:
                self._finalize()

    def close(self):
        """Finalize an unfilled window (shutdown path)."""
        with self._lock:
            if not self._started or self._finished:
                return
            self._finished = True
        self._finalize()

    def _finalize(self):
        try:
            jax.profiler.stop_trace()
            print(f"profiler: trace written to {self._dir}", flush=True)
        except Exception as e:  # noqa: BLE001 — never fail the workload
            print(f"profiler: stop_trace failed ({type(e).__name__}: {e})",
                  flush=True)


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
