"""Subprocess probe of the default JAX backend.

A wedged remote TPU relay blocks ``jax.devices()`` inside a C-level
connection wait where no in-process watchdog (SIGALRM included) can
fire; probing in a short-lived child process is the only reliable way
to detect a dead backend before the parent commits to it. Shared by
``bench.py`` (abort/retry before benchmarking) and ``__graft_entry__``
(fall back to the virtual CPU mesh for the multichip dry-run).

This module must stay importable without importing jax: callers probe
precisely because they have not touched JAX yet.
"""

from __future__ import annotations

import subprocess
import sys
from typing import Tuple

_PROBE_SRC = "import jax; {pin}d = jax.devices(); print(d[0].platform, len(d))"


def probe_default_backend(
    timeout_s: float = 90.0, platform: str = "",
) -> Tuple[str, int]:
    """Return ``(platform, device_count)`` of the default backend, measured
    in a subprocess with a hard timeout. Returns ``("", 0)`` on any failure
    (timeout, crash, unparsable output); stderr of a failed probe is
    discarded — callers that want it can re-run the probe themselves.

    ``platform`` pins the child to a specific backend via
    ``jax.config.update`` (the JAX_PLATFORMS env var loses to this image's
    sitecustomize axon registration; the config update wins)."""
    found, count, _ = _probe(timeout_s, platform)
    return found, count


def probe_default_backend_verbose(
    timeout_s: float = 90.0, platform: str = "",
) -> Tuple[str, int, str]:
    """Like :func:`probe_default_backend` but also returns a short
    diagnostic string (child stderr tail, or the timeout description) for
    logging when the probe fails."""
    return _probe(timeout_s, platform)


def _probe(timeout_s: float, platform: str = "") -> Tuple[str, int, str]:
    pin = (
        f"jax.config.update('jax_platforms', {platform!r}); "
        if platform else ""
    )
    try:
        out = subprocess.run(
            [sys.executable, "-c", _PROBE_SRC.format(pin=pin)],
            capture_output=True, timeout=timeout_s, text=True,
        )
    except subprocess.TimeoutExpired:
        return "", 0, f"probe timed out after {timeout_s:.0f}s"
    except Exception as e:  # e.g. a broken interpreter path
        return "", 0, f"{type(e).__name__}: {e}"
    if out.returncode == 0 and out.stdout.strip():
        try:
            platform, count = out.stdout.strip().splitlines()[-1].split()
            return platform, int(count), ""
        except ValueError:
            pass
    return "", 0, f"rc={out.returncode}: {out.stderr.strip()[-400:]}"
