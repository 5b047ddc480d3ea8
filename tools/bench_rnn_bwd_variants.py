#!/usr/bin/env python3
"""Repo-root shim — the implementation lives in
twotowermlretrieval_tpu.tools.bench_rnn_variants (also installed as the
ttr-bench-rnn console script)."""

import sys
from pathlib import Path

# runnable from a checkout without installation (sys.path[0] is tools/)
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from twotowermlretrieval_tpu.tools.bench_rnn_variants import main

if __name__ == "__main__":
    main()
