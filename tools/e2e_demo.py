#!/usr/bin/env python3
"""Repo-root shim — the implementation lives in
twotowermlretrieval_tpu.tools.e2e_demo (also installed as the ttr-e2e-demo
console script)."""

import sys
from pathlib import Path

# runnable from a checkout without installation (sys.path[0] is tools/)
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from twotowermlretrieval_tpu.tools.e2e_demo import main

if __name__ == "__main__":
    main()
