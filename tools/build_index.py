#!/usr/bin/env python3
"""Repo-root shim — the implementation lives in
twotowermlretrieval_tpu.tools.build_index (also installed as the ttr-build-index
console script)."""

from twotowermlretrieval_tpu.tools.build_index import main

if __name__ == "__main__":
    main()
