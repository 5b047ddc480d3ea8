#!/usr/bin/env python3
"""Repo-root shim — the implementation lives in
twotowermlretrieval_tpu.tools.download_dataset (also installed as the ttr-download-dataset
console script)."""

from twotowermlretrieval_tpu.tools.download_dataset import main

if __name__ == "__main__":
    main()
