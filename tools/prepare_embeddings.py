#!/usr/bin/env python3
"""Repo-root shim — the implementation lives in
twotowermlretrieval_tpu.tools.prepare_embeddings (also installed as the ttr-prepare-embeddings
console script)."""

from twotowermlretrieval_tpu.tools.prepare_embeddings import main

if __name__ == "__main__":
    main()
