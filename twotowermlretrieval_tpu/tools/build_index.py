#!/usr/bin/env python3
"""Offline index builder — the role of the reference's save_to_chromaDB
notebook (ref: frontend/save_to_chromaDB.ipynb) as a first-class CLI.

Reads an artifact directory (documents.pkl + document_embeddings.npy from
training), clusters the corpus into the on-device IVF index (ops/ivf.py)
and writes ``ivf_index.npz`` next to the other artifacts. Serving then
cold-starts with ``--index-type ivf`` and no k-means
(twotowermlretrieval_tpu.serve.app loads the file via load_artifacts).

Usage:
    python tools/build_index.py artifacts/<run> \
        [--storage-dtype bfloat16|int8|float32] [--clusters 0] [--iters 10]
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np


def main():
    parser = argparse.ArgumentParser(description="Build the serving-side IVF index offline")
    parser.add_argument("artifacts", help="artifact directory from training")
    parser.add_argument("--storage-dtype", default="bfloat16",
                        choices=["float32", "bfloat16", "int8"])
    parser.add_argument("--clusters", type=int, default=0,
                        help="0 = sqrt(N) heuristic")
    parser.add_argument("--iters", type=int, default=10, help="Lloyd iterations")
    parser.add_argument("--kmeans-sample", type=int, default=0,
                        help=">0: run Lloyd iterations on this many sampled "
                             "rows (recommended ~262144 for N >> 1M)")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    art = Path(args.artifacts)
    emb_file = art / "document_embeddings.npy"
    if not emb_file.exists():
        print(f"FATAL: {emb_file} not found — train first "
              "(python -m twotowermlretrieval_tpu.train.loop --config <json>)")
        sys.exit(1)

    from twotowermlretrieval_tpu.ops.ivf import IVF_INDEX_FILE, build_ivf, save_ivf

    doc_embeddings = np.load(emb_file)
    print(f"clustering {doc_embeddings.shape[0]} docs x {doc_embeddings.shape[1]} dims "
          f"({args.storage_dtype} blocks)...")
    t0 = time.time()
    index = build_ivf(
        doc_embeddings.astype(np.float32),
        num_clusters=args.clusters,
        iters=args.iters,
        storage_dtype=args.storage_dtype,
        seed=args.seed,
        kmeans_sample=args.kmeans_sample,
    )
    out = art / IVF_INDEX_FILE
    save_ivf(out, index)
    print(f"wrote {out} ({index.docs.shape[0]} blocks x cap {index.cap}) "
          f"in {time.time() - t0:.1f}s")


if __name__ == "__main__":
    main()
