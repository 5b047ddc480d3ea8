#!/usr/bin/env python3
"""Sweep the retrieval-kernel variants on the current device and print a
table: fused segmax phase-2 {rescore, gather} x {unsorted, sorted} plus
the two-phase XLA path, for int8 and bf16 storage.

This is RetrievalIndex.autotune() run at benchmark scale (default
1M x 128, 8 queries x top-50 — the serving flagship shape from
docs/RESULTS.md), so the numbers printed here are exactly what
``ttr-serve --autotune-retrieval`` would act on. Timing is chained-jit
(M calls inside one program, differenced), immune to host-fetch RTT on
remote-attached devices.

Usage:
    python tools/bench_retrieval_variants.py [--n 1000000] [--dim 128]
        [--batch 8] [--k 50] [--iters 40] [--dtypes int8,bfloat16]
        [--interpret]   # CPU smoke test of the harness itself
"""

import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--k", type=int, default=50)
    ap.add_argument("--iters", type=int, default=40)
    ap.add_argument("--dtypes", default="int8,bfloat16")
    ap.add_argument("--interpret", action="store_true",
                    help="run the Pallas kernels in interpret mode "
                         "(CPU smoke test; timings are meaningless)")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    if args.interpret:
        # pin to CPU via jax.config: the JAX_PLATFORMS env var is
        # overridden by remote-attach sitecustomize hooks (axon), and a
        # down relay would block the smoke test forever
        import jax

        jax.config.update("jax_platforms", "cpu")

    from twotowermlretrieval_tpu.serve.index import RetrievalIndex

    rng = np.random.default_rng(args.seed)
    docs = rng.standard_normal((args.n, args.dim)).astype(np.float32)
    docs /= np.linalg.norm(docs, axis=1, keepdims=True)

    # HBM speed-of-light per variant family (v5e 819 GB/s; adjust for
    # other parts) — printed as context, not used for selection
    hbm = 819e9
    for dtype in args.dtypes.split(","):
        dtype = dtype.strip()
        index = RetrievalIndex(
            docs, storage_dtype=dtype, use_pallas=True,
            interpret=args.interpret,
        )
        print(f"== {dtype}  N={args.n} H={args.dim} B={args.batch} "
              f"k={args.k} ==", flush=True)
        timings = index.autotune(B=args.batch, k=args.k, iters=args.iters)
        if not timings:
            print("  (autotune no-op: fused kernels not dispatched here)")
            continue
        bpr = args.dim * (1 if dtype == "int8" else
                          2 if dtype == "bfloat16" else 4)
        sol = args.n * bpr / hbm
        for (ph, srt), t in sorted(timings.items(), key=lambda kv: kv[1]):
            tag = f"{ph}{'+sorted' if srt else ''}"
            print(f"  {tag:16s} {t * 1e3:8.3f} ms"
                  f"   ({sol / max(t, 1e-12) * 100:5.1f}% of {sol * 1e3:.2f} ms SOL)",
                  flush=True)
        best = ("xla" if index.use_pallas is False
                else f"{index.phase2}{'+sorted' if index.sort_candidates else ''}")
        print(f"  -> serving choice: {best}", flush=True)


if __name__ == "__main__":
    main()
