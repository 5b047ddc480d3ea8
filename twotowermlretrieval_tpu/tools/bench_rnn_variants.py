#!/usr/bin/env python3
"""Measure the fused-RNN backward variants on the live chip.

Two levels, at the headline bench shapes (reference architecture,
backend/config.json:9-24 — GRU H=256 2-layer bidirectional, B=64, query
T=32 / doc rows 2B at T=128):

1. kernel-level: rnn_layer_bwd (combined, in-VMEM dw accumulation — 3 MXU
   matmuls per step per direction) vs rnn_layer_bwd_hoisted (combined
   directions, dw hoisted to one XLA matmul — 2 per step) vs
   rnn_layer_bwd_split_full (per-direction programs, dw hoisted);
2. full train step with TTMR_RNN_BWD_PLAN={combined,hoisted}.

Chained device timing (data dependency threaded through an input) cancels
the ~24 ms relay round-trip, same protocol as bench.py.
"""

import argparse
import functools
import os
import sys
import time

import numpy as np

H, GH, D = 256, 768, 2
SHAPES = {"query": (32, 64), "doc": (128, 128)}  # name -> (T, B_rows)


def log(msg):
    print(msg, flush=True)


def chained(fn, M):
    """Median-of-5 per-call time of fn chained M times on device.

    Differences an (M+1)-length and a 1-length chain to cancel the
    dispatch+fetch RTT; both chain lengths are compiled BEFORE any timed
    window, and M must be large enough that M*t dwarfs the ~24 ms relay
    RTT's +-10-15% jitter (callers pick M ~ 100 ms / expected t)."""
    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnames=("n",))
    def chain(seed, n):
        def body(acc, _):
            return acc + fn(acc), None

        acc, _ = jax.lax.scan(body, seed, None, length=n)
        return acc

    float(chain(jnp.float32(0.0), 1))  # compile both lengths
    float(chain(jnp.float32(0.0), M + 1))

    def t_once(n):
        t0 = time.time()
        float(chain(jnp.float32(0.0), n))
        return time.time() - t0

    base = min(t_once(1) for _ in range(3))
    ts = [max(t_once(M + 1) - base, 1e-9) / M for _ in range(5)]
    return float(np.median(ts))


def bench_kernels(cell):
    import jax
    import jax.numpy as jnp

    from twotowermlretrieval_tpu.ops.rnn_scan import (
        rnn_layer_bwd,
        rnn_layer_bwd_hoisted,
        rnn_layer_bwd_split_full,
        rnn_layer_fwd,
    )

    rng = np.random.default_rng(0)
    gates = {"GRU": 3, "LSTM": 4, "RNN": 1}[cell]
    gh = gates * H
    for name, (T, B) in SHAPES.items():
        xps = tuple(
            jnp.asarray(rng.standard_normal((T, B, gh)) * 0.3, jnp.float32)
            for _ in range(D)
        )
        mask = (
            jnp.arange(T)[:, None] < jnp.asarray(rng.integers(T // 2, T + 1, (B,)))[None, :]
        ).astype(jnp.float32)
        w = jnp.asarray(rng.standard_normal((D, H, gh)) * 0.05, jnp.float32)
        b = jnp.asarray(rng.standard_normal((D, gh)) * 0.05, jnp.float32)
        outs, c_hist, _ = rnn_layer_fwd(cell, xps, mask, w, b)
        douts = tuple(
            jnp.asarray(rng.standard_normal((T, B, H)), jnp.float32) for _ in range(D)
        )
        dhf = jnp.asarray(rng.standard_normal((D, B, H)), jnp.float32)
        jax.block_until_ready((outs, douts))

        def run(impl):
            def fn(eps):
                d2 = tuple(x + eps * 1e-30 for x in douts)
                dxps, dw, db = impl(
                    cell, xps, mask, w, b, outs, c_hist, d2, dhf
                )
                return jnp.sum(dxps[0][0, 0]) * 1e-20 + jnp.sum(dw) * 1e-20

            return chained(fn, 400)

        t_comb = run(rnn_layer_bwd)
        t_hoist = run(rnn_layer_bwd_hoisted)
        t_split = run(rnn_layer_bwd_split_full)
        log(
            f"{cell} {name} [T={T}, rows={B}] bwd: combined {t_comb*1e3:.3f} ms | "
            f"hoisted {t_hoist*1e3:.3f} ms | split {t_split*1e3:.3f} ms"
        )



def _gru_config_and_batch(B):
    """The headline bench setup (reference architecture, MS MARCO-like
    length distribution) shared by the step/history modes."""
    import jax
    import jax.numpy as jnp

    from twotowermlretrieval_tpu.config import Config
    from twotowermlretrieval_tpu.data.batching import Batch

    VOCAB = 50_000
    rng = np.random.default_rng(0)
    table = (rng.standard_normal((VOCAB, 100)) * 0.1).astype(np.float32)
    config = Config(
        vocab_size=VOCAB, embed_dim=100, hidden_dim=H, num_layers=2,
        bidirectional=True, dropout=0.2, batch_size=B, lr=5e-5, margin=0.5,
        loss_type="triplet", max_query_len=32, max_doc_len=128,
        compute_dtype="bfloat16", freeze_embeddings=True,
    )
    batch = Batch(*_toks(rng, B, 32, 7, VOCAB), *_toks(rng, B, 128, 60, VOCAB),
                  *_toks(rng, B, 128, 60, VOCAB), jnp.ones((B,), jnp.float32))
    return config, table, batch


def _toks(rng, n, mx, mean, vocab):
    import jax.numpy as jnp

    L = np.clip(rng.normal(mean, mean / 3, n).astype(np.int32), 2, mx)
    t = rng.integers(1, vocab, (n, mx)).astype(np.int32)
    for i, l in enumerate(L):
        t[i, l:] = 0
    return jnp.asarray(t), jnp.asarray(L)



def _make_chain(step_fn, batch):
    """jitted (state, n) -> (state, last_loss): n train steps as ONE
    dispatch (lax.scan over the step), immune to relay per-dispatch cost
    degradation — same protocol as bench.py's training windows."""
    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnames=("n",), donate_argnums=(0,))
    def chain(state, n):
        def body(s, _):
            s2, m = step_fn(s, batch)
            return s2, m["loss"]
        s, losses = jax.lax.scan(body, state, None, length=n)
        return s, losses[-1]

    return chain


def _alternating_windows(variants, run, n_long, n_rounds=7):
    """Timed windows alternating between variants so relay drift hits all
    equally; returns {name: [per-step times]}."""
    for name in variants:
        run(name, 5)
        run(name, n_long)  # compile both window lengths before timing
    base = {name: min(run(name, 5) for _ in range(3)) for name in variants}
    per = {name: [] for name in variants}
    for _ in range(n_rounds):
        for name in variants:
            per[name].append(max(run(name, n_long) - base[name], 1e-9) / (n_long - 5))
    return per


def bench_full_step(plan, B=64):
    os.environ.pop("TTMR_RNN_BWD_PLAN", None)
    if plan != "combined":
        os.environ["TTMR_RNN_BWD_PLAN"] = plan
    import jax

    from twotowermlretrieval_tpu.models.two_tower import TwoTowerSpec, init_two_tower
    from twotowermlretrieval_tpu.train.train_step import (
        create_train_state,
        make_train_step,
    )

    config, table, batch = _gru_config_and_batch(B)
    spec = TwoTowerSpec.from_config(config)
    params = init_two_tower(jax.random.key(0), spec, pretrained_embeddings=table)
    state = create_train_state(jax.random.key(1), params, config)
    chain = _make_chain(make_train_step(spec, config), batch)

    def run(num):
        nonlocal state
        t0 = time.time()
        state, loss = chain(state, num)
        float(loss)
        return time.time() - t0

    n_long = max(45, int(0.1 / 2.2e-3 * 64 / B) + 5)  # ~>=100ms of work
    run(5); run(n_long)  # compile both window lengths
    base = min(run(5) for _ in range(3))
    per = [max(run(n_long) - base, 1e-9) / (n_long - 5) for _ in range(5)]
    med = float(np.median(per))
    log(
        f"full step [{plan}, B={B}]: {med*1e3:.3f} ms/step ({B/med:.0f} ex/s; windows "
        + ", ".join(f"{t*1e3:.2f}" for t in per)
        + ")"
    )


_HISTORY_N_LONG = 45


def bench_history(B=64):
    """A/B the saved-history dtype (TTMR_RNN_HISTORY) INSIDE one process:
    both variants are traced under their env setting, then their timed
    windows alternate so relay drift hits both equally."""
    import jax

    from twotowermlretrieval_tpu.models.two_tower import TwoTowerSpec, init_two_tower
    from twotowermlretrieval_tpu.train.train_step import (
        create_train_state,
        make_train_step,
    )

    config, table, batch = _gru_config_and_batch(B)
    spec = TwoTowerSpec.from_config(config)

    variants = {}
    # both arms set the env EXPLICITLY: with no env, models/rnn.py now
    # defaults 16-bit compute to the compact history, so an unset "f32"
    # arm would silently trace the cdt path and A/B cdt against cdt
    for name, env in (("f32", "f32"), ("cdt", "cdt")):
        os.environ.pop("TTMR_RNN_HISTORY", None)
        os.environ["TTMR_RNN_HISTORY"] = env
        params = init_two_tower(jax.random.key(0), spec, pretrained_embeddings=table)
        state = create_train_state(jax.random.key(1), params, config)
        chain = _make_chain(make_train_step(spec, config), batch)
        # chain is static in n, so EVERY window length that will be timed
        # must compile HERE, while this variant's env setting is active —
        # models/rnn.py reads TTMR_RNN_HISTORY at trace time, and a later
        # retrace (after the pop below) would silently measure the default
        # path for both variants
        for n in (5, _HISTORY_N_LONG):
            state, loss = chain(state, n)
            float(loss)
        variants[name] = (chain, state)
    os.environ.pop("TTMR_RNN_HISTORY", None)

    def run(name, num):
        chain, state = variants[name]
        t0 = time.time()
        state, loss = chain(state, num)
        float(loss)
        variants[name] = (chain, state)
        return time.time() - t0

    per = _alternating_windows(variants, run, n_long=_HISTORY_N_LONG)
    for name, ts in per.items():
        med = float(np.median(ts))
        log(
            f"history={name} [B={B}]: {med*1e3:.3f} ms/step ({B/med:.0f} ex/s; "
            + ", ".join(f"{t*1e3:.2f}" for t in ts)
            + ")"
        )


def bench_negskip(tower="transformer", B=0):
    """A/B TRIPLET_METRICS on/off under a pure in-batch loss, where the
    explicit negative only feeds the triplet metric set; off skips its
    doc-tower pass ([B] instead of [2B] rows). tower='transformer' is
    BASELINE config 5 (configs/transformer_tp.json architecture, B=512,
    learned table); tower='rnn' is the config-2 shape (reference GRU
    towers, in-batch loss, default B=1024)."""
    import jax
    import jax.numpy as jnp

    from twotowermlretrieval_tpu.config import Config
    from twotowermlretrieval_tpu.data.batching import Batch
    from twotowermlretrieval_tpu.models.two_tower import TwoTowerSpec, init_two_tower
    from twotowermlretrieval_tpu.train.train_step import (
        create_train_state,
        make_train_step,
    )

    if tower == "transformer":
        B = B or 512
        VOCAB = 400_000
        base = Config(
            vocab_size=VOCAB, embed_dim=100, hidden_dim=256, num_layers=6,
            tower_type="transformer", num_heads=8, ffn_dim=1024, dropout=0.1,
            batch_size=B, lr=1e-4, margin=0.5, loss_type="in_batch",
            temperature=0.05, max_query_len=32, max_doc_len=128,
            compute_dtype="bfloat16", freeze_embeddings=False,
            residual_dtype="bfloat16",
        )
        rng2 = np.random.default_rng(1)
        batch = Batch(*_toks(rng2, B, 32, 7, VOCAB), *_toks(rng2, B, 128, 60, VOCAB),
                      *_toks(rng2, B, 128, 60, VOCAB), jnp.ones((B,), jnp.float32))
        table = None
    else:
        B = B or 1024
        base, table, batch = _gru_config_and_batch(B)
        base = base.replace(loss_type="in_batch")

    variants = {}
    for name, flag in (("neg-encoded", True), ("neg-skipped", False)):
        config = base.replace(triplet_metrics=flag)
        spec = TwoTowerSpec.from_config(config)
        params = init_two_tower(jax.random.key(0), spec, pretrained_embeddings=table)
        state = create_train_state(jax.random.key(1), params, config)
        chain = _make_chain(make_train_step(spec, config), batch)
        variants[name] = (chain, state)

    def run(name, num):
        chain, state = variants[name]
        t0 = time.time()
        state, loss = chain(state, num)
        float(loss)
        variants[name] = (chain, state)
        return time.time() - t0

    n_long = 10 if tower == "transformer" else 15
    per = _alternating_windows(variants, run, n_long=n_long, n_rounds=5)
    for name, ts in per.items():
        med = float(np.median(ts))
        log(
            f"{tower} B={B} [{name}]: {med*1e3:.2f} ms/step ({B/med:.0f} ex/s; "
            + ", ".join(f"{t*1e3:.1f}" for t in ts)
            + ")"
        )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode",
                    choices=["kernels", "step", "history", "negskip", "transformer"],
                    default="kernels")  # "transformer" = alias of negskip
    ap.add_argument("--tower", choices=["transformer", "rnn"], default="transformer")
    ap.add_argument("--cell", default="GRU")
    ap.add_argument("--plan", choices=["combined", "hoisted"], default="combined")
    ap.add_argument("--batch", type=int, default=0,
                    help="0 = per-mode default (64 for step/history, "
                         "512/1024 for negskip transformer/rnn)")
    args = ap.parse_args()
    from twotowermlretrieval_tpu.hostprobe import probe_default_backend_verbose

    platform, _, diag = probe_default_backend_verbose(180.0)
    if not platform:
        log(f"backend not live ({diag}); aborting")
        sys.exit(2)
    if args.mode == "kernels":
        bench_kernels(args.cell)
    elif args.mode == "history":
        bench_history(args.batch or 64)
    elif args.mode in ("negskip", "transformer"):
        bench_negskip(args.tower, args.batch)
    else:
        bench_full_step(args.plan, args.batch or 64)


if __name__ == "__main__":
    main()
