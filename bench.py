#!/usr/bin/env python3
"""Headline benchmark: triplet training throughput, TPU vs PyTorch reference.

Prints exactly ONE JSON line to stdout:
    {"metric": "triplet_train_throughput", "value": <examples/s/chip>,
     "unit": "examples/s/chip", "vs_baseline": <tpu / torch-reference>}

Protocol (BASELINE.md): the reference publishes no numbers, so the baseline
is self-generated — an equivalent PyTorch training step (frozen-embedding
bidirectional 2-layer GRU towers, pack_padded_sequence, cosine triplet
loss, Adam + clip, the reference's default architecture
backend/config.json:9-24) measured live on this host, against our jitted
TPU train step at the same model size, batch size, and length distribution.

Timing notes: on this environment device dispatch is async and any host
fetch pays a ~24ms relay round-trip, so the TPU measurement enqueues M
steps back-to-back and differences two run lengths to cancel the RTT.
Secondary details (per-step times, retrieval latency) go to stderr.
"""

import json
import sys
import time

import numpy as np

# --- benchmark configuration: the reference's default architecture -------
VOCAB = 50_000
EMBED_DIM = 100  # GloVe-100d (notebooks/embeddings_processing.ipynb)
HIDDEN_DIM = 256  # backend/config.json:12
NUM_LAYERS = 2  # backend/config.json:14
BIDIRECTIONAL = True  # backend/config.json:15
BATCH = 64  # backend/config.json:19
LR = 5e-5  # backend/config.json:21
MARGIN = 0.5  # backend/config.json:23
MAX_QUERY_LEN = 32
MAX_DOC_LEN = 128
SEED = 0


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def make_host_batch(rng):
    """MS MARCO-like length distribution: short queries, long passages."""
    def tokens(batch, max_len, mean_len):
        lengths = np.clip(rng.normal(mean_len, mean_len / 3, batch).astype(np.int32), 2, max_len)
        toks = rng.integers(1, VOCAB, (batch, max_len)).astype(np.int32)
        for i, L in enumerate(lengths):
            toks[i, L:] = 0
        return toks, lengths

    q, ql = tokens(BATCH, MAX_QUERY_LEN, 7)
    p, pl = tokens(BATCH, MAX_DOC_LEN, 60)
    n, nl = tokens(BATCH, MAX_DOC_LEN, 60)
    return q, ql, p, pl, n, nl


# ---------------------------------------------------------------------------
# TPU side
# ---------------------------------------------------------------------------


def bench_tpu(host_batch, table) -> float:
    import jax
    import jax.numpy as jnp

    from twotowermlretrieval_tpu.config import Config
    from twotowermlretrieval_tpu.data.batching import Batch
    from twotowermlretrieval_tpu.models.two_tower import TwoTowerSpec, init_two_tower
    from twotowermlretrieval_tpu.train.train_step import create_train_state, make_train_step

    config = Config(
        vocab_size=VOCAB, embed_dim=EMBED_DIM, hidden_dim=HIDDEN_DIM,
        num_layers=NUM_LAYERS, bidirectional=BIDIRECTIONAL, dropout=0.2,
        batch_size=BATCH, lr=LR, margin=MARGIN, loss_type="triplet",
        max_query_len=MAX_QUERY_LEN, max_doc_len=MAX_DOC_LEN,
        compute_dtype="bfloat16", freeze_embeddings=True,
    )
    spec = TwoTowerSpec.from_config(config)
    params = init_two_tower(jax.random.key(SEED), spec, pretrained_embeddings=table)
    state = create_train_state(jax.random.key(SEED + 1), params, config)

    q, ql, p, pl, n, nl = host_batch
    batch = Batch(
        jnp.asarray(q), jnp.asarray(ql), jnp.asarray(p), jnp.asarray(pl),
        jnp.asarray(n), jnp.asarray(nl), jnp.ones((BATCH,), jnp.float32),
    )
    step_fn = make_train_step(spec, config)

    # The steps of a window run as ONE dispatch (lax.scan over the step,
    # exactly the production loop's STEPS_PER_DISPATCH grouping and this
    # file's own retrieval-chain protocol). Round-5 necessity: the relay's
    # PER-DISPATCH cost was observed degrading from <0.5 ms to 2-5 ms over
    # a day, which made the old per-step-dispatch loop report 3.4-6.2
    # ms/step while the device itself still ran the step in ~2.1 ms
    # (scan-chained, stable 2.07-2.20 across the same degraded windows).
    # The chain measures what a training run actually pays.
    from twotowermlretrieval_tpu.tools.bench_rnn_variants import _make_chain

    chain = _make_chain(step_fn, batch)

    def run(num_steps):
        nonlocal state
        t0 = time.time()
        state, loss = chain(state, num_steps)
        float(loss)  # one host fetch at the end
        return time.time() - t0

    run(5); run(45)  # compile + warm both window lengths
    # >= 5 measurement windows (VERDICT r2 item 8): the relay adds +-10-15%
    # noise per window, so the headline reports the MEDIAN with min/max
    # spread instead of a single draw. Each window differences a 45-step
    # and a 5-step chain to cancel dispatch+RTT; the base is min-of-3.
    base = min(run(5) for _ in range(3))
    per_steps = [max(run(45) - base, 1e-9) / 40 for _ in range(5)]
    per_step = float(np.median(per_steps))
    flops = estimate_train_flops()
    mfu = flops / per_step / PEAK_BF16_FLOPS
    log(f"tpu: {per_step * 1000:.2f} ms/step at B={BATCH} "
        f"({BATCH / per_step:.0f} ex/s; windows "
        f"{', '.join(f'{t * 1000:.2f}' for t in per_steps)} ms); "
        f"~{flops / 1e9:.1f} GFLOP/step "
        f"=> MFU ~{mfu * 100:.1f}% of {PEAK_BF16_FLOPS / 1e12:.0f} TFLOP/s peak")
    return sorted(BATCH / t for t in per_steps)


# v5e headline specs, used only to contextualize measurements
PEAK_BF16_FLOPS = 197e12
PEAK_HBM_BYTES_S = 819e9


def estimate_train_flops() -> float:
    """Analytic matmul FLOPs for one train step (fwd+bwd ~= 3x fwd).

    GRU per timestep per direction per layer: x@W_ih [In,3H] + h@W_hh
    [H,3H] -> 2*B*(In*3H + H*3H) FLOPs. Layer 1 sees In=EMBED_DIM; deeper
    layers see the 2H bidirectional concat. Three encodes per step: query
    [B, Lq] + pos/neg docs as one [2B, Ld] doc-tower call. Elementwise
    gates/loss are bandwidth, not FLOPs — excluded, so this slightly
    understates true work (conservative MFU)."""
    H = HIDDEN_DIM
    dirs = 2 if BIDIRECTIONAL else 1

    def tower_flops(rows, T):
        total = 0.0
        for layer in range(NUM_LAYERS):
            inp = EMBED_DIM if layer == 0 else H * dirs
            per_t = 2 * rows * (inp * 3 * H + H * 3 * H)
            total += dirs * T * per_t
        total += 2 * rows * (dirs * H) * H  # output projection
        return total

    fwd = tower_flops(BATCH, MAX_QUERY_LEN) + tower_flops(2 * BATCH, MAX_DOC_LEN)
    return 3.0 * fwd


# ---------------------------------------------------------------------------
# torch reference baseline (equivalent implementation, not a copy)
# ---------------------------------------------------------------------------


def bench_torch(host_batch, table) -> float:
    import os

    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    torch.manual_seed(SEED)
    # Pin threads and report the environment so the baseline is a defensible
    # measurement, not an unpinned run fluctuating with host load.
    n_threads = os.cpu_count() or 1
    torch.set_num_threads(n_threads)
    log(f"torch env: {torch.__version__}, threads={torch.get_num_threads()}, "
        f"interop={torch.get_num_interop_threads()}, cpu_count={n_threads}")

    class Tower(nn.Module):
        """The reference encoder's compute path (ref: backend/model.py:8-75)."""

        def __init__(self):
            super().__init__()
            self.embedding = nn.Embedding(VOCAB, EMBED_DIM, padding_idx=0)
            self.embedding.weight.data.copy_(torch.from_numpy(table))
            self.embedding.weight.requires_grad = False
            self.rnn = nn.GRU(
                EMBED_DIM, HIDDEN_DIM, num_layers=NUM_LAYERS, batch_first=True,
                dropout=0.2, bidirectional=BIDIRECTIONAL,
            )
            self.projection = nn.Linear(HIDDEN_DIM * 2, HIDDEN_DIM) if BIDIRECTIONAL else None

        def forward(self, x, lengths):
            packed = nn.utils.rnn.pack_padded_sequence(
                self.embedding(x), lengths, batch_first=True, enforce_sorted=False
            )
            _, h_n = self.rnn(packed)
            if BIDIRECTIONAL:
                hidden = self.projection(torch.cat([h_n[-2], h_n[-1]], dim=1))
            else:
                hidden = h_n[-1]
            return F.normalize(hidden, p=2, dim=1)

    query_tower, doc_tower = Tower(), Tower()
    params = [p for t in (query_tower, doc_tower) for p in t.parameters() if p.requires_grad]
    optimizer = torch.optim.Adam(params, lr=LR)

    q, ql, p, pl, n, nl = host_batch
    tq, tp, tn = map(lambda a: torch.from_numpy(a).long(), (q, p, n))
    tql, tpl, tnl = map(torch.from_numpy, (ql, pl, nl))

    def step():
        optimizer.zero_grad()
        q_emb = query_tower(tq, tql)
        p_emb = doc_tower(tp, tpl)
        n_emb = doc_tower(tn, tnl)
        pos_sim = F.cosine_similarity(q_emb, p_emb)
        neg_sim = F.cosine_similarity(q_emb, n_emb)
        loss = torch.clamp(neg_sim - pos_sim + MARGIN, min=0.0).mean()
        loss.backward()
        torch.nn.utils.clip_grad_norm_(params, max_norm=1.0)
        optimizer.step()

    step(); step()  # warm
    # >= 5 windows, median + spread (VERDICT r2 item 8): the 1-core host
    # fluctuates ~2x with load, and a single-draw baseline made
    # vs_baseline swing 30% between rounds
    num_steps = 6
    windows = []
    for _ in range(5):
        t0 = time.time()
        for _ in range(num_steps):
            step()
        windows.append((time.time() - t0) / num_steps)
    per_step = float(np.median(windows))
    log(f"torch-cpu reference: {per_step * 1000:.2f} ms/step (median of 5 "
        f"windows: {', '.join(f'{w * 1000:.0f}' for w in windows)} ms) at "
        f"B={BATCH} ({BATCH / per_step:.0f} ex/s)")
    return sorted(BATCH / w for w in windows)


def bench_retrieval():
    """Secondary detail (stderr only): exact top-50 latency over 1M docs."""
    import jax
    import jax.numpy as jnp

    from twotowermlretrieval_tpu.ops.topk import (
        fused_topk_segmax,
        fused_topk_segmax_s8,
        quantize_segments,
        topk_segmented,
        topk_segmented_s8,
    )

    N, H, K, B = 1_000_000, 128, 50, 8
    rng = np.random.default_rng(SEED)
    docs = rng.standard_normal((N, H)).astype(np.float32)
    # pad rows to the streaming tile once (as RetrievalIndex does) — an
    # in-call pad would re-copy the corpus every search
    pad = (-N) % 8192
    docs = np.concatenate([docs, np.zeros((pad, H), np.float32)])
    vals_i8, seg_scales = quantize_segments(docs)
    docs_bf = jnp.asarray(docs, jnp.bfloat16)
    d_i8, d_s = jnp.asarray(vals_i8), jnp.asarray(seg_scales)
    q = jnp.asarray(rng.standard_normal((B, H)), jnp.float32)
    jax.block_until_ready((docs_bf, d_i8))

    import functools

    # jits hoisted and parameterized (M static, corpus as ARGUMENTS): a
    # fresh closure per call would recompile each time and bake the 256MB
    # corpus into the program as a constant
    @functools.partial(jax.jit, static_argnames=("M", "mode"))
    def chain(q, docs_bf, d_i8, d_s, M, mode):
        def body(acc, _):
            qq = q + acc * 1e-30
            if mode == "bf16":  # serving default: segmax streaming kernel
                v, _ = fused_topk_segmax(qq.astype(jnp.bfloat16), docs_bf, k=K, n_valid=N)
            elif mode == "int8":  # serving default: s8xs8 segmax kernel
                v, _ = fused_topk_segmax_s8(qq, d_i8, d_s, k=K, n_valid=N)
            elif mode == "bf16-xla":  # comparison: two-phase XLA
                v, _ = topk_segmented(qq.astype(jnp.bfloat16), docs_bf, k=K, n_valid=N)
            else:  # int8-xla: the off-TPU twin of the s8 kernel
                v, _ = topk_segmented_s8(qq, d_i8, d_s, k=K, n_valid=N)
            return acc * 0.5 + jnp.sum(v) * 1e-20, None
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=M)
        return acc

    def chain_time(M, mode):
        float(chain(q, docs_bf, d_i8, d_s, M, mode))
        t0 = time.time(); float(chain(q, docs_bf, d_i8, d_s, M, mode)); return time.time() - t0

    # int8 rows cost H bytes (+4/128 per row of segment scales — negligible)
    for mode, bytes_per_row in (
        ("bf16", 2 * H), ("int8", H),
        ("bf16-xla", 2 * H), ("int8-xla", H),
    ):
        # repeat the short run and take its minimum: through the remote
        # relay a single reference measurement is noisy enough to make the
        # difference go negative
        base = min(chain_time(1, mode) for _ in range(3))
        t = max(chain_time(41, mode) - base, 0.0) / 40
        # HBM roofline: one full corpus pass per batch is the mandatory
        # traffic; fraction of speed-of-light contextualizes the kernel
        sol = (N * bytes_per_row) / PEAK_HBM_BYTES_S
        log(f"retrieval {mode}: {t*1e3:.2f} ms for {B} queries x top-{K} "
            f"over 1M x {H} docs (HBM speed-of-light {sol*1e3:.2f} ms -> "
            f"{sol / max(t, 1e-12) * 100:.0f}% of SOL)")


def _arm_watchdog(seconds=1800):
    """Secondary guard against Python-level stalls. NOTE: this cannot
    catch the worst failure mode — when the remote TPU relay is down,
    jax.devices() blocks in a C-level connection wait and SIGALRM
    handlers never run (observed 2026-08-17). That case is covered by
    the SUBPROCESS probe in _require_live_backend(), which runs before
    this process ever touches JAX."""
    import faulthandler
    import signal

    def on_timeout(signum, frame):
        faulthandler.dump_traceback(file=sys.stderr)
        log(f"bench watchdog: no result after {seconds}s — aborting "
            "without a JSON line")
        sys.exit(2)

    signal.signal(signal.SIGALRM, on_timeout)
    signal.alarm(seconds)


def _require_live_backend(timeout_s=180.0, retry_window_s=1800.0):
    """Probe the default JAX backend (subprocess, hard timeout — see
    twotowermlretrieval_tpu/hostprobe.py for why in-process watchdogs
    cannot detect a wedged relay). The relay has been observed to drop
    for stretches and come back, so on failure the probe retries within
    a bounded window before exiting 2 — this run may be the round's only
    chance to record numbers."""
    from twotowermlretrieval_tpu.hostprobe import probe_default_backend_verbose

    deadline = time.time() + retry_window_s
    attempt = 0
    while True:
        attempt += 1
        platform, _, diag = probe_default_backend_verbose(timeout_s)
        if platform:
            log(f"backend probe: default platform '{platform}' is live")
            return
        log(f"backend probe attempt {attempt} failed ({diag})")
        if time.time() + timeout_s > deadline:
            log("backend probe: giving up; aborting without a JSON line")
            sys.exit(2)
        time.sleep(60)


def main():
    _require_live_backend()
    _arm_watchdog()
    rng = np.random.default_rng(SEED)
    table = (rng.standard_normal((VOCAB, EMBED_DIM)) * 0.1).astype(np.float32)
    host_batch = make_host_batch(rng)

    tpu_windows = bench_tpu(host_batch, table)
    try:
        bench_retrieval()
    except Exception as e:  # secondary detail must never break the headline
        log(f"retrieval bench skipped: {type(e).__name__}: {e}")
    torch_windows = bench_torch(host_batch, table)

    # headline = median window each side; spread = worst/best-case ratios
    # so consecutive runs can be judged against the reported dispersion
    # instead of reading relay/host noise as a real regression
    tpu_eps = float(np.median(tpu_windows))
    torch_eps = float(np.median(torch_windows))
    print(json.dumps({
        "metric": "triplet_train_throughput",
        "value": round(tpu_eps, 1),
        "unit": "examples/s/chip",
        "vs_baseline": round(tpu_eps / torch_eps, 2),
        "spread": {
            "value_min": round(tpu_windows[0], 1),
            "value_max": round(tpu_windows[-1], 1),
            "vs_baseline_min": round(tpu_windows[0] / torch_windows[-1], 2),
            "vs_baseline_max": round(tpu_windows[-1] / torch_windows[0], 2),
            "windows": len(tpu_windows),
        },
    }), flush=True)


if __name__ == "__main__":
    main()
