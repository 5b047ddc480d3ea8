"""End-to-end training driver (the role of the reference's ``main()``,
ref: backend/main.py:158-313), TPU-first.

Pipeline: tokenizer + GloVe table -> triplet datasets -> jitted train step ->
per-epoch Batch/Corpus evaluation -> artifact export -> qualitative test
eval. Differences from the reference loop:

- one compiled XLA program per step (vs per-op eager dispatch);
- host->device prefetch overlaps input copies with compute (vs torch
  worker processes, backend/main.py:206-212);
- metrics are fetched every ``log_every_steps`` (vs a blocking
  ``loss.item()`` every batch, backend/main.py:261);
- optional mid-training checkpoint/resume (absent in the reference);
- ``--model_path`` eval-only mode preserved (ref: backend/main.py:81-89,
  198-200): loads weights, skips training AND artifact export, runs only
  the test evaluator.
"""

from __future__ import annotations

import argparse
import functools
import itertools
import time
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from twotowermlretrieval_tpu.config import Config
from twotowermlretrieval_tpu.data.batching import (
    TripletBatcher,
    pack_batch,
    unpack_batch,
)
from twotowermlretrieval_tpu.data.glove import load_embedding_table
from twotowermlretrieval_tpu.data.loader import TripletBuilder
from twotowermlretrieval_tpu.encoder import TextEncoder
from twotowermlretrieval_tpu.models.two_tower import TwoTowerSpec, init_two_tower
from twotowermlretrieval_tpu.tokenizer import Tokenizer
from twotowermlretrieval_tpu.train.artifacts import save_inference_artifacts
from twotowermlretrieval_tpu.train.checkpoint import CheckpointManager
from twotowermlretrieval_tpu.train.evaluators import BatchEvaluator, CorpusEvaluator, TestEvaluator
from twotowermlretrieval_tpu.train.metrics import MetricLogger
from twotowermlretrieval_tpu.train.train_step import (
    create_train_state,
    make_eval_step,
    make_train_step,
    merge_params,
)


def setup(config: Config):
    """Tokenizer + embedding table + runtime-derived config keys
    (ref: backend/main.py:170-185)."""
    tokenizer = Tokenizer.from_pickle(config.word_to_idx_path)
    table = load_embedding_table(config.embeddings_path, tokenizer.vocab_size(), seed=config.seed)
    config = config.replace(vocab_size=tokenizer.vocab_size(), embed_dim=table.shape[1])
    return config, tokenizer, table


def train(
    config: Config,
    use_wandb: bool = False,
    output_root: str | Path = "artifacts",
    checkpoint_dir: Optional[str | Path] = None,
    resume: bool = False,
    model_path: Optional[str | Path] = None,
    run_name: Optional[str] = None,
    profile_dir: Optional[str | Path] = None,
) -> Dict[str, Any]:
    config, tokenizer, table = setup(config)
    builder = TripletBuilder(config)
    datasets = builder.load_datasets(subsample_ratio=config.subsample_ratio)

    spec = TwoTowerSpec.from_config(config)
    rng = jax.random.key(config.seed)
    init_rng, state_rng = jax.random.split(rng)
    params = init_two_tower(init_rng, spec, pretrained_embeddings=table)
    state = create_train_state(state_rng, params, config)

    logger = MetricLogger(use_wandb=use_wandb, wandb_config=config.to_dict(), run_name=run_name)
    results: Dict[str, Any] = {"run_name": logger.run_name}

    eval_step = jax.jit(make_eval_step(spec, config), static_argnums=())
    batch_evaluator = BatchEvaluator()
    corpus_evaluator = CorpusEvaluator(seed=config.seed)

    if model_path is not None:
        # eval-only mode (ref: backend/main.py:81-89, 198-200)
        from twotowermlretrieval_tpu.utils.pytree import load_params_npz

        params = load_params_npz(model_path)
        encoder = TextEncoder(
            params, spec, tokenizer, batch_size=config.batch_size,
            max_query_len=config.max_query_len, max_doc_len=config.max_doc_len,
        )
        results["test_eval"] = TestEvaluator(seed=config.seed).evaluate(
            encoder, datasets.get("test", [])
        )
        logger.finish()
        return results

    train_batcher = TripletBatcher(
        datasets["train"], tokenizer, config.batch_size,
        config.max_query_len, config.max_doc_len,
        length_buckets=config.length_buckets,
    )
    val_batcher = TripletBatcher(
        datasets["validation"], tokenizer, config.batch_size,
        config.max_query_len, config.max_doc_len,
        length_buckets=config.length_buckets,
    )

    # Dispatch granularity: each transfer ships a [k, B, W] stack of packed
    # int32 batch buffers and one jitted call lax.scans k train steps over
    # it. On remote-attached TPUs every dispatch/transfer is a round-trip;
    # k = config.steps_per_dispatch amortizes it.
    K = max(1, int(config.steps_per_dispatch))
    raw_step = make_train_step(spec, config)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state, packed):
        return raw_step(state, unpack_batch(packed, config.max_query_len))

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_multi_step(state, packed_stack):
        def body(st, packed):
            return raw_step(st, unpack_batch(packed, config.max_query_len))

        return jax.lax.scan(body, state, packed_stack)

    ckpt = CheckpointManager(checkpoint_dir) if checkpoint_dir else None
    start_epoch, skip_batches = 0, 0
    if resume and ckpt and ckpt.latest_step() is not None:
        state, position = ckpt.restore(state)
        start_epoch = position.get("epoch", 0)
        skip_batches = position.get("batch_index", 0)

    # Host round-trips are the enemy of the hot loop on remote-attached
    # TPUs (~tens of ms per fetch): the step counter is tracked host-side,
    # per-step metrics stay on device (one jitted running-sum add per
    # dispatch group), and fetches happen only when logging or at epoch end
    # (one stacked transfer each).
    def fetch_metrics(m: Dict[str, jax.Array]) -> Dict[str, float]:
        """Latest step's metrics (values are [k] rows per dispatch group)
        in ONE stacked transfer."""
        keys = sorted(m)
        vals = np.asarray(jnp.stack([jnp.atleast_1d(m[k])[-1] for k in keys]))
        return dict(zip(keys, vals.tolist()))

    def packed_groups(batches):
        """Stack up to K same-shape packed buffers into [k, B, W] arrays
        (a length-bucket width change flushes the current group early)."""
        group: list = []
        for b in batches:
            p = pack_batch(b)
            if group and p.shape != group[0].shape:
                yield np.stack(group)
                group = []
            group.append(p)
            if len(group) == K:
                yield np.stack(group)
                group = []
        if group:
            yield np.stack(group)

    def prefetch_groups(groups, size: int = 2):
        import collections

        q: collections.deque = collections.deque()
        for g in groups:
            q.append(jax.device_put(g))
            if len(q) >= size:
                yield q.popleft()
        while q:
            yield q.popleft()

    # One jitted add per dispatch group keeps the epoch-mean accumulator
    # O(1) on device (summing each group's [k] metric rows into scalars).
    group_accum = jax.jit(
        lambda acc, m: jax.tree.map(
            lambda a, v: a + jnp.sum(jnp.atleast_1d(v)), acc, m
        )
    )
    group_sum = jax.jit(
        lambda m: jax.tree.map(lambda v: jnp.sum(jnp.atleast_1d(v)), m)
    )

    profile_ctx = None
    profile_started_at = None
    t_start = time.time()
    examples_seen = 0
    epoch_metrics_history = []
    step = int(state.step)
    first_dispatch_done = False
    compile_seconds = None
    t_steady = t_start
    steady_baseline = 0
    for epoch in range(start_epoch, config.epochs):
        epoch_seed = config.seed + 1000 + epoch  # deterministic shuffle per epoch
        running = None
        num_batches = 0
        batch_iter = train_batcher.batches(seed=epoch_seed)
        batch_index = 0
        if epoch == start_epoch and skip_batches:
            # deterministic resume: replay the shuffle, skip done work
            batch_iter = itertools.islice(batch_iter, skip_batches, None)
            batch_index = skip_batches
        for stack in prefetch_groups(packed_groups(batch_iter)):
            k = stack.shape[0]
            if (
                profile_dir is not None
                and profile_ctx is None
                and first_dispatch_done
                and step >= 10
            ):
                # capture ~10 steady-state steps, past the compiling first
                # dispatch
                from twotowermlretrieval_tpu.utils.profiling import trace

                profile_ctx = trace(str(profile_dir))
                profile_ctx.__enter__()
                profile_started_at = step
            t_step0 = None if first_dispatch_done else time.time()
            if k > 1:
                state, metrics = train_multi_step(state, stack)
            else:
                state, metrics = train_step(state, stack[0])
            prev_step = step
            step += k
            batch_index += k
            num_batches += k
            examples_seen += config.batch_size * k
            if t_step0 is not None:
                # the first call blocks on (remote) XLA compilation; record
                # it so steady-state throughput can be reported separately
                compile_seconds = time.time() - t_step0
                t_steady = time.time()
                steady_baseline = examples_seen
                first_dispatch_done = True
            if profile_ctx is not None and step >= profile_started_at + 10:
                jax.block_until_ready(metrics)
                profile_ctx.__exit__(None, None, None)
                profile_ctx = None
                profile_dir = None
            if step // config.log_every_steps != prev_step // config.log_every_steps:
                host_metrics = fetch_metrics(metrics)
                host_metrics["examples_per_sec"] = examples_seen / max(time.time() - t_start, 1e-9)
                logger.log({"epoch": epoch + 1, **{f"train_{k}": v for k, v in host_metrics.items()}}, step)
            running = group_sum(metrics) if running is None else group_accum(running, metrics)
            if ckpt and step // config.checkpoint_every_steps != prev_step // config.checkpoint_every_steps:
                ckpt.save(state, {"epoch": epoch, "batch_index": batch_index})

        avg_train = (
            {k: v / max(num_batches, 1) for k, v in fetch_metrics(running).items()}
            if running is not None
            else {}
        )

        # per-epoch evaluation (ref: backend/main.py:275-296)
        batch_metrics, avg_val_loss = batch_evaluator.evaluate(eval_step, state, val_batcher)
        encoder = TextEncoder(
            merge_params(state.trainable, state.frozen), spec, tokenizer,
            batch_size=config.batch_size,
            max_query_len=config.max_query_len, max_doc_len=config.max_doc_len,
        )
        corpus_metrics = corpus_evaluator.evaluate(encoder, datasets["validation"])

        log_data = {
            "epoch": epoch + 1,
            "avg_train_loss": avg_train.get("loss", 0.0),
            "avg_val_loss": avg_val_loss,
        }
        log_data.update({f"batch_{k}": v for k, v in batch_metrics.items()})
        log_data.update({f"corpus_{k}": v for k, v in corpus_metrics.items()})
        logger.log(log_data, step)
        epoch_metrics_history.append(log_data)
        if ckpt:
            ckpt.save(state, {"epoch": epoch + 1, "batch_index": 0})

    elapsed = time.time() - t_start
    results["train_seconds"] = elapsed
    results["examples_per_sec"] = examples_seen / max(elapsed, 1e-9)
    if first_dispatch_done:
        results["compile_seconds"] = compile_seconds
        results["steady_examples_per_sec"] = (examples_seen - steady_baseline) / max(
            time.time() - t_steady, 1e-9
        )
    results["epochs"] = epoch_metrics_history

    # artifact export (ref: backend/main.py:303-304)
    final_params = merge_params(state.trainable, state.frozen)
    output_dir = Path(output_root) / logger.run_name
    save_inference_artifacts(output_dir, final_params, config, tokenizer, datasets)
    results["artifacts_dir"] = str(output_dir)

    # qualitative test eval (ref: backend/main.py:308-313)
    if datasets.get("test"):
        encoder = TextEncoder(
            final_params, spec, tokenizer, batch_size=config.batch_size,
            max_query_len=config.max_query_len, max_doc_len=config.max_doc_len,
        )
        results["test_eval"] = TestEvaluator(seed=config.seed).evaluate(encoder, datasets["test"])

    logger.finish()
    return results


def parse_args():
    parser = argparse.ArgumentParser(description="Two-tower TPU training & evaluation")
    parser.add_argument("--config", "-c", type=str, required=True, help="JSON config path")
    parser.add_argument("--model_path", "-m", type=str, default=None,
                        help="saved model (.npz) for eval-only mode, skipping training")
    parser.add_argument("--wandb", action="store_true", help="log to W&B if available")
    parser.add_argument("--output", type=str, default="artifacts")
    parser.add_argument("--checkpoint_dir", type=str, default=None)
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("--profile_dir", type=str, default=None,
                        help="capture a device trace of steps 10-20 here")
    return parser.parse_args()


def main():
    args = parse_args()
    config = Config.from_json(args.config)
    results = train(
        config,
        use_wandb=args.wandb,
        output_root=args.output,
        checkpoint_dir=args.checkpoint_dir,
        resume=args.resume,
        model_path=args.model_path,
        profile_dir=args.profile_dir,
    )
    if "examples_per_sec" in results:
        print(f"training finished: {results['examples_per_sec']:.1f} examples/s")
    if "artifacts_dir" in results:
        print(f"artifacts: {results['artifacts_dir']}")


if __name__ == "__main__":
    main()
