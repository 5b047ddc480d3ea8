"""Training-layer tests: step mechanics, learning, evaluators, checkpoint,
artifacts, and the end-to-end loop on the synthetic corpus."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from twotowermlretrieval_tpu.data.batching import TripletBatcher
from twotowermlretrieval_tpu.data.loader import TripletBuilder
from twotowermlretrieval_tpu.encoder import TextEncoder
from twotowermlretrieval_tpu.models.two_tower import TwoTowerSpec, init_two_tower
from twotowermlretrieval_tpu.tokenizer import Tokenizer
from twotowermlretrieval_tpu.train.evaluators import (
    BatchEvaluator,
    CorpusEvaluator,
    TestEvaluator,
    ranks_of_diagonal,
)
from twotowermlretrieval_tpu.train.train_step import (
    create_train_state,
    make_eval_step,
    make_train_step,
    merge_params,
    partition_params,
)


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    """Shared small model + data for the module."""
    from twotowermlretrieval_tpu.data.synthetic import generate_corpus, synthetic_config

    out = tmp_path_factory.mktemp("train_synth")
    generate_corpus(out, num_queries=120, num_topics=10, words_per_topic=15, embed_dim=16)
    config = synthetic_config(out, hidden_dim=16, lr=5e-3, batch_size=16)
    config, tokenizer, table = _setup_config(config)
    spec = TwoTowerSpec.from_config(config)
    params = init_two_tower(jax.random.key(0), spec, pretrained_embeddings=table)
    datasets = TripletBuilder(config).load_datasets()
    return config, tokenizer, spec, params, datasets


def _setup_config(config):
    from twotowermlretrieval_tpu.train.loop import setup

    return setup(config)


def _batcher(config, tokenizer, data):
    return TripletBatcher(
        data, tokenizer, config.batch_size, config.max_query_len, config.max_doc_len
    )


# ---------------------------------------------------------------------------
# partition / merge
# ---------------------------------------------------------------------------


def test_partition_frozen_embeddings(setup):
    _, _, _, params, _ = setup
    trainable, frozen = partition_params(params, freeze_embeddings=True)
    assert "embedding" not in trainable["query"]
    assert set(frozen.keys()) == {"query", "doc"}
    merged = merge_params(trainable, frozen)
    assert jax.tree.all(jax.tree.map(lambda a, b: (a == b).all(), merged, params))

    trainable2, frozen2 = partition_params(params, freeze_embeddings=False)
    assert frozen2 == {}
    assert "embedding" in trainable2["query"]


def test_frozen_embeddings_not_updated(setup):
    config, tokenizer, spec, params, datasets = setup
    state = create_train_state(jax.random.key(1), params, config)
    step_fn = jax.jit(make_train_step(spec, config))
    batch = next(iter(_batcher(config, tokenizer, datasets["train"]).batches(seed=0)))
    dev = jax.tree.map(jnp.asarray, batch)
    new_state, metrics = step_fn(state, dev)
    np.testing.assert_array_equal(
        np.asarray(new_state.frozen["query"]["embedding"]),
        np.asarray(state.frozen["query"]["embedding"]),
    )
    # trainable params did move
    old = np.asarray(state.trainable["query"]["layers"][0]["fwd"]["w_ih"])
    new = np.asarray(new_state.trainable["query"]["layers"][0]["fwd"]["w_ih"])
    assert np.abs(old - new).max() > 0
    assert float(metrics["grad_norm"]) > 0


def test_train_step_metrics_and_grad_clip(setup):
    config, tokenizer, spec, params, datasets = setup
    config = config.replace(grad_clip_norm=1e-8)  # clip ~everything
    state = create_train_state(jax.random.key(1), params, config)
    step_fn = jax.jit(make_train_step(spec, config))
    batch = next(iter(_batcher(config, tokenizer, datasets["train"]).batches(seed=0)))
    new_state, metrics = step_fn(state, jax.tree.map(jnp.asarray, batch))
    for key in ("loss", "triplet_accuracy", "similarity_gap", "pos_similarity",
                "neg_similarity", "query_magnitude", "doc_magnitude", "grad_norm"):
        assert key in metrics
    # with a near-zero clip, the update magnitude is bounded but nonzero
    delta = jax.tree.map(
        lambda a, b: np.abs(np.asarray(a) - np.asarray(b)).max(),
        new_state.trainable, state.trainable,
    )
    assert max(jax.tree.leaves(delta)) < 0.2  # adam lr bound


def test_triplet_metrics_off_skips_negative_encode(setup):
    """TRIPLET_METRICS=false with a pure in-batch loss: the loss value and
    the parameter update are IDENTICAL to the with-negative run (the
    explicit negative never reaches the in-batch gradient), only the
    neg-dependent metric keys disappear — and the doc tower encodes half
    the rows."""
    config, tokenizer, spec, params, datasets = setup
    batch = next(iter(_batcher(config, tokenizer, datasets["train"]).batches(seed=0)))
    dev = jax.tree.map(jnp.asarray, batch)

    results = {}
    for flag in (True, False):
        cfg = config.replace(loss_type="in_batch", triplet_metrics=flag)
        state = create_train_state(jax.random.key(1), params, cfg)
        step_fn = jax.jit(make_train_step(spec, cfg))
        new_state, metrics = step_fn(state, dev)
        results[flag] = (new_state, metrics)

    m_on, m_off = results[True][1], results[False][1]
    np.testing.assert_allclose(
        float(m_off["loss"]), float(m_on["loss"]), rtol=1e-6, atol=1e-7
    )
    for key in ("triplet_accuracy", "similarity_gap", "neg_similarity"):
        assert key in m_on and key not in m_off
    assert "pos_similarity" in m_off
    # the in-batch top-1 accuracy replaces the dropped triplet signal
    for m in (m_on, m_off):
        assert 0.0 <= float(m["in_batch_accuracy"]) <= 1.0
    # updates identical: the negative contributed nothing to the gradient
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
        ),
        results[False][0].trainable,
        results[True][0].trainable,
    )


def test_triplet_metrics_flag_ignored_when_loss_needs_negatives(setup):
    """TRIPLET_METRICS=false must be a no-op for loss types that READ the
    explicit negative ('triplet', 'triplet+in_batch'): the negative is
    still encoded, the loss is unchanged, and the triplet metric set is
    still reported — the flag only ever removes work that is provably
    dead."""
    config, tokenizer, spec, params, datasets = setup
    batch = next(iter(_batcher(config, tokenizer, datasets["train"]).batches(seed=0)))
    dev = jax.tree.map(jnp.asarray, batch)
    for loss_type in ("triplet", "triplet+in_batch"):
        losses = {}
        for flag in (True, False):
            cfg = config.replace(loss_type=loss_type, triplet_metrics=flag)
            state = create_train_state(jax.random.key(1), params, cfg)
            _, metrics = jax.jit(make_train_step(spec, cfg))(state, dev)
            assert "neg_similarity" in metrics, (loss_type, flag)
            losses[flag] = float(metrics["loss"])
        assert losses[True] == losses[False], loss_type


def test_loss_decreases_and_model_learns(setup):
    config, tokenizer, spec, params, datasets = setup
    # copy: donation below would delete the module-scoped fixture's buffers
    params = jax.tree.map(jnp.array, params)
    state = create_train_state(jax.random.key(1), params, config)
    step_fn = jax.jit(make_train_step(spec, config), donate_argnums=(0,))
    batcher = _batcher(config, tokenizer, datasets["train"])
    losses = []
    for epoch in range(8):
        for batch in batcher.batches(seed=epoch):
            state, metrics = step_fn(state, jax.tree.map(jnp.asarray, batch))
            losses.append(float(metrics["loss"]))
    first, last = np.mean(losses[:5]), np.mean(losses[-5:])
    assert last < first * 0.8, f"loss did not decrease: {first} -> {last}"


# ---------------------------------------------------------------------------
# evaluators
# ---------------------------------------------------------------------------


def test_ranks_of_diagonal():
    sim = np.array([[0.9, 0.1, 0.2], [0.8, 0.3, 0.1], [0.5, 0.6, 0.4]])
    # row0: diag 0.9 is max -> rank 1; row1: diag 0.3 below 0.8 -> rank 2;
    # row2: diag 0.4 below 0.5,0.6 -> rank 3
    np.testing.assert_array_equal(ranks_of_diagonal(sim), [1, 2, 3])


def test_batch_evaluator_protocol(setup):
    config, tokenizer, spec, params, datasets = setup
    state = create_train_state(jax.random.key(1), params, config)
    from twotowermlretrieval_tpu.data.batching import unpack_batch

    raw_eval = make_eval_step(spec, config)
    eval_step = jax.jit(
        lambda st, packed: raw_eval(st, unpack_batch(packed, config.max_query_len))
    )
    metrics, val_loss = BatchEvaluator().evaluate(
        eval_step, state, _batcher(config, tokenizer, datasets["validation"])
    )
    assert set(metrics) == {"Recall@1", "Recall@5", "Recall@10", "MRR"}
    assert 0 <= metrics["Recall@1"] <= metrics["Recall@5"] <= metrics["Recall@10"] <= 1
    assert metrics["MRR"] >= metrics["Recall@1"]
    assert val_loss > 0


def test_corpus_evaluator_protocol(setup):
    config, tokenizer, spec, params, datasets = setup
    encoder = TextEncoder(params, spec, tokenizer, batch_size=32,
                          max_query_len=config.max_query_len, max_doc_len=config.max_doc_len)
    ev = CorpusEvaluator(max_candidates=30, max_queries=10, seed=0)
    metrics = ev.evaluate(encoder, datasets["validation"])
    assert set(metrics) == {"Recall@1", "Recall@5", "Recall@10", "Hit@1", "Hit@5", "Hit@10"}
    for k in (1, 5, 10):
        assert metrics[f"Hit@{k}"] >= metrics[f"Recall@{k}"] - 1e-9
    # deterministic given the seed
    metrics2 = CorpusEvaluator(max_candidates=30, max_queries=10, seed=0).evaluate(
        encoder, datasets["validation"]
    )
    assert metrics == metrics2
    assert ev.evaluate(encoder, []) == {}


def test_test_evaluator(setup):
    config, tokenizer, spec, params, datasets = setup
    encoder = TextEncoder(params, spec, tokenizer, batch_size=32,
                          max_query_len=config.max_query_len, max_doc_len=config.max_doc_len)
    lines = []
    results = TestEvaluator(num_examples=3, top_k=4, seed=0).evaluate(
        encoder, datasets["test"], print_fn=lines.append
    )
    assert len(results) == 3
    assert all(len(r["retrieved"]) == 4 for r in results)
    assert any("Query:" in line for line in lines)


# ---------------------------------------------------------------------------
# checkpoint
# ---------------------------------------------------------------------------


def test_checkpoint_roundtrip(setup, tmp_path):
    from twotowermlretrieval_tpu.train.checkpoint import CheckpointManager

    config, tokenizer, spec, params, datasets = setup
    state = create_train_state(jax.random.key(1), params, config)
    step_fn = jax.jit(make_train_step(spec, config))
    batch = next(iter(_batcher(config, tokenizer, datasets["train"]).batches(seed=0)))
    state, _ = step_fn(state, jax.tree.map(jnp.asarray, batch))

    mgr = CheckpointManager(tmp_path / "ckpt", max_to_keep=2)
    mgr.save(state, {"epoch": 0, "batch_index": 1})

    template = create_train_state(jax.random.key(1), params, config)
    restored, position = mgr.restore(template)
    assert position == {"epoch": 0, "batch_index": 1}
    assert int(restored.step) == 1
    chex = pytest.importorskip("chex")
    chex.assert_trees_all_close(restored.trainable, state.trainable)
    chex.assert_trees_all_close(restored.opt_state, state.opt_state)
    # rng stream continues identically
    np.testing.assert_array_equal(
        jax.random.key_data(restored.rng), jax.random.key_data(state.rng)
    )


def test_checkpoint_gc(setup, tmp_path):
    from twotowermlretrieval_tpu.train.checkpoint import CheckpointManager

    config, _, _, params, _ = setup
    state = create_train_state(jax.random.key(1), params, config)
    mgr = CheckpointManager(tmp_path / "ckpt", max_to_keep=2)
    for step in (1, 2, 3, 4):
        mgr.save(state._replace(step=jnp.asarray(step, jnp.int32)))
    assert mgr.all_steps() == [3, 4]
    assert mgr.latest_step() == 4


# ---------------------------------------------------------------------------
# pytree npz roundtrip
# ---------------------------------------------------------------------------


def test_params_npz_roundtrip(setup, tmp_path):
    from twotowermlretrieval_tpu.utils.pytree import load_params_npz, save_params_npz

    _, _, _, params, _ = setup
    save_params_npz(tmp_path / "model.npz", params)
    loaded = load_params_npz(tmp_path / "model.npz")
    assert jax.tree.structure(jax.tree.map(np.asarray, params)) == jax.tree.structure(loaded)
    assert jax.tree.all(jax.tree.map(lambda a, b: (np.asarray(a) == b).all(), params, loaded))
    # layers tuple survives as a tuple
    assert isinstance(loaded["query"]["layers"], tuple)


def test_step_timer():
    import jax
    import jax.numpy as jnp

    from twotowermlretrieval_tpu.utils.profiling import StepTimer

    timer = StepTimer()
    fn = jax.jit(lambda x: x * 2 + 1)
    x = jnp.ones((128, 128))
    for _ in range(5):
        x = timer.run(fn, x)
    summary = timer.summary()
    assert set(summary) == {
        "dispatch_ms_p50", "blocked_ms_p50", "step_ms_p50", "step_ms_p99",
        "host_bound_fraction",
    }
    assert summary["step_ms_p50"] >= 0
    assert 0 <= summary["host_bound_fraction"] <= 1
    assert StepTimer().summary() == {}


def test_profile_trace_writes_files(tmp_path):
    import jax
    import jax.numpy as jnp

    from twotowermlretrieval_tpu.utils.profiling import annotate, trace

    fn = jax.jit(lambda x: jnp.sum(x * x))
    with trace(str(tmp_path / "trace")):
        with annotate("test_region"):
            fn(jnp.ones((64, 64))).block_until_ready()
    produced = list((tmp_path / "trace").rglob("*"))
    assert produced, "trace directory is empty"


def test_per_leaf_param_stats_logged(setup):
    """config.log_param_stats adds grad_norm/<leaf> and param_norm/<leaf>
    to the step metrics (the reference's wandb.watch role,
    backend/main.py:234); consistent with the scalar grad_norm."""
    config, tokenizer, spec, params, datasets = setup
    config = config.replace(log_param_stats=True)
    state = create_train_state(jax.random.key(1), params, config)
    step_fn = jax.jit(make_train_step(spec, config))
    batch = next(iter(_batcher(config, tokenizer, datasets["train"]).batches(seed=0)))
    _, metrics = step_fn(state, jax.tree.map(jnp.asarray, batch))
    leaf_keys = [k for k in metrics if k.startswith("grad_norm/")]
    assert leaf_keys, "no per-leaf grad norms"
    assert any("w_ih" in k for k in leaf_keys)
    assert all(float(metrics[k]) >= 0 for k in leaf_keys)
    # per-leaf squared norms sum to the global grad norm
    total = np.sqrt(sum(float(metrics[k]) ** 2 for k in leaf_keys))
    assert total == pytest.approx(float(metrics["grad_norm"]), rel=1e-5)
    param_keys = [k for k in metrics if k.startswith("param_norm/")]
    assert len(param_keys) == len(leaf_keys)


def test_corrupt_position_file_resumes_with_warning(setup, tmp_path, capsys):
    """A torn data-position JSON must not silently resume from epoch 0
    without notice (r2 review): restore returns {} plus a warning."""
    from twotowermlretrieval_tpu.train.checkpoint import CheckpointManager

    config, tokenizer, spec, params, datasets = setup
    state = create_train_state(jax.random.key(1), params, config)
    ckpt = CheckpointManager(tmp_path / "c")
    ckpt.save(state, {"epoch": 1, "batch_index": 5})
    # tear the position file
    pos = tmp_path / "c" / f"step_{int(state.step):08d}.position.json"
    pos.write_text('{"epoch": 1, "batch')
    restored, position = ckpt.restore(state)
    assert position == {}
    assert "corrupt data-position" in capsys.readouterr().out


def test_ranks_tie_handling_is_positional():
    """Exactly-tied scores (all-zero OOV rows, duplicated passages) must
    rank positionally like a stable sort, not all claim rank 1
    (r2 review: strictly-greater counting inflated MRR/Recall@1)."""
    sim = np.zeros((4, 4), np.float32)  # every score tied at 0.0
    np.testing.assert_array_equal(ranks_of_diagonal(sim), [1, 2, 3, 4])
    # a duplicated doc tying the positive: earlier column wins the tie
    row = np.array([0.5, 0.9, 0.9, 0.1], np.float32)
    sim = np.vstack([row, row, row, row])
    assert ranks_of_diagonal(sim)[1] == 1  # positive at col 1; tie at col 2 ranks after
    assert ranks_of_diagonal(sim)[2] == 2  # positive at col 2; tie at col 1 ranks first


def test_resume_with_length_buckets_and_dispatch_groups(setup, tmp_path):
    """Group-granular resume must replay the buffered per-width grouping
    deterministically: checkpoint mid-epoch with length buckets and
    steps_per_dispatch > 1, resume, and finish without loss of batches
    (r2 review: flush-on-width-change previously collapsed groups)."""
    from twotowermlretrieval_tpu.data.synthetic import generate_corpus, synthetic_config
    from twotowermlretrieval_tpu.train.loop import train

    out = tmp_path / "c"
    generate_corpus(out, num_queries=100, num_topics=8, words_per_topic=15, embed_dim=16)
    config = synthetic_config(out, hidden_dim=16, lr=5e-3, batch_size=16, epochs=1,
                              length_buckets=[8, 16], steps_per_dispatch=4)
    config = config.replace(checkpoint_every_steps=4)
    ckpt = tmp_path / "ck"
    r1 = train(config, output_root=tmp_path / "a", checkpoint_dir=ckpt, run_name="r1")
    assert np.isfinite(r1["epochs"][-1]["avg_train_loss"])
    r2 = train(config.replace(epochs=2), output_root=tmp_path / "b",
               checkpoint_dir=ckpt, resume=True, run_name="r2")
    assert np.isfinite(r2["epochs"][-1]["avg_train_loss"])


def test_param_histograms_logged(setup):
    """config.log_param_histograms adds grad_hist/<leaf> and
    param_hist/<leaf> fixed-bin counts (+ their _max range bounds) to the
    step metrics — full wandb.watch histogram parity
    (ref: backend/main.py:234)."""
    from twotowermlretrieval_tpu.train.train_step import HISTOGRAM_BINS

    config, tokenizer, spec, params, datasets = setup
    config = config.replace(log_param_histograms=True)
    state = create_train_state(jax.random.key(1), params, config)
    step_fn = jax.jit(make_train_step(spec, config))
    batch = next(iter(_batcher(config, tokenizer, datasets["train"]).batches(seed=0)))
    _, metrics = step_fn(state, jax.tree.map(jnp.asarray, batch))
    hist_keys = [k for k in metrics if k.startswith("grad_hist/")]
    assert hist_keys, "no per-leaf gradient histograms"
    for k in hist_keys:
        counts = np.asarray(metrics[k])
        assert counts.shape == (HISTOGRAM_BINS,)
        leaf = state.trainable
        for part in k.split("/")[1:]:
            leaf = leaf[int(part)] if part.isdigit() else leaf[part]
        assert counts.sum() == np.asarray(leaf).size  # every element binned
        mx = float(metrics[k.replace("grad_hist/", "grad_hist_max/")])
        assert mx >= 0
    param_keys = [k for k in metrics if k.startswith("param_hist/")]
    assert len(param_keys) == len(hist_keys)
    # param histogram range bound equals the leaf's true absmax
    k0 = param_keys[0]
    leaf = state.trainable
    for part in k0.split("/")[1:]:
        leaf = leaf[int(part)] if part.isdigit() else leaf[part]
    assert float(metrics[k0.replace("param_hist/", "param_hist_max/")]) == pytest.approx(
        float(np.abs(np.asarray(leaf)).max()), rel=1e-6
    )


def test_wandb_does_not_force_param_stats(tmp_path, capsys):
    """An explicit LOG_PARAM_STATS: false survives --wandb (VERDICT r2
    item 10: the override used to be silently forced on), while the
    tri-state default (None) still auto-enables histograms under wandb —
    so one run shows hist/ metrics but no per-leaf norms."""
    import json as _json

    from twotowermlretrieval_tpu.data.synthetic import generate_corpus, synthetic_config
    from twotowermlretrieval_tpu.train.loop import train

    out = tmp_path / "c"
    generate_corpus(out, num_queries=60, num_topics=6, words_per_topic=12, embed_dim=16)
    config = synthetic_config(out, hidden_dim=16, batch_size=16, epochs=1)
    config = config.replace(log_param_stats=False, log_every_steps=1)
    train(config, use_wandb=True, output_root=tmp_path / "a", run_name="nostats")

    records = []
    for line in capsys.readouterr().out.splitlines():
        try:
            records.append(_json.loads(line))
        except ValueError:
            continue
    step_records = [r for r in records if any(k.startswith("train_") for k in r)]
    assert step_records, "no train metric records logged"
    all_keys = {k for r in step_records for k in r}
    # explicit False wins over wandb: no per-leaf norms
    assert not any(k.startswith("train_grad_norm/") for k in all_keys)
    # tri-state None + wandb: histograms ride the JSONL stream
    hist_keys = [k for k in all_keys if k.startswith("train_grad_hist/")]
    assert hist_keys, "no histogram metrics in the JSONL stream"
    rec = next(r for r in step_records if hist_keys[0] in r)
    from twotowermlretrieval_tpu.train.train_step import HISTOGRAM_BINS

    assert len(rec[hist_keys[0]]) == HISTOGRAM_BINS


def test_resume_restarts_epoch_on_grouping_mismatch(setup, tmp_path, capsys):
    """A mid-epoch checkpoint whose data-position payload carries a
    different (or missing) grouping tag cannot map batch_index onto the
    current group order — resume must restart the epoch with a warning
    instead of silently skipping a different prefix (ADVICE r2)."""
    from twotowermlretrieval_tpu.data.synthetic import generate_corpus, synthetic_config
    from twotowermlretrieval_tpu.train.checkpoint import CheckpointManager
    from twotowermlretrieval_tpu.train.loop import train

    out = tmp_path / "c"
    generate_corpus(out, num_queries=60, num_topics=6, words_per_topic=12, embed_dim=16)
    config = synthetic_config(out, hidden_dim=16, batch_size=16, epochs=1)

    # seed a checkpoint whose position predates the grouping tag
    from twotowermlretrieval_tpu.models.two_tower import TwoTowerSpec, init_two_tower
    from twotowermlretrieval_tpu.train.loop import setup as loop_setup

    cfg2, tokenizer, table = loop_setup(config)
    spec = TwoTowerSpec.from_config(cfg2)
    params = init_two_tower(jax.random.key(0), spec, pretrained_embeddings=table)
    state = create_train_state(jax.random.key(1), params, cfg2)
    ckpt_dir = tmp_path / "ck"
    CheckpointManager(ckpt_dir).save(state, {"epoch": 0, "batch_index": 2})

    res = train(config, output_root=tmp_path / "a", checkpoint_dir=ckpt_dir,
                resume=True, run_name="regroup")
    assert "restarting epoch 0 from batch 0" in capsys.readouterr().out
    assert np.isfinite(res["epochs"][-1]["avg_train_loss"])


def test_shipped_config_files_parse_and_validate():
    """Every configs/*.json in the repo must load into a valid Config and
    build a TwoTowerSpec — catches key-name drift in the shipped example
    configs (e.g. the round-5 TRIPLET_METRICS addition to
    configs/transformer_tp.json)."""
    import pathlib

    from twotowermlretrieval_tpu.config import Config

    cfg_dir = pathlib.Path(__file__).resolve().parent.parent / "configs"
    files = sorted(cfg_dir.glob("*.json"))
    assert files, f"no shipped configs found under {cfg_dir}"
    for f in files:
        cfg = Config.from_json(f)
        spec = TwoTowerSpec.from_config(cfg)
        assert spec is not None, f.name
        if f.name == "transformer_tp.json":
            assert cfg.tower_type == "transformer"
            assert cfg.loss_type == "in_batch" and cfg.triplet_metrics is False
