"""Distributed-path tests on the 8-device virtual CPU mesh: DP training
equivalence, cross-device negatives, row-sharded embeddings (values AND
gradients), distributed top-k, and the graft entry contract."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from twotowermlretrieval_tpu.config import Config
from twotowermlretrieval_tpu.data.batching import Batch
from twotowermlretrieval_tpu.models.rnn import RNNSpec, init_rnn_encoder, rnn_encode
from twotowermlretrieval_tpu.models.two_tower import TwoTowerSpec, init_two_tower
from twotowermlretrieval_tpu.parallel.distributed import (
    make_distributed_eval_step,
    make_distributed_train_step,
    replicate_state,
)
from twotowermlretrieval_tpu.parallel.embedding import sharded_embedding_lookup
from twotowermlretrieval_tpu.parallel.mesh import batch_sharding, make_mesh
from twotowermlretrieval_tpu.parallel.topk import distributed_topk, shard_corpus
from twotowermlretrieval_tpu.ops.topk import topk_oracle
from twotowermlretrieval_tpu.train.train_step import (
    create_train_state,
    make_train_step,
    merge_params,
)


def _config(**kw):
    base = dict(
        vocab_size=64,
        embed_dim=16,
        hidden_dim=16,
        num_layers=1,
        bidirectional=False,
        dropout=0.0,
        batch_size=16,
        max_query_len=8,
        max_doc_len=8,
        compute_dtype="float32",
        lr=1e-2,
        loss_type="triplet",
        cross_device_negatives=False,
    )
    base.update(kw)
    return Config(**base)


def _batch(rng, B, L=8, vocab=64):
    def tok():
        t = rng.integers(1, vocab, (B, L)).astype(np.int32)
        return jnp.asarray(t)

    lens = jnp.asarray(rng.integers(1, L + 1, (B,)).astype(np.int32))
    return Batch(tok(), lens, tok(), lens, tok(), lens, jnp.ones((B,), jnp.float32))


# ---------------------------------------------------------------------------
# DP equivalence: distributed step == single-device step
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "loss_type,triplet_metrics",
    [("triplet", True), ("triplet+in_batch", True), ("in_batch", False)],
    ids=["triplet", "triplet+in_batch", "in_batch-negskip"],
)
def test_distributed_matches_single_device(loss_type, triplet_metrics):
    """Distributed loss AND pmean-reduced gradients must equal the
    single-device full-batch computation. (Post-Adam params are NOT directly
    comparable: Adam's first step is ~±lr*sign(g), so fp reduction-order
    noise on near-zero gradient components flips signs.)

    For the in-batch loss, equivalence requires gathering negatives across
    chips (B_local -> B_global). The in_batch-negskip case additionally
    covers TRIPLET_METRICS=false (the negative's tower pass skipped)
    under shard_map."""
    from twotowermlretrieval_tpu.train.train_step import _forward_and_metrics, partition_params

    config = _config(
        loss_type=loss_type, cross_device_negatives=True, dropout=0.0,
        triplet_metrics=triplet_metrics,
    )
    spec = TwoTowerSpec.from_config(config)
    params = init_two_tower(jax.random.key(0), spec)
    batch = _batch(np.random.default_rng(0), config.batch_size)
    trainable, frozen = partition_params(params, config.freeze_embeddings)

    def make_loss(axis_name):
        def loss_fn(trainable, batch):
            merged = merge_params(trainable, frozen)
            loss, _ = _forward_and_metrics(
                merged, batch, spec, config, None, train=False, axis_name=axis_name
            )
            return loss
        return loss_fn

    loss1, grads1 = jax.value_and_grad(make_loss(None))(trainable, batch)

    mesh = make_mesh(data=8, model=1)

    def dist_grad(trainable, batch):
        loss, grads = jax.value_and_grad(make_loss("data"))(trainable, batch)
        return jax.lax.pmean(loss, "data"), jax.lax.pmean(grads, "data")

    mapped = jax.shard_map(
        dist_grad, mesh=mesh, in_specs=(P(), _batch_p()), out_specs=(P(), P()),
        check_vma=False,
    )
    loss8, grads8 = mapped(trainable, batch)

    assert abs(float(loss1) - float(loss8)) < 1e-6
    chex = pytest.importorskip("chex")
    chex.assert_trees_all_close(
        jax.tree.map(np.asarray, grads1), jax.tree.map(np.asarray, grads8),
        atol=1e-6, rtol=1e-5,
    )


def _batch_p():
    return Batch(*([P("data")] * len(Batch._fields)))


def test_distributed_train_step_runs_and_updates():
    """End-to-end distributed step: state advances, loss finite, params move."""
    config = _config(loss_type="triplet", dropout=0.0)
    spec = TwoTowerSpec.from_config(config)
    params = init_two_tower(jax.random.key(0), spec)
    batch = _batch(np.random.default_rng(0), config.batch_size)
    mesh = make_mesh(data=8, model=1)
    state = create_train_state(jax.random.key(1), jax.tree.map(jnp.array, params), config)
    state = replicate_state(state, mesh)
    before = np.asarray(state.trainable["query"]["layers"][0]["fwd"]["w_ih"]).copy()
    dist = make_distributed_train_step(spec, config, mesh, state)
    dev_batch = jax.tree.map(lambda x: jax.device_put(x, batch_sharding(mesh)), batch)
    state, metrics = dist(state, dev_batch)
    assert int(state.step) == 1
    assert np.isfinite(float(metrics["loss"]))
    after = np.asarray(state.trainable["query"]["layers"][0]["fwd"]["w_ih"])
    assert np.abs(after - before).max() > 0


def test_cross_device_negatives_change_loss():
    """With in-batch loss, gathering negatives across chips must change the
    per-chip loss (B_local=2 -> B_global=16 negatives)."""
    config = _config(loss_type="in_batch", batch_size=16)
    spec = TwoTowerSpec.from_config(config)
    params = init_two_tower(jax.random.key(0), spec)
    batch = _batch(np.random.default_rng(0), config.batch_size)
    mesh = make_mesh(data=8, model=1)
    dev_batch = jax.tree.map(lambda x: jax.device_put(x, batch_sharding(mesh)), batch)

    losses = {}
    for flag in (False, True):
        cfg = config.replace(cross_device_negatives=flag)
        state = create_train_state(jax.random.key(1), jax.tree.map(jnp.array, params), cfg)
        state = replicate_state(state, mesh)
        step = make_distributed_train_step(spec, cfg, mesh, state)
        _, metrics = step(state, dev_batch)
        losses[flag] = float(metrics["loss"])
    # more negatives -> harder task -> larger softmax loss
    assert losses[True] > losses[False]


def test_cross_device_in_batch_matches_global():
    """in_batch loss with all_gather over 8 chips == single-device loss on
    the full batch (the whole point of cross-device negative sharing)."""
    from twotowermlretrieval_tpu.models.losses import in_batch_softmax_loss

    rng = np.random.default_rng(1)
    q = rng.normal(size=(16, 8)).astype(np.float32)
    d = rng.normal(size=(16, 8)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    global_loss = float(in_batch_softmax_loss(jnp.asarray(q), jnp.asarray(d), 0.1))

    mesh = make_mesh(data=8, model=1)
    mapped = jax.shard_map(
        lambda q, d: in_batch_softmax_loss(q, d, 0.1, axis_name="data").reshape(1),
        mesh=mesh,
        in_specs=(P("data"), P("data")),
        out_specs=P("data"),
        check_vma=False,
    )
    per_chip = np.asarray(mapped(jnp.asarray(q), jnp.asarray(d)))
    assert per_chip.shape == (8,)
    assert abs(per_chip.mean() - global_loss) < 1e-5


# ---------------------------------------------------------------------------
# row-sharded embedding
# ---------------------------------------------------------------------------


def test_sharded_embedding_lookup_matches_take():
    mesh = make_mesh(data=1, model=8)
    rng = np.random.default_rng(2)
    table = jnp.asarray(rng.normal(size=(64, 16)).astype(np.float32))
    tokens = jnp.asarray(rng.integers(0, 64, (4, 8)).astype(np.int32))

    mapped = jax.shard_map(
        lambda t, tok: sharded_embedding_lookup(t, tok, "model"),
        mesh=mesh,
        in_specs=(P("model", None), P()),
        out_specs=P(),
        check_vma=False,
    )
    out = np.asarray(mapped(table, tokens))
    ref = np.asarray(jnp.take(table, tokens, axis=0))
    np.testing.assert_allclose(out, ref, rtol=1e-6)


def test_sharded_embedding_gradient_matches():
    """Backward through the psum+masked-gather must equal the dense
    scatter-add gradient (per-shard rows only)."""
    mesh = make_mesh(data=1, model=8)
    rng = np.random.default_rng(3)
    table = jnp.asarray(rng.normal(size=(64, 16)).astype(np.float32))
    tokens = jnp.asarray(rng.integers(0, 64, (4, 8)).astype(np.int32))
    target = jnp.asarray(rng.normal(size=(4, 8, 16)).astype(np.float32))

    def dense_loss(table):
        x = jnp.take(table, tokens, axis=0)
        return jnp.sum((x - target) ** 2)

    ref_grad = np.asarray(jax.grad(dense_loss)(table))

    def sharded_loss(table_shard):
        x = sharded_embedding_lookup(table_shard, tokens, "model")
        return jnp.sum((x - target) ** 2)

    mapped = jax.shard_map(
        jax.grad(sharded_loss),
        mesh=mesh,
        in_specs=(P("model", None),),
        out_specs=P("model", None),
        check_vma=False,
    )
    grad = np.asarray(mapped(table))
    np.testing.assert_allclose(grad, ref_grad, rtol=1e-5, atol=1e-6)


def test_rnn_encode_with_sharded_table():
    """Full encoder under shard_map with a row-sharded table == dense."""
    mesh = make_mesh(data=1, model=8)
    spec_dense = RNNSpec(vocab_size=64, embed_dim=16, hidden_dim=16,
                         normalize_output=True, compute_dtype="float32")
    spec_sharded = RNNSpec(vocab_size=64, embed_dim=16, hidden_dim=16,
                           normalize_output=True, compute_dtype="float32",
                           embedding_axis="model")
    params = init_rnn_encoder(jax.random.key(0), spec_dense)
    rng = np.random.default_rng(4)
    tokens = jnp.asarray(rng.integers(1, 64, (4, 8)).astype(np.int32))
    lengths = jnp.asarray(rng.integers(1, 9, (4,)).astype(np.int32))
    ref = np.asarray(rnn_encode(params, tokens, lengths, spec_dense))

    param_specs = jax.tree_util.tree_map_with_path(
        lambda path, leaf: P("model", None)
        if any(isinstance(p, jax.tree_util.DictKey) and p.key == "embedding" for p in path)
        else P(),
        params,
    )
    mapped = jax.shard_map(
        lambda p, t, l: rnn_encode(p, t, l, spec_sharded),
        mesh=mesh,
        in_specs=(param_specs, P(), P()),
        out_specs=P(),
        check_vma=False,
    )
    out = np.asarray(mapped(params, tokens, lengths))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# distributed top-k
# ---------------------------------------------------------------------------


def test_distributed_topk_matches_oracle():
    mesh = make_mesh(data=8, model=1)
    rng = np.random.default_rng(5)
    q = rng.normal(size=(4, 16)).astype(np.float32)
    d = rng.normal(size=(1000, 16)).astype(np.float32)  # not a multiple of 8
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    d /= np.linalg.norm(d, axis=1, keepdims=True)

    docs_sharded, n_valid = shard_corpus(d, mesh)
    vals, ids = distributed_topk(
        jnp.asarray(q), docs_sharded, k=20, mesh=mesh, n_valid=n_valid,
        use_pallas=False,
    )
    ref_vals, ref_ids = topk_oracle(jnp.asarray(q), jnp.asarray(d), 20)
    np.testing.assert_allclose(np.asarray(vals), np.asarray(ref_vals), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(ref_ids))
    assert (np.asarray(ids) < 1000).all()


def test_distributed_topk_gather_sorted_matches_oracle():
    """The shard-local segmax kernels accept the phase-2 variants
    (score-cache gather, sorted candidate gathers) through the
    distributed merge without changing results."""
    mesh = make_mesh(data=8, model=1)
    rng = np.random.default_rng(5)
    q = rng.normal(size=(4, 16)).astype(np.float32)
    d = rng.normal(size=(1000, 16)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    d /= np.linalg.norm(d, axis=1, keepdims=True)

    docs_sharded, n_valid = shard_corpus(d, mesh)
    vals, ids = distributed_topk(
        jnp.asarray(q), docs_sharded, k=20, mesh=mesh, n_valid=n_valid,
        use_pallas=True, interpret=True, phase2="gather",
        sort_candidates=True,
    )
    ref_vals, ref_ids = topk_oracle(jnp.asarray(q), jnp.asarray(d), 20)
    np.testing.assert_allclose(np.asarray(vals), np.asarray(ref_vals), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(ref_ids))


def test_distributed_topk_all_negative_scores():
    # padding rows must not leak in when all real scores are negative
    mesh = make_mesh(data=8, model=1)
    rng = np.random.default_rng(6)
    q = -np.abs(rng.normal(size=(2, 8))).astype(np.float32)
    d = np.abs(rng.normal(size=(333, 8))).astype(np.float32)
    docs_sharded, n_valid = shard_corpus(d, mesh)
    vals, ids = distributed_topk(
        jnp.asarray(q), docs_sharded, k=5, mesh=mesh, n_valid=n_valid, use_pallas=False
    )
    assert (np.asarray(ids) < 333).all()
    assert (np.asarray(vals) < 0).all()


# ---------------------------------------------------------------------------
# graft entry contract
# ---------------------------------------------------------------------------


def test_graft_entry_forward():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    fwd, args = ge.entry()
    q, d = jax.jit(fwd)(*args)
    assert q.shape[0] == d.shape[0]
    assert np.isfinite(np.asarray(q)).all()


def test_graft_entry_dryrun_multichip():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_distributed_topk_int8_matches_local():
    """int8 sharded retrieval over the 8-device mesh == unsharded int8."""
    from twotowermlretrieval_tpu.ops.topk import quantize_rows, topk_segmented_int8
    from twotowermlretrieval_tpu.parallel.mesh import make_mesh
    from twotowermlretrieval_tpu.parallel.topk import (
        distributed_topk_int8,
        shard_corpus_int8,
    )

    rng = np.random.default_rng(0)
    docs = rng.standard_normal((1000, 64)).astype(np.float32)
    docs /= np.linalg.norm(docs, axis=1, keepdims=True)
    q = rng.standard_normal((8, 64)).astype(np.float32)
    mesh = make_mesh(data=8, model=1)
    values_sh, scales_sh, n_valid = shard_corpus_int8(docs, mesh)
    dv, di = distributed_topk_int8(
        jnp.asarray(q), values_sh, scales_sh, k=10, mesh=mesh,
        n_valid=n_valid, use_pallas=False,
    )
    values, scales = quantize_rows(docs)
    lv, li = topk_segmented_int8(jnp.asarray(q), jnp.asarray(values), jnp.asarray(scales), k=10)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(lv), rtol=1e-5, atol=1e-5)
    assert (np.asarray(di) == np.asarray(li)).mean() > 0.95  # ties may reorder


def test_distributed_topk_k_larger_than_shard():
    """A small corpus spread over many devices leaves fewer than k rows per
    shard; per-shard k must clamp to shard_rows and the merge stay exact
    (regression: serving a 295-doc corpus with fanout 50 over 8 devices)."""
    mesh = make_mesh(data=8, model=1)
    rng = np.random.default_rng(8)
    d = rng.standard_normal((100, 16)).astype(np.float32)  # 13 rows/shard
    q = rng.standard_normal((4, 16)).astype(np.float32)
    docs_sharded, n_valid = shard_corpus(d, mesh)
    vals, ids = distributed_topk(
        jnp.asarray(q), docs_sharded, k=50, mesh=mesh, n_valid=n_valid, use_pallas=False
    )
    ref_vals, ref_ids = topk_oracle(jnp.asarray(q), jnp.asarray(d), 50)
    np.testing.assert_allclose(np.asarray(vals), np.asarray(ref_vals), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(ref_ids))


def test_distributed_topk_does_not_retrace_per_call():
    """The shard_map+jit search callable is built once per (mesh, k,
    backend, storage) and cached — per-request retracing was the serving
    hot-path regression flagged in round 1."""
    from twotowermlretrieval_tpu.parallel.topk import (
        _compiled_topk,
        distributed_topk,
        shard_corpus,
    )

    rng = np.random.default_rng(7)
    mesh = make_mesh(data=8, model=1)
    docs_sharded, n_valid = shard_corpus(
        rng.standard_normal((640, 16)).astype(np.float32), mesh
    )
    q = jnp.asarray(rng.standard_normal((4, 16)).astype(np.float32))
    _compiled_topk.cache_clear()
    distributed_topk(q, docs_sharded, k=5, mesh=mesh, n_valid=n_valid, use_pallas=False)
    # mirror distributed_topk's call exactly: lru_cache keys on the
    # positional/keyword split, not just the values
    fn = _compiled_topk(mesh, 5, False, False, quantized=False,
                        phase2="rescore", sort_candidates=False)
    traces_after_first = fn._cache_size()
    for _ in range(3):
        distributed_topk(q, docs_sharded, k=5, mesh=mesh, n_valid=n_valid, use_pallas=False)
    assert _compiled_topk.cache_info().currsize == 1
    assert fn._cache_size() == traces_after_first == 1
    # a different corpus size with the same shapes reuses the executable
    distributed_topk(q, docs_sharded, k=5, mesh=mesh, n_valid=600, use_pallas=False)
    assert fn._cache_size() == 1


def test_distributed_topk_padding_never_displaces_real_docs():
    """Zero-padding rows score 0.0; with all-negative similarities they
    must not consume local top-k slots (regression: mask must act inside
    the per-shard scan, not after it)."""
    from twotowermlretrieval_tpu.ops.topk import topk_oracle
    from twotowermlretrieval_tpu.parallel.mesh import make_mesh
    from twotowermlretrieval_tpu.parallel.topk import distributed_topk, shard_corpus

    rng = np.random.default_rng(0)
    mesh = make_mesh(data=8, model=1)
    # 1003 docs -> 5 zero-pad rows in the tail shard; queries anti-aligned
    # so every real similarity is negative
    base = rng.standard_normal((1003, 64)).astype(np.float32)
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    q = -np.abs(rng.standard_normal((8, 64))).astype(np.float32)
    docs = np.abs(base)  # all-positive docs => strictly negative scores
    docs /= np.linalg.norm(docs, axis=1, keepdims=True)
    docs_sharded, n_valid = shard_corpus(docs, mesh)
    dv, di = distributed_topk(
        jnp.asarray(q), docs_sharded, k=10, mesh=mesh,
        n_valid=n_valid, use_pallas=False,
    )
    ev, ei = topk_oracle(jnp.asarray(q), jnp.asarray(docs), 10)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(ev), rtol=1e-5, atol=1e-6)
    assert (np.asarray(di) == np.asarray(ei)).mean() > 0.95


# ---------------------------------------------------------------------------
# transformer tensor parallelism
# ---------------------------------------------------------------------------


def test_transformer_tp_matches_replicated():
    """Head/FFN-sharded transformer encode over the 'model' axis must equal
    the replicated single-device encode (SURVEY §2b row 2, BASELINE
    config 5)."""
    import dataclasses

    from twotowermlretrieval_tpu.models.transformer import (
        TransformerSpec,
        init_transformer_encoder,
        transformer_encode,
    )
    from twotowermlretrieval_tpu.parallel.distributed import transformer_tp_spec

    spec_rep = TransformerSpec(
        vocab_size=64, embed_dim=16, hidden_dim=32, num_layers=2, num_heads=8,
        ffn_dim=64, compute_dtype="float32", max_len=8,
    )
    spec_tp = dataclasses.replace(spec_rep, model_axis="model", model_axis_size=8)
    params = init_transformer_encoder(jax.random.key(0), spec_rep)
    rng = np.random.default_rng(12)
    tokens = jnp.asarray(rng.integers(1, 64, (4, 8)).astype(np.int32))
    lengths = jnp.asarray([8, 5, 1, 0], jnp.int32)
    ref = np.asarray(transformer_encode(params, tokens, lengths, spec_rep))

    mesh = make_mesh(data=1, model=8)
    param_specs = jax.tree_util.tree_map_with_path(
        lambda path, leaf: transformer_tp_spec(
            {p.key for p in path if isinstance(p, jax.tree_util.DictKey)}, leaf
        ) or P(),
        params,
    )
    mapped = jax.shard_map(
        lambda p, t, l: transformer_encode(p, t, l, spec_tp),
        mesh=mesh,
        in_specs=(param_specs, P(), P()),
        out_specs=P(),
        check_vma=False,
    )
    out = np.asarray(mapped(params, tokens, lengths))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def test_transformer_tp_remat_grads_match_replicated():
    """jax.checkpoint around blocks that contain the TP custom-VJP
    collectives (_copy_to_tp / _reduce_from_tp): loss and ALL gradients
    under shard_map must match the replicated no-remat run — in particular
    the replicated-leaf grads (layer norms, embeddings) must come out
    identical on every shard, which is exactly what the conjugate psum
    pair guarantees and what remat re-executes in the backward (ADVICE r3)."""
    import dataclasses

    from twotowermlretrieval_tpu.models.transformer import (
        TransformerSpec,
        init_transformer_encoder,
        transformer_encode,
    )
    from twotowermlretrieval_tpu.parallel.distributed import transformer_tp_spec

    spec_rep = TransformerSpec(
        vocab_size=64, embed_dim=16, hidden_dim=32, num_layers=2, num_heads=8,
        ffn_dim=64, compute_dtype="float32", max_len=8,
    )
    spec_tp = dataclasses.replace(
        spec_rep, model_axis="model", model_axis_size=8, remat_blocks=True
    )
    params = init_transformer_encoder(jax.random.key(2), spec_rep)
    rng = np.random.default_rng(21)
    tokens = jnp.asarray(rng.integers(1, 64, (4, 8)).astype(np.int32))
    lengths = jnp.asarray([8, 5, 1, 0], jnp.int32)
    ct = jnp.asarray(rng.standard_normal((4, 32)).astype(np.float32))

    def loss(p, spec):
        return jnp.sum(transformer_encode(p, tokens, lengths, spec) * ct)

    ref_loss, ref_grads = jax.value_and_grad(loss)(params, spec_rep)

    mesh = make_mesh(data=1, model=8)
    param_specs = jax.tree_util.tree_map_with_path(
        lambda path, leaf: transformer_tp_spec(
            {p.key for p in path if isinstance(p, jax.tree_util.DictKey)}, leaf
        ) or P(),
        params,
    )
    mapped = jax.shard_map(
        lambda p: jax.value_and_grad(loss)(p, spec_tp),
        mesh=mesh,
        in_specs=(param_specs,),
        # out_specs P() on the loss and on replicated-leaf grads asserts
        # cross-shard identity; sharded-leaf grads reassemble to full arrays
        out_specs=(P(), param_specs),
        check_vma=False,
    )
    tp_loss, tp_grads = mapped(params)
    assert float(tp_loss) == pytest.approx(float(ref_loss), rel=1e-5)
    for a, b in zip(jax.tree.leaves(ref_grads), jax.tree.leaves(tp_grads)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        )


def test_transformer_tp_training_matches_single_device():
    """Full distributed train step with a TP-sharded transformer tower
    (mesh 4x2) matches the single-device step's loss."""
    from twotowermlretrieval_tpu.parallel.distributed import (
        make_distributed_train_step,
        replicate_state,
    )

    config = _config(
        tower_type="transformer", hidden_dim=16, num_heads=2, ffn_dim=32,
        mesh_data=4, mesh_model=2, loss_type="triplet",
    )
    spec = TwoTowerSpec.from_config(config)
    import dataclasses as _dc

    # single-device reference: same architecture, no TP
    spec_rep = TwoTowerSpec(
        tower_type="transformer",
        transformer=_dc.replace(spec.transformer, model_axis=None, model_axis_size=1),
    )
    params = init_two_tower(jax.random.key(0), spec_rep)
    batch = _batch(np.random.default_rng(1), config.batch_size)

    state1 = create_train_state(jax.random.key(1), params, config)
    single = jax.jit(make_train_step(spec_rep, config.replace(mesh_model=1)))
    _, m1 = single(state1, batch)

    mesh = make_mesh(data=4, model=2)
    state8 = create_train_state(jax.random.key(1), jax.tree.map(jnp.array, params), config)
    state8 = replicate_state(state8, mesh, shard_embedding=False, shard_transformer=True)
    dist = make_distributed_train_step(spec, config, mesh, state8)
    dev_batch = jax.tree.map(lambda x: jax.device_put(x, batch_sharding(mesh)), batch)
    state8, m8 = dist(state8, dev_batch)
    assert float(m1["loss"]) == pytest.approx(float(m8["loss"]), rel=1e-5)
    assert float(m1["grad_norm"]) == pytest.approx(float(m8["grad_norm"]), rel=1e-4)


def test_initialize_multihost_calls_jax_distributed(monkeypatch):
    """Bootstrap wrapper forwards to jax.distributed.initialize and
    degrades to a no-op when already initialized (single-process runs)."""
    from twotowermlretrieval_tpu.parallel import mesh as mesh_mod

    calls = []
    monkeypatch.setattr(
        jax.distributed, "initialize",
        lambda coordinator_address=None, **kw: calls.append((coordinator_address, kw)),
    )
    mesh_mod.initialize_multihost("10.0.0.1:1234", num_processes=2, process_id=0)
    assert calls == [("10.0.0.1:1234", {"num_processes": 2, "process_id": 0})]

    def raise_already(**kw):
        raise RuntimeError("jax.distributed is already initialized")

    monkeypatch.setattr(jax.distributed, "initialize", raise_already)
    mesh_mod.initialize_multihost()  # must not raise


# ---------------------------------------------------------------------------
# distributed IVF
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("storage", ["float32", "int8"])
def test_distributed_ivf_matches_single_device(storage):
    """Block-sharded IVF over the mesh == single-device ivf_search at the
    same nprobe (the probe list is computed globally from replicated
    centroids, so semantics are identical up to tie order)."""
    from twotowermlretrieval_tpu.ops.ivf import build_ivf, ivf_search
    from twotowermlretrieval_tpu.parallel.ivf import distributed_ivf_search, shard_ivf

    rng = np.random.default_rng(13)
    docs = rng.standard_normal((3000, 32)).astype(np.float32)
    docs /= np.linalg.norm(docs, axis=1, keepdims=True)
    q = rng.standard_normal((4, 32)).astype(np.float32)
    index = build_ivf(docs, num_clusters=24, iters=4, storage_dtype=storage)

    sv, si = ivf_search(jnp.asarray(q), index, k=10, nprobe=8)
    mesh = make_mesh(data=8, model=1)
    sharded = shard_ivf(index, mesh)
    dv, di = distributed_ivf_search(jnp.asarray(q), sharded, k=10, nprobe=8, mesh=mesh)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(sv), rtol=1e-5, atol=1e-6)
    assert (np.asarray(di) == np.asarray(si)).mean() > 0.95  # ties may reorder


def test_retrieval_index_ivf_on_mesh():
    """RetrievalIndex(index_type='ivf', mesh=...) — the round-1
    NotImplementedError composition gap — now routes through the
    distributed IVF search and matches the local IVF index."""
    from twotowermlretrieval_tpu.serve.index import RetrievalIndex

    rng = np.random.default_rng(14)
    docs = rng.standard_normal((2000, 32)).astype(np.float32)
    docs /= np.linalg.norm(docs, axis=1, keepdims=True)
    q = docs[:3] + 0.01 * rng.standard_normal((3, 32)).astype(np.float32)

    local = RetrievalIndex(docs, use_pallas=False, index_type="ivf",
                           num_clusters=16, nprobe=16)
    mesh = make_mesh(data=8, model=1)
    dist = RetrievalIndex(docs, use_pallas=False, index_type="ivf",
                          num_clusters=16, nprobe=16, mesh=mesh)
    lv, li = local.search(q, k=5)
    dv, di = dist.search(q, k=5)
    np.testing.assert_allclose(dv, lv, rtol=1e-5, atol=1e-6)
    assert (di == li).mean() > 0.9


def test_distributed_ivf_pads_when_k_exceeds_probed():
    """k larger than the probed candidate pool must pad to [B, k] with
    -1 ids, matching the single-device ivf_search contract (r2 review)."""
    from twotowermlretrieval_tpu.ops.ivf import build_ivf
    from twotowermlretrieval_tpu.parallel.ivf import distributed_ivf_search, shard_ivf

    rng = np.random.default_rng(15)
    docs = rng.standard_normal((1024, 16)).astype(np.float32)
    index = build_ivf(docs, num_clusters=8, iters=2)  # cap 128
    mesh = make_mesh(data=8, model=1)
    sharded = shard_ivf(index, mesh)
    k = 300  # > nprobe(1) * cap(128); also > D * k_local
    vals, ids = distributed_ivf_search(jnp.asarray(docs[:2]), sharded, k=k, nprobe=1, mesh=mesh)
    assert vals.shape == (2, k) and ids.shape == (2, k)
    assert (np.asarray(ids)[:, -1] == -1).all()  # padded tail
    real = np.asarray(ids)[0] >= 0
    assert real.sum() >= 100  # the one probed block's real docs survived


def test_initialize_multihost_reraises_real_failures(monkeypatch):
    """A real bootstrap failure with an explicit coordinator must raise —
    silently degrading to independent single-host runs trains D wrong
    models (r2 review)."""
    from twotowermlretrieval_tpu.parallel import mesh as mesh_mod

    def fail(**kw):
        raise RuntimeError("connection to coordinator timed out")

    monkeypatch.setattr(jax.distributed, "initialize", fail)
    with pytest.raises(RuntimeError):
        mesh_mod.initialize_multihost("10.0.0.1:1234")
    mesh_mod.initialize_multihost()  # argless single-process: swallowed


def test_distributed_topk_s8_matches_local():
    """Per-segment s8 sharded retrieval over the 8-device mesh == the
    unsharded XLA twin of the same doubly-quantized metric."""
    from twotowermlretrieval_tpu.ops.topk import quantize_segments, topk_segmented_s8
    from twotowermlretrieval_tpu.parallel.topk import (
        distributed_topk_s8,
        shard_corpus_s8,
    )

    rng = np.random.default_rng(21)
    docs = rng.standard_normal((3000, 32)).astype(np.float32)
    docs /= np.linalg.norm(docs, axis=1, keepdims=True)
    q = rng.standard_normal((4, 32)).astype(np.float32)

    mesh = make_mesh(data=8, model=1)
    values_sh, scales_sh, n_valid = shard_corpus_s8(docs, mesh)
    assert n_valid == 3000
    # every shard's rows are a multiple of the 128-row segment
    assert (values_sh.shape[0] // 8) % 128 == 0
    dv, di = distributed_topk_s8(
        jnp.asarray(q), values_sh, scales_sh, k=10, mesh=mesh,
        n_valid=n_valid, use_pallas=False,
    )
    # unsharded twin on the same global quantization grid
    pad = values_sh.shape[0] - 3000
    x = np.concatenate([docs, np.zeros((pad, 32), np.float32)])
    values, scales = quantize_segments(x)
    lv, li = topk_segmented_s8(
        jnp.asarray(q), jnp.asarray(values), jnp.asarray(scales), k=10, n_valid=3000
    )
    np.testing.assert_allclose(np.asarray(dv), np.asarray(lv), rtol=1e-6, atol=1e-7)
    np.testing.assert_array_equal(np.asarray(di), np.asarray(li))


def test_retrieval_index_int8_on_mesh_matches_single():
    """RetrievalIndex(storage_dtype='int8') returns the same ranking with
    and without a mesh (both on the per-segment quantized format)."""
    from twotowermlretrieval_tpu.serve.index import RetrievalIndex

    rng = np.random.default_rng(22)
    docs = rng.standard_normal((2000, 32)).astype(np.float32)
    docs /= np.linalg.norm(docs, axis=1, keepdims=True)
    q = docs[:3] + 0.01 * rng.standard_normal((3, 32)).astype(np.float32)

    local = RetrievalIndex(docs, storage_dtype="int8", use_pallas=False)
    mesh = make_mesh(data=8, model=1)
    dist = RetrievalIndex(docs, storage_dtype="int8", use_pallas=False, mesh=mesh)
    lv, li = local.search(q, k=5)
    dv, di = dist.search(q, k=5)
    assert (li == di).mean() > 0.9  # quantization grids differ by padding
    assert (li[:, 0] == np.arange(3)).all()  # self-NN survives int8
