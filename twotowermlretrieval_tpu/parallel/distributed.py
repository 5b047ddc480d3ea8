"""SPMD training over the device mesh via shard_map.

The single-device train step (train.train_step) is already a pure function;
here it runs unchanged under ``shard_map`` with:

- batch sharded on the 'data' axis (each chip sees B_local = B / D_data);
- params + optimizer state replicated (P());
- gradients/metrics ``pmean``-reduced over 'data' (XLA lowers to ICI
  all-reduce);
- in-batch negatives all-gathered across 'data' when
  ``config.cross_device_negatives`` (every chip scores B_global docs —
  BASELINE.json configs 2-3; see models.losses.in_batch_softmax_loss).

This is the TPU-native replacement for the torch DDP/NCCL stack the
reference never had (SURVEY.md §2b).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from twotowermlretrieval_tpu.models.two_tower import TwoTowerSpec
from twotowermlretrieval_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS
from twotowermlretrieval_tpu.train.train_step import (
    TrainState,
    make_eval_step,
    make_train_step,
)


def transformer_tp_spec(names, leaf) -> Optional[P]:
    """Megatron-style PartitionSpec for a transformer block leaf, keyed on
    the dict path (names) — shared by the TrainState spec builder and the
    encode-level tests. Returns None for leaves that stay replicated.

    qkv w [H, 3, H] / b [3, H]  -> column-shard heads (last axis)
    ffn_in w [H, F] / b [F]     -> column-shard FFN width
    attn_out / ffn_out w        -> row-shard (partial sums psum'd in encode)
    """
    ndim = getattr(leaf, "ndim", 0)
    if "qkv" in names:
        return P(None, None, MODEL_AXIS) if ndim == 3 else P(None, MODEL_AXIS)
    if "ffn_in" in names:
        return P(None, MODEL_AXIS) if ndim == 2 else P(MODEL_AXIS)
    if ("attn_out" in names or "ffn_out" in names) and ndim == 2:
        return P(MODEL_AXIS, None)
    return None


def state_partition_specs(
    state: TrainState, shard_embedding: bool, shard_transformer: bool = False
) -> TrainState:
    """Per-leaf PartitionSpecs for a TrainState: everything replicated,
    except [V, E] embedding tables row-sharded over 'model' when requested
    (BASELINE config 3) and — for transformer towers with mesh_model > 1 —
    attention-head/FFN column and row shards (BASELINE config 5). Adam
    moments mirror the param tree, so the same path rules cover opt_state.
    """

    def spec_for(path, leaf) -> P:
        names = {p.key for p in path if isinstance(p, jax.tree_util.DictKey)}
        if shard_embedding and "embedding" in names and getattr(leaf, "ndim", 0) == 2:
            return P(MODEL_AXIS, None)
        if shard_transformer:
            tp = transformer_tp_spec(names, leaf)
            if tp is not None:
                return tp
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, state)


def shard_transformer_from_config(config) -> bool:
    """True when the transformer tower should TP-shard over 'model'."""
    return (
        getattr(config, "tower_type", "rnn") == "transformer"
        and getattr(config, "mesh_model", 1) > 1
    )


def replicate_state(
    state: TrainState,
    mesh: Mesh,
    shard_embedding: bool = False,
    shard_transformer: bool = False,
) -> TrainState:
    """Place leaves on the mesh per state_partition_specs (all replicated
    unless the embedding table / transformer blocks are sharded).
    Multi-process safe: initialization is deterministic, so every process
    holds the same host values and contributes its addressable shards
    (parallel.mesh.put_global)."""
    from twotowermlretrieval_tpu.parallel.mesh import put_global

    specs = state_partition_specs(state, shard_embedding, shard_transformer)
    return jax.tree.map(
        lambda x, s: put_global(x, NamedSharding(mesh, s)), state, specs
    )


def _batch_specs(batch_spec=P(DATA_AXIS)):
    # every Batch field is batch-major -> shard dim 0 on 'data'
    from twotowermlretrieval_tpu.data.batching import Batch

    return Batch(*([batch_spec] * len(Batch._fields)))


def _model_sharded_mask(state_specs):
    """(model_axis, per-trainable-leaf bool tree) for the grad-clip norm —
    (None, None) when nothing is sharded over 'model'."""
    mask = jax.tree.map(
        lambda s: MODEL_AXIS in tuple(s), state_specs.trainable,
        is_leaf=lambda x: isinstance(x, P),
    )
    if any(jax.tree.leaves(mask)):
        return MODEL_AXIS, mask
    return None, None


def make_distributed_train_step(spec: TwoTowerSpec, config, mesh: Mesh, state: TrainState):
    """shard_map-wrapped train step: (state, data-sharded batch) -> (state,
    replicated metrics). Params/opt-state are replicated except row-sharded
    embedding tables (config.shard_embedding_table). jit-compiled with state
    donation. ``state`` is only used to derive per-leaf specs."""
    state_specs = state_partition_specs(
        state, config.shard_embedding_table, shard_transformer_from_config(config)
    )
    model_axis, model_sharded = _model_sharded_mask(state_specs)
    step_fn = make_train_step(
        spec, config, axis_name=DATA_AXIS,
        model_axis=model_axis, model_sharded=model_sharded,
    )
    mapped = jax.shard_map(
        step_fn,
        mesh=mesh,
        in_specs=(state_specs, _batch_specs()),
        out_specs=(state_specs, P()),
        check_vma=False,
    )
    return jax.jit(mapped, donate_argnums=(0,))


def make_distributed_eval_step(spec: TwoTowerSpec, config, mesh: Mesh, state: Optional[TrainState] = None):
    """Eval step over the mesh: embeddings come back data-sharded (callers
    concatenate on host), loss replicated. ``state`` (specs template) is
    required when the embedding table is row-sharded."""
    step_fn = make_eval_step(spec, config, axis_name=DATA_AXIS)
    state_specs = (
        state_partition_specs(
        state, config.shard_embedding_table, shard_transformer_from_config(config)
    )
        if state is not None
        else P()
    )
    mapped = jax.shard_map(
        step_fn,
        mesh=mesh,
        in_specs=(state_specs, _batch_specs()),
        out_specs=(P(DATA_AXIS), P(DATA_AXIS), P()),
        check_vma=False,
    )
    return jax.jit(mapped)


# ---------------------------------------------------------------------------
# packed-buffer variants (the end-to-end driver's hot path)
# ---------------------------------------------------------------------------


def make_sharded_packed_train_step(
    spec: TwoTowerSpec, config, mesh: Mesh, state: TrainState, max_query_len: int
):
    """UNJITTED shard_map train step over ONE packed [B, W] int32 buffer
    (rows sharded on 'data'; unpacked on-device inside the mapped body so
    the host ships a single array per step). The driver composes this with
    ``lax.scan`` + ``jit`` for K-step dispatch groups — the same shape the
    single-device path uses, so going distributed changes only the step
    function and the batch sharding (ref driver role: backend/main.py:158-313)."""
    from twotowermlretrieval_tpu.data.batching import unpack_batch

    state_specs = state_partition_specs(
        state, config.shard_embedding_table, shard_transformer_from_config(config)
    )
    model_axis, model_sharded = _model_sharded_mask(state_specs)
    step_fn = make_train_step(
        spec, config, axis_name=DATA_AXIS,
        model_axis=model_axis, model_sharded=model_sharded,
    )

    def packed_step(st, packed):
        return step_fn(st, unpack_batch(packed, max_query_len))

    return jax.shard_map(
        packed_step,
        mesh=mesh,
        in_specs=(state_specs, P(DATA_AXIS)),
        out_specs=(state_specs, P()),
        check_vma=False,
    )


def make_sharded_packed_eval_step(
    spec: TwoTowerSpec, config, mesh: Mesh, state: TrainState, max_query_len: int
):
    """Jitted shard_map eval step over one packed [B, W] buffer; embeddings
    return data-sharded, loss replicated."""
    from twotowermlretrieval_tpu.data.batching import unpack_batch

    step_fn = make_eval_step(spec, config, axis_name=DATA_AXIS)
    state_specs = state_partition_specs(
        state, config.shard_embedding_table, shard_transformer_from_config(config)
    )

    def packed_eval(st, packed):
        return step_fn(st, unpack_batch(packed, max_query_len))

    mapped = jax.shard_map(
        packed_eval,
        mesh=mesh,
        in_specs=(state_specs, P(DATA_AXIS)),
        out_specs=(P(DATA_AXIS), P(DATA_AXIS), P()),
        check_vma=False,
    )
    if jax.process_count() > 1:
        # multi-host: the evaluator reads q/p on host, and data-sharded
        # leaves span non-addressable devices — compile the all-gather into
        # the step ([B, H] per batch: tiny) so np.asarray works everywhere
        rep = NamedSharding(mesh, P())
        return jax.jit(mapped, out_shardings=(rep, rep, rep))
    return jax.jit(mapped)


def make_sharded_encode_fns(spec: TwoTowerSpec, config, mesh: Mesh, state: TrainState):
    """Jitted shard_map query/doc encoders over packed [B, W+1] buffers
    (rows sharded on 'data', embeddings returned data-sharded). Built once
    per mesh run; used by MeshTextEncoder so corpus/test evaluation runs
    through the SHARDED towers instead of a host gather of every param."""
    from twotowermlretrieval_tpu.models.two_tower import encode_document, encode_query
    from twotowermlretrieval_tpu.train.train_step import merge_params

    state_specs = state_partition_specs(
        state, config.shard_embedding_table, shard_transformer_from_config(config)
    )

    def q_fn(st, packed):
        params = merge_params(st.trainable, st.frozen)
        return encode_query(params, packed[:, :-1], packed[:, -1], spec)

    def d_fn(st, packed):
        params = merge_params(st.trainable, st.frozen)
        return encode_document(params, packed[:, :-1], packed[:, -1], spec)

    def wrap(fn):
        mapped = jax.shard_map(
            fn, mesh=mesh,
            in_specs=(state_specs, P(DATA_AXIS)),
            out_specs=P(DATA_AXIS),
            check_vma=False,
        )
        if jax.process_count() > 1:
            # multi-host: embeddings are fetched to host — gather the data
            # shards inside the program so every process can read them
            return jax.jit(mapped, out_shardings=NamedSharding(mesh, P()))
        return jax.jit(mapped)

    return wrap(q_fn), wrap(d_fn)


class MeshTextEncoder:
    """TextEncoder-compatible host-text -> embedding encoder that runs the
    towers over the mesh (VERDICT r2 item 4).

    The mesh driver previously gathered the ENTIRE merged param tree —
    including the [V, E] embedding tables — to host numpy every epoch just
    so the corpus evaluator could run single-device (~320 MB per epoch at
    GloVe scale; on a pod, a full DCN gather serializing evaluation). This
    encoder keeps params where they live: doc/query batches are tokenized
    host-side into the same packed buffers as training, sharded over
    'data', encoded by cached shard_map executables, and only the [B, H]
    embeddings come back. Evaluation protocol unchanged
    (ref: backend/evaluators.py:162-175).

    ``state`` is a mutable attribute: the driver points it at the current
    TrainState before each evaluation (training donates/replaces the state
    every dispatch).
    """

    def __init__(
        self,
        state: TrainState,
        spec: TwoTowerSpec,
        tokenizer,
        mesh: Mesh,
        config,
        batch_size: int = 256,
        max_query_len: int = 32,
        max_doc_len: int = 128,
    ):
        self.state = state
        self.spec = spec
        self.tokenizer = tokenizer
        self.mesh = mesh
        self.max_query_len = max_query_len
        self.max_doc_len = max_doc_len
        n_data = mesh.shape[DATA_AXIS]
        # batch buckets must split evenly over 'data'
        def fit(b):
            return max(((b + n_data - 1) // n_data) * n_data, n_data)

        self._bucket_small, self._bucket_mid = fit(16), fit(128)
        self.corpus_batch_size = fit(max(batch_size, 1024))
        self._batch_sharding = NamedSharding(mesh, P(DATA_AXIS))
        self._q_fn, self._d_fn = make_sharded_encode_fns(spec, config, mesh, state)

    def _run(self, texts, fn, max_len):
        from twotowermlretrieval_tpu.encoder import run_batched_encode
        from twotowermlretrieval_tpu.parallel.mesh import put_global

        # same fixed-bucket rule as TextEncoder._run, with each bucket
        # rounded up to split evenly over the 'data' axis
        if len(texts) <= self._bucket_small:
            bs = self._bucket_small
        elif len(texts) <= self._bucket_mid:
            bs = self._bucket_mid
        else:
            bs = self.corpus_batch_size
        return run_batched_encode(
            texts, self.tokenizer, max_len, bs, self.spec.hidden_dim,
            lambda packed: fn(self.state, put_global(packed, self._batch_sharding)),
        )

    def encode_queries(self, texts):
        return self._run(texts, self._q_fn, self.max_query_len)

    def encode_documents(self, texts):
        return self._run(texts, self._d_fn, self.max_doc_len)

    def encode_query(self, text: str):
        return self.encode_queries([text])[0]
