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
    unless the embedding table / transformer blocks are sharded)."""
    specs = state_partition_specs(state, shard_embedding, shard_transformer)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), state, specs
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

    return jax.jit(
        jax.shard_map(
            packed_eval,
            mesh=mesh,
            in_specs=(state_specs, P(DATA_AXIS)),
            out_specs=(P(DATA_AXIS), P(DATA_AXIS), P()),
            check_vma=False,
        )
    )
