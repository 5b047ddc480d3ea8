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


def state_partition_specs(state: TrainState, shard_embedding: bool) -> TrainState:
    """Per-leaf PartitionSpecs for a TrainState: everything replicated,
    except [V, E] embedding tables (and their Adam moments, which mirror the
    param tree) row-sharded over 'model' when requested (BASELINE config 3).
    """

    def spec_for(path, leaf) -> P:
        if not shard_embedding:
            return P()
        names = {p.key for p in path if isinstance(p, jax.tree_util.DictKey)}
        if "embedding" in names and getattr(leaf, "ndim", 0) == 2:
            return P(MODEL_AXIS, None)
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, state)


def replicate_state(state: TrainState, mesh: Mesh, shard_embedding: bool = False) -> TrainState:
    """Place leaves on the mesh per state_partition_specs (all replicated
    unless the embedding table is row-sharded)."""
    specs = state_partition_specs(state, shard_embedding)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), state, specs
    )


def _batch_specs(batch_spec=P(DATA_AXIS)):
    # every Batch field is batch-major -> shard dim 0 on 'data'
    from twotowermlretrieval_tpu.data.batching import Batch

    return Batch(*([batch_spec] * len(Batch._fields)))


def make_distributed_train_step(spec: TwoTowerSpec, config, mesh: Mesh, state: TrainState):
    """shard_map-wrapped train step: (state, data-sharded batch) -> (state,
    replicated metrics). Params/opt-state are replicated except row-sharded
    embedding tables (config.shard_embedding_table). jit-compiled with state
    donation. ``state`` is only used to derive per-leaf specs."""
    step_fn = make_train_step(spec, config, axis_name=DATA_AXIS)
    state_specs = state_partition_specs(state, config.shard_embedding_table)
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
        state_partition_specs(state, config.shard_embedding_table)
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

    step_fn = make_train_step(spec, config, axis_name=DATA_AXIS)
    state_specs = state_partition_specs(state, config.shard_embedding_table)

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
    state_specs = state_partition_specs(state, config.shard_embedding_table)

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
