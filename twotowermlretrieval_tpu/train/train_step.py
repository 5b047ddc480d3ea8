"""The jitted training step: forward 3 towers -> loss -> grad -> clip -> Adam.

Re-designs the reference's eager train loop body (ref: backend/main.py:244-259)
as one pure function compiled once by XLA:

- the three encodes, the loss, the backward pass, gradient clipping
  (max_norm=1.0, ref: backend/main.py:257) and the Adam update all fuse into
  a single device program — no per-op dispatch, no host sync per batch
  (the reference syncs on ``loss.item()`` every step, backend/main.py:261);
- frozen embedding tables are *partitioned out* of the differentiated
  params, so no [V, E] gradient is ever materialized (the torch analogue is
  ``requires_grad=False``, ref: model.py:26-27);
- metrics carry the dead trainer.py's richer set — triplet accuracy,
  similarity gap, embedding magnitudes (ref: backend/trainer.py:38-55) —
  computed on-device in the same program;
- with ``axis_name`` set the same function runs under ``shard_map`` over the
  'data' mesh axis: gradients/metrics are ``psum``-averaged and the in-batch
  loss all-gathers negatives across chips (BASELINE.json configs 2-3).

State is a plain pytree NamedTuple (params split into trainable/frozen,
optax state, step, rng) — checkpoint-friendly and sharding-friendly.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from twotowermlretrieval_tpu.data.batching import Batch
from twotowermlretrieval_tpu.models.losses import combined_loss, triplet_loss_cosine
from twotowermlretrieval_tpu.models.two_tower import (
    TwoTowerSpec,
    encode_document,
    encode_query,
)


class TrainState(NamedTuple):
    trainable: Any  # differentiated params pytree
    frozen: Any  # non-differentiated params (e.g. GloVe tables)
    opt_state: Any
    step: jax.Array  # int32 scalar
    rng: jax.Array  # PRNG key (dropout stream)


# ---------------------------------------------------------------------------
# param partitioning (frozen embeddings)
# ---------------------------------------------------------------------------


def partition_params(params: Dict[str, Any], freeze_embeddings: bool):
    """Split two-tower params into (trainable, frozen).

    When embeddings are frozen (ref: model.py:26-27) the [V, E] tables move
    to the frozen tree: jax.grad never sees them, so neither the scatter-add
    backward nor a zeros gradient buffer is ever built.
    """
    if not freeze_embeddings:
        return params, {}
    trainable = {}
    frozen = {}
    for tower, tower_params in params.items():
        t = dict(tower_params)
        frozen[tower] = {"embedding": t.pop("embedding")}
        trainable[tower] = t
    return trainable, frozen


def merge_params(trainable: Dict[str, Any], frozen: Dict[str, Any]) -> Dict[str, Any]:
    if not frozen:
        return trainable
    return {
        tower: {**trainable[tower], **frozen.get(tower, {})} for tower in trainable
    }


# ---------------------------------------------------------------------------
# optimizer
# ---------------------------------------------------------------------------


def global_norm_sharded(grads, model_axis: Optional[str] = None, model_sharded=None) -> jax.Array:
    """Global L2 norm of a gradient tree whose leaves may be SHARDED over
    the 'model' mesh axis (TP weights, row-sharded embeddings). A sharded
    leaf's squared norm is psum'd over the axis; replicated leaves (whose
    per-shard grads are identical) count once. Plain optax.global_norm on
    local slices would give every model shard a different norm — and a
    different clip scale, silently desynchronizing the replicated params.
    """

    def leaf_sq(g, sharded=False):
        s = jnp.sum(jnp.square(g))
        if model_axis is not None and sharded:
            s = jax.lax.psum(s, model_axis)
        return s

    if model_sharded is None:
        sq = [leaf_sq(g) for g in jax.tree.leaves(grads)]
    else:
        sq = jax.tree.leaves(jax.tree.map(leaf_sq, grads, model_sharded))
    return jnp.sqrt(sum(sq))


def clip_by_global_norm_sharded(
    max_norm: float, model_axis: Optional[str] = None, model_sharded=None
) -> optax.GradientTransformation:
    """optax.clip_by_global_norm semantics with the sharding-aware norm
    (identical to optax's transform when model_axis is None; same EmptyState,
    so optimizer states are interchangeable)."""

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params
        gnorm = global_norm_sharded(updates, model_axis, model_sharded)
        scale = jnp.minimum(1.0, max_norm / jnp.maximum(gnorm, 1e-16))
        return jax.tree.map(lambda g: g * scale, updates), state

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer(
    config, model_axis: Optional[str] = None, model_sharded=None
) -> optax.GradientTransformation:
    """clip_by_global_norm(GRAD_CLIP_NORM) -> Adam(LR), matching the
    reference's clip-then-Adam order (ref: backend/main.py:222, 257).
    model_axis/model_sharded make the clip norm exact under TP/row
    sharding (see global_norm_sharded); the opt-state structure does not
    depend on them."""
    return optax.chain(
        clip_by_global_norm_sharded(config.grad_clip_norm, model_axis, model_sharded),
        optax.adam(config.lr),
    )


def create_train_state(
    rng: jax.Array,
    params: Dict[str, Any],
    config,
) -> TrainState:
    trainable, frozen = partition_params(params, config.freeze_embeddings)
    tx = make_optimizer(config)
    return TrainState(
        trainable=trainable,
        frozen=frozen,
        opt_state=tx.init(trainable),
        step=jnp.zeros((), jnp.int32),
        rng=rng,
    )


# ---------------------------------------------------------------------------
# steps
# ---------------------------------------------------------------------------


def _weighted_mean(x: jax.Array, w: jax.Array, axis_name: Optional[str] = None) -> jax.Array:
    """Weighted mean; with axis_name the numerator AND denominator are
    psum'd so every shard reports the exact global metric (per-shard
    normalization would skew whenever padded rows concentrate on the tail
    shards — see models.losses._weighted_mean)."""
    num, den = jnp.sum(x * w), jnp.sum(w)
    if axis_name is not None:
        num = jax.lax.psum(num, axis_name)
        den = jax.lax.psum(den, axis_name)
    return num / jnp.maximum(den, 1.0)


def _forward_and_metrics(
    params, batch: Batch, spec: TwoTowerSpec, config, dropout_rng, train: bool, axis_name
):
    if dropout_rng is not None:
        q_rng, d_rng = jax.random.split(dropout_rng, 2)
    else:
        q_rng = d_rng = None
    q = encode_query(params, batch.q_tokens, batch.q_len, spec, train=train, dropout_rng=q_rng)
    B = batch.pos_tokens.shape[0]
    # With a pure in-batch loss the explicit negative never reaches the
    # gradient (combined_loss ignores it; its backward is dead code) —
    # only the triplet metric set reads it. TRIPLET_METRICS=false skips
    # its forward too: the doc tower encodes [B] instead of [2B] rows.
    need_neg = config.loss_type != "in_batch" or getattr(
        config, "triplet_metrics", True
    )
    if need_neg:
        # One doc-tower call over [2B, T] (pos ++ neg): halves the scan
        # count and doubles MXU row occupancy vs two separate encodes (the
        # reference runs three sequential tower calls per step,
        # backend/main.py:249-251).
        d_tokens = jnp.concatenate([batch.pos_tokens, batch.neg_tokens], axis=0)
        d_len = jnp.concatenate([batch.pos_len, batch.neg_len], axis=0)
        d = encode_document(params, d_tokens, d_len, spec, train=train, dropout_rng=d_rng)
        p, n = d[:B], d[B:]
    else:
        p = encode_document(
            params, batch.pos_tokens, batch.pos_len, spec, train=train, dropout_rng=d_rng
        )
        n = None
    w = batch.example_mask

    loss = combined_loss(
        q, p, n if n is not None else p, config.loss_type, config.margin,
        config.temperature, weights=w,
        axis_name=axis_name,
        gather_negatives=config.cross_device_negatives,
    )

    # trainer.py metric set (ref: backend/trainer.py:38-55), on-device;
    # globally normalized, so the later pmean is exact
    pos_sim = jnp.sum(q * p, axis=-1)
    metrics = {
        "loss": loss,
        "pos_similarity": _weighted_mean(pos_sim, w, axis_name),
        "query_magnitude": _weighted_mean(jnp.linalg.norm(q, axis=-1), w, axis_name),
        "doc_magnitude": _weighted_mean(jnp.linalg.norm(p, axis=-1), w, axis_name),
    }
    if n is not None:
        neg_sim = jnp.sum(q * n, axis=-1)
        metrics["triplet_accuracy"] = _weighted_mean(
            (pos_sim > neg_sim).astype(jnp.float32), w, axis_name
        )
        metrics["similarity_gap"] = _weighted_mean(pos_sim - neg_sim, w, axis_name)
        metrics["neg_similarity"] = _weighted_mean(neg_sim, w, axis_name)
    if "in_batch" in config.loss_type:
        # top-1 retrieval accuracy over the LOCAL in-batch similarity
        # matrix (positive on the diagonal, the BatchEvaluator protocol,
        # ref: evaluators.py:59-65) — one [B, B] matmul, so the in_batch
        # configs keep a training-quality signal even with the triplet
        # metric set off; padded columns are excluded like in the loss
        logits = jnp.dot(q, p.T, preferred_element_type=jnp.float32)
        col_ok = (w > 0)[None, :] | jnp.eye(B, dtype=bool)
        logits = jnp.where(col_ok, logits, -jnp.inf)
        hit = (jnp.argmax(logits, axis=-1) == jnp.arange(B)).astype(jnp.float32)
        metrics["in_batch_accuracy"] = _weighted_mean(hit, w, axis_name)
    return loss, metrics


def _leaf_name(path) -> str:
    parts = []
    for p in path:
        if isinstance(p, jax.tree_util.DictKey):
            parts.append(str(p.key))
        elif isinstance(p, jax.tree_util.SequenceKey):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def _add_param_stats(metrics, grads, params, model_axis, model_sharded) -> None:
    """metrics['grad_norm/<leaf>'] and ['param_norm/<leaf>'] per trainable
    leaf (wandb.watch parity, ref: backend/main.py:234)."""
    flat_g = jax.tree_util.tree_flatten_with_path(grads)[0]
    flat_p = jax.tree_util.tree_flatten_with_path(params)[0]
    mask = (
        jax.tree.leaves(model_sharded)
        if model_sharded is not None
        else [False] * len(flat_g)
    )
    for (path, g), (_, p), sharded in zip(flat_g, flat_p, mask):
        gs, ps = jnp.sum(jnp.square(g)), jnp.sum(jnp.square(p))
        if model_axis is not None and sharded:
            gs = jax.lax.psum(gs, model_axis)
            ps = jax.lax.psum(ps, model_axis)
        name = _leaf_name(path)
        metrics[f"grad_norm/{name}"] = jnp.sqrt(gs)
        metrics[f"param_norm/{name}"] = jnp.sqrt(ps)


HISTOGRAM_BINS = 64


def _leaf_histogram(x: jax.Array, model_axis, sharded) -> Tuple[jax.Array, jax.Array]:
    """Fixed-bin histogram of a tensor over the symmetric range
    [-absmax, absmax]: (counts [HISTOGRAM_BINS] f32, absmax scalar).
    For leaves sharded over 'model' the absmax is pmax'd and the counts
    psum'd so every shard reports the global histogram."""
    absmax = jnp.max(jnp.abs(x))
    if model_axis is not None and sharded:
        absmax = jax.lax.pmax(absmax, model_axis)
    scale = jnp.maximum(absmax, 1e-30)
    idx = jnp.clip(
        ((x.ravel() + scale) * (HISTOGRAM_BINS / (2.0 * scale))).astype(jnp.int32),
        0,
        HISTOGRAM_BINS - 1,
    )
    counts = jnp.bincount(idx, length=HISTOGRAM_BINS).astype(jnp.float32)
    if model_axis is not None and sharded:
        counts = jax.lax.psum(counts, model_axis)
    return counts, absmax


def _add_param_histograms(metrics, grads, params, model_axis, model_sharded) -> None:
    """metrics['grad_hist/<leaf>'] ([HISTOGRAM_BINS] counts) +
    ['grad_hist_max/<leaf>'] (symmetric range bound), and the same for
    params — full wandb.watch parity (the reference logs gradient AND
    parameter histograms every 50 batches, ref: backend/main.py:234).
    The metric sink reconstructs bin edges as linspace(-max, max, BINS+1)
    (see train.metrics.MetricLogger)."""
    flat_g = jax.tree_util.tree_flatten_with_path(grads)[0]
    flat_p = jax.tree_util.tree_flatten_with_path(params)[0]
    mask = (
        jax.tree.leaves(model_sharded)
        if model_sharded is not None
        else [False] * len(flat_g)
    )
    for (path, g), (_, p), sharded in zip(flat_g, flat_p, mask):
        name = _leaf_name(path)
        counts, mx = _leaf_histogram(g, model_axis, sharded)
        metrics[f"grad_hist/{name}"] = counts
        metrics[f"grad_hist_max/{name}"] = mx
        counts, mx = _leaf_histogram(p, model_axis, sharded)
        metrics[f"param_hist/{name}"] = counts
        metrics[f"param_hist_max/{name}"] = mx


def make_train_step(
    spec: TwoTowerSpec,
    config,
    axis_name: Optional[str] = None,
    model_axis: Optional[str] = None,
    model_sharded=None,
):
    """Build the pure train-step function.

    axis_name=None  -> single-device; wrap with jax.jit.
    axis_name='data'-> SPMD body; wrap with shard_map over the mesh (see
                       parallel.distributed). Gradients and metrics are
                       pmean-reduced; params/opt-state stay replicated.
    model_axis/model_sharded: per-trainable-leaf bool tree marking leaves
    sharded over 'model' (TP / row-sharded tables), so the gradient clip
    and grad_norm use the true global norm.
    """
    tx = make_optimizer(config, model_axis, model_sharded)

    def loss_fn(trainable, frozen, batch, dropout_rng):
        params = merge_params(trainable, frozen)
        return _forward_and_metrics(
            params, batch, spec, config, dropout_rng, train=True, axis_name=axis_name
        )

    def train_step(state: TrainState, batch: Batch) -> Tuple[TrainState, Dict[str, jax.Array]]:
        rng, dropout_rng = jax.random.split(state.rng)
        if axis_name is not None:
            # decorrelate dropout masks across data shards (the replicated
            # rng would otherwise apply identical masks to different rows)
            dropout_rng = jax.random.fold_in(dropout_rng, jax.lax.axis_index(axis_name))
        grads, metrics = jax.grad(loss_fn, has_aux=True)(
            state.trainable, state.frozen, batch, dropout_rng
        )
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            metrics = jax.lax.pmean(metrics, axis_name)
        updates, opt_state = tx.update(grads, state.opt_state, state.trainable)
        trainable = optax.apply_updates(state.trainable, updates)
        new_state = TrainState(
            trainable=trainable,
            frozen=state.frozen,
            opt_state=opt_state,
            step=state.step + 1,
            rng=rng,
        )
        metrics["grad_norm"] = global_norm_sharded(grads, model_axis, model_sharded)
        if getattr(config, "log_param_stats", False):
            # per-leaf grad/param norms (the reference's wandb.watch role,
            # ref: backend/main.py:234), fused into the same device program;
            # model-sharded leaves psum their squared norms for the true value
            _add_param_stats(
                metrics, grads, state.trainable, model_axis, model_sharded
            )
        if getattr(config, "log_param_histograms", False):
            # fixed-bin grad/param histograms, also on-device (the
            # reference's wandb.watch logs histograms, not norms)
            _add_param_histograms(
                metrics, grads, state.trainable, model_axis, model_sharded
            )
        return new_state, metrics

    return train_step


def make_eval_step(spec: TwoTowerSpec, config, axis_name: Optional[str] = None):
    """Validation step: no dropout, no update. Returns (q_emb, pos_emb,
    metrics) so callers can run the in-batch retrieval protocol
    (ref: backend/evaluators.py:30-44)."""

    def eval_step(state: TrainState, batch: Batch):
        params = merge_params(state.trainable, state.frozen)
        q = encode_query(params, batch.q_tokens, batch.q_len, spec)
        # One [2B] doc-tower forward (no backward here, so unlike the
        # in-batch train step there is no dead-gradient concern)
        B = batch.pos_tokens.shape[0]
        d = encode_document(
            params,
            jnp.concatenate([batch.pos_tokens, batch.neg_tokens], axis=0),
            jnp.concatenate([batch.pos_len, batch.neg_len], axis=0),
            spec,
        )
        p, n = d[:B], d[B:]
        # Validation loss uses the reference's triplet loss regardless of the
        # training loss (ref: evaluators.py:36-37); global weighted mean,
        # so the pmean of the axis-size-scaled value is exact
        loss = triplet_loss_cosine(
            (q, p, n), config.margin, weights=batch.example_mask, axis_name=axis_name
        )
        if axis_name is not None:
            loss = jax.lax.pmean(loss, axis_name)
        return q, p, {"val_loss": loss}

    return eval_step
