"""Retrieval losses: explicit-triplet (reference) + in-batch contrastive.

``triplet_loss_cosine`` matches the reference exactly
(ref: backend/model.py:109-114): ``mean(clamp(cos(q,neg) - cos(q,pos) +
margin, 0))``, plus an optional per-example weight channel so repeat-padded
batch rows contribute zero (the reference's ragged final batches need no
such mask).

``in_batch_softmax_loss`` is the TPU-build extension mandated by
BASELINE.json configs 2-3: every other document in the (optionally
cross-device, via ``axis_name``) batch is a negative, scored as a softmax
cross-entropy over ``Q @ D^T / temperature``. With an ``axis_name`` the
document embeddings are all-gathered over the data mesh axis so every chip
scores B_global negatives — XLA lowers the gather to ICI collectives.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def _cosine(a: jax.Array, b: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Row-wise cosine similarity, matching F.cosine_similarity semantics
    (eps guard on the norms)."""
    na = jnp.maximum(jnp.linalg.norm(a, axis=-1), eps)
    nb = jnp.maximum(jnp.linalg.norm(b, axis=-1), eps)
    return jnp.sum(a * b, axis=-1) / (na * nb)


def _weighted_mean(
    per_example: jax.Array, weights: Optional[jax.Array], axis_name: Optional[str]
) -> jax.Array:
    """Weighted mean of per-example losses; with ``axis_name`` the
    normalization is GLOBAL across the data shards.

    Per-shard normalization would be wrong whenever real examples are
    unevenly spread over shards (a repeat-padded final batch puts all its
    zero-weight rows on the tail shards): each shard would divide by a
    different count and the later pmean would not recover the global mean.
    The returned per-shard value is scaled by the axis size so that the
    caller's ``pmean`` over gradients AND over the loss metric is exact.
    """
    if weights is None:
        if axis_name is None:
            return jnp.mean(per_example)
        weights = jnp.ones(per_example.shape[0], per_example.dtype)
    num = jnp.sum(per_example * weights)
    den = jnp.sum(weights)
    if axis_name is None:
        return num / jnp.maximum(den, 1.0)
    axis_size = jax.lax.psum(1, axis_name)
    global_den = jax.lax.psum(den, axis_name)
    return axis_size * num / jnp.maximum(global_den, 1.0)


def triplet_loss_cosine(
    triplet: Tuple[jax.Array, jax.Array, jax.Array],
    margin: float = 0.2,
    weights: Optional[jax.Array] = None,
    axis_name: Optional[str] = None,
) -> jax.Array:
    """Cosine triplet margin loss (ref: model.py:109-114).

    weights: optional [B] — 0 entries (repeat-padded rows) are excluded from
    the mean, keeping the value identical to a ragged batch. axis_name:
    set under shard_map so the mean normalizes over the GLOBAL batch
    (see _weighted_mean).
    """
    query, pos_doc, neg_doc = triplet
    pos_sim = _cosine(query, pos_doc)
    neg_sim = _cosine(query, neg_doc)
    per_example = jnp.maximum(neg_sim - pos_sim + margin, 0.0)
    return _weighted_mean(per_example, weights, axis_name)


def in_batch_softmax_loss(
    query_emb: jax.Array,  # [B, H], assumed L2-normalized
    doc_emb: jax.Array,  # [B, H]
    temperature: float = 0.05,
    weights: Optional[jax.Array] = None,
    axis_name: Optional[str] = None,
    gather_negatives: bool = True,
) -> jax.Array:
    """Softmax contrastive loss with in-batch negatives.

    Positive for query i is document i (the protocol the reference's
    BatchEvaluator already assumes, ref: evaluators.py:59-65). With
    ``axis_name`` set (inside shard_map/pjit over a 'data' axis) the mean
    normalizes over the global batch, and — when ``gather_negatives`` —
    documents are gathered across chips: the label for local query i on
    axis-index k becomes ``k * B_local + i``.

    Padded rows (weight 0) are excluded twice: their NLL is weighted out,
    AND their *document columns* are masked out of every softmax — a
    repeat-padded row duplicates a real document, which would otherwise
    appear as a second, negative-labeled copy of that query's positive.
    The label column is left unmasked so padded rows' own (zero-weighted)
    NLL stays finite.
    """
    B = query_emb.shape[0]
    gather = axis_name is not None and gather_negatives
    if gather:
        all_docs = jax.lax.all_gather(doc_emb, axis_name, tiled=True)  # [B*D, H]
        offset = jax.lax.axis_index(axis_name) * B
    else:
        all_docs = doc_emb
        offset = 0
    logits = (
        jnp.dot(query_emb, all_docs.T, preferred_element_type=jnp.float32) / temperature
    )  # [B, B_global]
    labels = jnp.arange(B, dtype=jnp.int32) + offset
    if weights is not None:
        col_weights = (
            jax.lax.all_gather(weights, axis_name, tiled=True) if gather else weights
        )  # [B_global]
        col_idx = jnp.arange(all_docs.shape[0], dtype=jnp.int32)
        # keep column j when it is a real doc OR it is this row's own label
        # (finite -1e9, not -inf: 0-weight * inf would produce NaN)
        keep = (col_weights > 0)[None, :] | (col_idx[None, :] == labels[:, None])
        logits = jnp.where(keep, logits, jnp.float32(-1e9))
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(log_probs, labels[:, None], axis=-1)[:, 0]
    return _weighted_mean(nll, weights, axis_name)


def combined_loss(
    query_emb: jax.Array,
    pos_emb: jax.Array,
    neg_emb: jax.Array,
    loss_type: str,
    margin: float,
    temperature: float,
    weights: Optional[jax.Array] = None,
    axis_name: Optional[str] = None,
    gather_negatives: bool = True,
) -> jax.Array:
    """Loss selected by Config.loss_type.

    'triplet'          — reference loss only
    'in_batch'         — softmax contrastive only (explicit negatives unused)
    'triplet+in_batch' — sum of both (explicit hard negative + in-batch)

    axis_name: the data mesh axis when running under shard_map — every term
    then normalizes over the GLOBAL batch. gather_negatives additionally
    all-gathers documents so in-batch terms score B_global negatives
    (Config.cross_device_negatives).
    """
    total = jnp.zeros((), jnp.float32)
    if loss_type in ("triplet", "triplet+in_batch"):
        total = total + triplet_loss_cosine(
            (query_emb, pos_emb, neg_emb), margin, weights, axis_name
        )
    if loss_type in ("in_batch", "triplet+in_batch"):
        total = total + in_batch_softmax_loss(
            query_emb, pos_emb, temperature, weights, axis_name, gather_negatives
        )
    return total
