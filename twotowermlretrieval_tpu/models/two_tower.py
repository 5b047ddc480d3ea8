"""Two-tower retrieval model: independent query and document encoders.

Equivalent of ``TwoTowerModel`` (ref: backend/model.py:78-106): two
*independently initialized*, non-weight-shared encoders built from one shared
architecture spec (model.py:84-97), exposing ``encode_query`` /
``encode_document`` / ``forward`` (model.py:99-106).

Pure-functional: params are a pytree ``{'query': ..., 'doc': ...}``; the
spec is a hashable static argument. Tower type is pluggable ('rnn' — the
reference architecture — or 'transformer', the scaling config from
BASELINE.json config 5).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

from twotowermlretrieval_tpu.models.rnn import RNNSpec, init_rnn_encoder, rnn_encode


@dataclasses.dataclass(frozen=True)
class TwoTowerSpec:
    tower_type: str = "rnn"  # 'rnn' | 'transformer'
    rnn: Optional[RNNSpec] = None
    transformer: Optional[Any] = None  # TransformerSpec, typed loosely to avoid cycle

    @classmethod
    def from_config(cls, config) -> "TwoTowerSpec":
        if config.tower_type == "transformer":
            from twotowermlretrieval_tpu.models.transformer import TransformerSpec

            return cls(tower_type="transformer", transformer=TransformerSpec.from_config(config))
        return cls(tower_type="rnn", rnn=RNNSpec.from_config(config))

    @property
    def hidden_dim(self) -> int:
        return (self.rnn or self.transformer).hidden_dim

    def _encode_fn(self):
        if self.tower_type == "transformer":
            from twotowermlretrieval_tpu.models.transformer import transformer_encode

            return transformer_encode, self.transformer
        return rnn_encode, self.rnn

    def _init_fn(self):
        if self.tower_type == "transformer":
            from twotowermlretrieval_tpu.models.transformer import init_transformer_encoder

            return init_transformer_encoder, self.transformer
        return init_rnn_encoder, self.rnn


def init_two_tower(
    rng: jax.Array,
    spec: TwoTowerSpec,
    pretrained_embeddings: Optional[np.ndarray] = None,
) -> Dict[str, Any]:
    """Two independent towers from one spec (ref: model.py:84-97). Both get
    the same pretrained table copy, like the reference's shared kwargs."""
    init_fn, sub = spec._init_fn()
    q_rng, d_rng = jax.random.split(rng)
    return {
        "query": init_fn(q_rng, sub, pretrained_embeddings),
        "doc": init_fn(d_rng, sub, pretrained_embeddings),
    }


def encode_query(
    params, tokens, lengths, spec: TwoTowerSpec, *, train=False, dropout_rng=None
) -> jax.Array:
    encode_fn, sub = spec._encode_fn()
    return encode_fn(params["query"], tokens, lengths, sub, train=train, dropout_rng=dropout_rng)


def encode_document(
    params, tokens, lengths, spec: TwoTowerSpec, *, train=False, dropout_rng=None
) -> jax.Array:
    encode_fn, sub = spec._encode_fn()
    return encode_fn(params["doc"], tokens, lengths, sub, train=train, dropout_rng=dropout_rng)


def two_tower_forward(
    params,
    q_tokens,
    q_lengths,
    d_tokens,
    d_lengths,
    spec: TwoTowerSpec,
    *,
    train: bool = False,
    dropout_rng: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """(query_emb, doc_emb) pair (ref: model.py:105-106)."""
    if dropout_rng is not None:
        q_rng, d_rng = jax.random.split(dropout_rng)
    else:
        q_rng = d_rng = None
    return (
        encode_query(params, q_tokens, q_lengths, spec, train=train, dropout_rng=q_rng),
        encode_document(params, d_tokens, d_lengths, spec, train=train, dropout_rng=d_rng),
    )
