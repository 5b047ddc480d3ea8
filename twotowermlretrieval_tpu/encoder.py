"""Batched host-text -> device-embedding encoder.

Shared by the evaluators (ref: backend/evaluators.py:162-175), the artifact
exporter (ref: backend/main.py:125-133) and the serving inferencer
(ref: backend/query_inferencer.py:59-75): tokenize to static shapes, run the
jitted tower, return numpy embeddings. Batches come from a FIXED bucket
set ({16, 128, corpus_batch_size} rows), so at most three executables per
(tower, max_len) exist process-wide — the jits are module-level and shared
across instances.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from twotowermlretrieval_tpu.data.batching import tokenize_corpus
from twotowermlretrieval_tpu.models.two_tower import TwoTowerSpec, encode_document, encode_query
from twotowermlretrieval_tpu.tokenizer import Tokenizer


# Tokens and lengths ride ONE packed int32 buffer per batch (one transfer
# per dispatch on remote-attached TPUs); module-level jits so executables
# are shared across TextEncoder instances.
@functools.partial(jax.jit, static_argnames=("spec",))
def _encode_query_packed(params, packed, spec):
    return encode_query(params, packed[:, :-1], packed[:, -1], spec)


@functools.partial(jax.jit, static_argnames=("spec",))
def _encode_document_packed(params, packed, spec):
    return encode_document(params, packed[:, :-1], packed[:, -1], spec)


def run_batched_encode(texts, tokenizer, max_len, bs, hidden_dim, dispatch):
    """The shared tokenize->dispatch->chunked-fetch loop behind both
    TextEncoder and parallel.distributed.MeshTextEncoder.

    ``dispatch(packed_int32) -> device [bs, H]`` hides the placement
    difference (single-device jit vs mesh shard_map). Batches are
    dispatched asynchronously and fetched in ~64 MB concatenated chunks:
    per-batch np.asarray fetches dominate wall time on remote-attached
    TPUs, while an unbounded [N, H] resident would OOM at corpus scale.
    Padding rows are dropped on host via the tokenizer masks.
    """
    batches_per_chunk = max(1, (64 << 20) // (4 * hidden_dim * bs))
    host_chunks, dev_outs, masks = [], [], []

    def flush():
        if dev_outs:
            host_chunks.append(np.asarray(jnp.concatenate(dev_outs, axis=0)))
            dev_outs.clear()

    for tokens, lengths, mask in tokenize_corpus(texts, tokenizer, max_len, bs):
        packed = np.concatenate(
            [tokens, lengths[:, None].astype(np.int32)], axis=1
        )
        dev_outs.append(dispatch(packed))
        masks.append(mask.astype(bool))
        if len(dev_outs) >= batches_per_chunk:
            flush()
    flush()
    if not host_chunks:
        return np.zeros((0, hidden_dim), np.float32)
    return np.concatenate(host_chunks, axis=0)[np.concatenate(masks)]


class TextEncoder:
    def __init__(
        self,
        params,
        spec: TwoTowerSpec,
        tokenizer: Tokenizer,
        batch_size: int = 256,
        max_query_len: int = 32,
        max_doc_len: int = 128,
    ):
        # Commit params to device ONCE: host-numpy trees (the artifact load
        # path) would otherwise re-upload every weight — including the
        # [V, E] embedding tables — on every jitted dispatch.
        self.params = jax.tree.map(jnp.asarray, params)
        self.spec = spec
        self.tokenizer = tokenizer
        self.batch_size = batch_size
        self.max_query_len = max_query_len
        self.max_doc_len = max_doc_len
        # corpus-scale encodes amortize per-dispatch round-trips with a
        # bigger batch (the fused kernels B-block internally)
        self.corpus_batch_size = max(batch_size, 1024)

    def _run(self, texts: Sequence[str], fn, max_len: int) -> np.ndarray:
        # batch from a FIXED bucket set {16, 128, corpus_batch_size}: a
        # len(texts)-derived size would compile a fresh executable per
        # request count (6-60s each through a remote relay)
        if len(texts) <= 16:
            bs = 16
        elif len(texts) <= 128:
            bs = 128
        else:
            bs = self.corpus_batch_size
        return run_batched_encode(
            texts, self.tokenizer, max_len, bs, self.spec.hidden_dim,
            lambda packed: fn(self.params, jnp.asarray(packed), self.spec),
        )

    def encode_queries(self, texts: Sequence[str]) -> np.ndarray:
        """[N, H] query-tower embeddings (ref: query_inferencer.py:59-75,
        including the zero-vector result for token-less inputs)."""
        return self._run(texts, _encode_query_packed, self.max_query_len)

    def encode_documents(self, texts: Sequence[str]) -> np.ndarray:
        """[N, H] doc-tower embeddings (ref: backend/main.py:125-133)."""
        return self._run(texts, _encode_document_packed, self.max_doc_len)

    def encode_query(self, text: str) -> np.ndarray:
        """Single query -> [H] (the serving hot path)."""
        return self.encode_queries([text])[0]
