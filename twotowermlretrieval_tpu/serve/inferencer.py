"""Serving-side model loader + query embedder.

API-compatible with the reference's ``QueryInferencer``
(ref: backend/query_inferencer.py:20-100): construct from an artifact
directory, call ``get_query_embedding(str) -> np.ndarray[H]``. Preserved
behaviors: architecture rebuilt from the persisted config (VOCAB_SIZE /
EMBED_DIM included, query_inferencer.py:36-49), zero-vector for token-less
queries (query_inferencer.py:65-69).

Fixed reference quirk (SURVEY.md §7): no module-import side effects — the
reference reads ``frontend/config.json`` with a CWD-relative path at import
time (query_inferencer.py:14-15), making it importable only from the repo
root. Here everything is constructor-injected.
"""

from __future__ import annotations

from pathlib import Path
from typing import Sequence

import numpy as np

from twotowermlretrieval_tpu.encoder import TextEncoder
from twotowermlretrieval_tpu.train.artifacts import load_artifacts


class QueryInferencer:
    def __init__(self, artifacts_path: str | Path, batch_size: int = 8):
        loaded = load_artifacts(artifacts_path, require_index=False)
        self.config = loaded.config
        self.tokenizer = loaded.tokenizer
        self.params = loaded.params
        self.spec = loaded.spec
        self.encoder = TextEncoder(
            self.params, self.spec, self.tokenizer,
            batch_size=batch_size,
            max_query_len=self.config.max_query_len,
            max_doc_len=self.config.max_doc_len,
        )

    def get_query_embedding(self, query: str) -> np.ndarray:
        """[H] query-tower embedding; zero vector when the query has no
        known tokens (ref: query_inferencer.py:59-75). The zero-vector
        guard lives in the encoder itself (masked towers encode empty
        input to exact zeros), so host and device agree."""
        return self.encoder.encode_query(query)

    def get_query_embeddings(self, queries: Sequence[str]) -> np.ndarray:
        """Batched [N, H] variant (absent in the reference — it embeds one
        query per request)."""
        return self.encoder.encode_queries(queries)

    def get_document_embeddings(self, documents: Sequence[str]) -> np.ndarray:
        """Doc-tower embeddings, exposed so callers can pick the tower
        explicitly (the reference's SimpleHybridRetriever silently used the
        query tower for documents — simple_hybrid.py:39)."""
        return self.encoder.encode_documents(documents)
