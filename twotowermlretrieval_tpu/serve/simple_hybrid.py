"""Self-contained in-memory hybrid retriever (library path).

Equivalent of the reference's ``SimpleHybridRetriever``
(ref: backend/simple_hybrid.py:13-86): fit on an in-memory document list
(TF-IDF max_features=10000 + dense embeddings), then ``search`` blends
``alpha * dense + (1 - alpha) * tfidf`` and returns (document, score)
pairs.

Fixed reference quirk (SURVEY.md §7): the reference embeds *documents*
through the *query* tower (simple_hybrid.py:39). Tower choice is explicit
here (``doc_tower=True`` default — consistent with the main app's indexing
path, ref backend/main.py:130 — pass False to reproduce the reference's
shortcut).
"""

from __future__ import annotations

from pathlib import Path
from typing import List, Optional, Tuple

import numpy as np

from twotowermlretrieval_tpu.ops.tfidf import TfidfVectorizer, cosine_similarity, hybrid_blend
from twotowermlretrieval_tpu.serve.index import RetrievalIndex
from twotowermlretrieval_tpu.serve.inferencer import QueryInferencer


class SimpleHybridRetriever:
    def __init__(
        self,
        artifacts_path: str | Path,
        alpha: float = 0.5,
        doc_tower: bool = True,
        max_features: int = 10000,
        use_pallas: Optional[bool] = None,
        interpret: bool = False,
        storage_dtype: str = "float32",  # f32 default: bit-parity with the
        # reference's brute-force numpy cosine (the serving engine's bf16
        # default trades ~1e-2 score wobble for bandwidth; this library
        # path is the reference-equivalent one, so it keeps exact scores)
    ):
        self.dense_retriever = QueryInferencer(artifacts_path)
        self.alpha = alpha
        self.doc_tower = doc_tower
        self.tfidf = TfidfVectorizer(max_features=max_features)
        self.documents: List[str] = []
        self.tfidf_matrix = None
        self.index: Optional[RetrievalIndex] = None
        self._use_pallas = use_pallas
        self._interpret = interpret
        self._storage_dtype = storage_dtype

    def fit(self, documents: List[str]) -> None:
        """Fit TF-IDF + embed the corpus (ref: simple_hybrid.py:28-43)."""
        self.documents = list(documents)
        self.tfidf_matrix = self.tfidf.fit_transform(self.documents)
        if self.doc_tower:
            embs = self.dense_retriever.get_document_embeddings(self.documents)
        else:  # reference-faithful shortcut: query tower for documents
            embs = self.dense_retriever.get_query_embeddings(self.documents)
        self.index = RetrievalIndex(
            embs, storage_dtype=self._storage_dtype,
            use_pallas=self._use_pallas, interpret=self._interpret,
        )

    def search(self, query: str, top_k: int = 10) -> List[Tuple[str, float]]:
        """(document, blended score) pairs, best first
        (ref: simple_hybrid.py:45-66)."""
        if self.index is None:
            raise RuntimeError("call fit() before search()")
        query_tfidf = self.tfidf.transform([query])
        tfidf_scores = cosine_similarity(query_tfidf, self.tfidf_matrix)[0]

        query_emb = self.dense_retriever.get_query_embedding(query)
        # brute force over the whole corpus, like the reference — but on
        # device: k = corpus size gives dense scores for every doc
        k = len(self.documents)
        dense_ranked, ids = self.index.search(query_emb[None, :], k=k)
        dense_scores = np.zeros(k, np.float64)
        dense_scores[ids[0]] = dense_ranked[0]

        combined = hybrid_blend(dense_scores, tfidf_scores, self.alpha)
        order = np.argsort(combined)[::-1][:top_k]
        return [(self.documents[i], float(combined[i])) for i in order]
