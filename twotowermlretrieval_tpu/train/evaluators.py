"""Evaluation protocols, metric-for-metric equivalents of the reference's
three evaluators (ref: backend/evaluators.py).

- :class:`BatchEvaluator` — in-batch protocol: every validation query is
  scored against every validation *positive* document; the positive for
  query i sits at column i of ``Q @ D^T`` (ref: evaluators.py:49-65).
  Produces MRR + Recall@{1,5,10} + average validation triplet loss.
- :class:`CorpusEvaluator` — multi-positive protocol over a candidate pool
  capped at ``max_candidates`` (default 1000) with ``max_queries`` (50)
  sampled queries; Recall@k = found/available positives, Hit@k = any found
  (ref: evaluators.py:83-209), skipping queries whose positives were sampled
  out of the pool (ref: evaluators.py:189-192).
- :class:`TestEvaluator` — qualitative top-k printout with ground-truth
  markers (ref: evaluators.py:212-285).

TPU-first: embeddings come from the jitted towers in fixed-shape batches,
and rank/top-k math runs as device matmuls + ``lax.top_k`` instead of
per-query Python loops. Sampling uses seeded RNGs (the reference uses the
global ``random`` module — unreproducible; we keep the same distribution
but pin the stream).
"""

from __future__ import annotations

import random
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from twotowermlretrieval_tpu.encoder import TextEncoder

Triplet = Tuple[str, str, str]


def _block_ranks(q_block: jax.Array, d_embs: jax.Array, offset: int) -> jax.Array:
    """Ranks (1-based) of each block query's positive — global query
    ``offset + r``'s positive sits at column ``offset + r`` of the full
    similarity (ref: evaluators.py:59-65). Ties resolve as a STABLE
    descending sort would (equal scores at earlier columns rank first):
    strictly-greater counting alone would give every exactly-tied score —
    e.g. the all-zero rows of empty/OOV queries, or duplicated passages —
    rank 1 and systematically inflate MRR/Recall@1."""
    sim = jnp.dot(q_block, d_embs.T, preferred_element_type=jnp.float32)
    rows = jnp.arange(q_block.shape[0])
    pos_col = offset + rows
    diag = sim[rows, pos_col]
    cols = jnp.arange(sim.shape[1])[None, :]
    greater = jnp.sum(sim > diag[:, None], axis=1)
    ties_before = jnp.sum((sim == diag[:, None]) & (cols < pos_col[:, None]), axis=1)
    return 1 + greater + ties_before


def ranks_of_diagonal(sim: np.ndarray) -> np.ndarray:
    """Rank (1-based) of sim[i, i] within row i — the reference's
    sort-position semantics (evaluators.py:59-65), with stable-sort tie
    handling (see _block_ranks)."""
    diag = np.diag(sim)
    cols = np.arange(sim.shape[1])[None, :]
    pos_col = np.arange(sim.shape[0])[:, None]
    greater = (sim > diag[:, None]).sum(axis=1)
    ties_before = ((sim == diag[:, None]) & (cols < pos_col)).sum(axis=1)
    return 1 + greater + ties_before


class BatchEvaluator:
    """In-batch retrieval eval (ref: evaluators.py:9-80)."""

    def __init__(self, top_k: Sequence[int] = (1, 5, 10)):
        self.top_k = tuple(top_k)

    # Row-block width for the rank computation: peak device memory is
    # O(block * N) instead of the full [N, N] similarity (which matches the
    # reference protocol but OOMs at full-validation scale).
    rank_block_rows = 4096

    def evaluate(self, eval_step, state, batcher, sharding=None) -> Tuple[Dict[str, float], float]:
        """eval_step: jitted fn over (state, packed [B, W] buffer) ->
        (q_emb, pos_emb, {'val_loss'}); batcher: TripletBatcher over the
        validation split; sharding: optional NamedSharding for the packed
        batch (mesh runs). Returns (metrics, avg_val_loss)."""
        # Keep per-batch results on device and fetch once: per-batch host
        # fetches cost a full round-trip each on remote-attached TPUs. Each
        # batch ships as ONE packed buffer (prefetched), unpacked on device
        # inside eval_step.
        from twotowermlretrieval_tpu.data.batching import prefetch_packed_to_device

        dev_q, dev_p, masks = [], [], []
        dev_loss = None
        num_batches = 0

        def tracked():
            for batch in batcher.batches(seed=None):
                masks.append(batch.example_mask.astype(bool))
                yield batch

        for packed in prefetch_packed_to_device(tracked(), sharding=sharding):
            q, p, m = eval_step(state, packed)
            dev_q.append(q)
            dev_p.append(p)
            dev_loss = m["val_loss"] if dev_loss is None else dev_loss + m["val_loss"]
            num_batches += 1
        if not dev_q:
            return {}, 0.0

        real = np.concatenate(masks)
        # Embeddings stay on device (ref protocol scores every query against
        # every positive, evaluators.py:53); ranks are computed in row
        # blocks so only [block, N] similarity is ever materialized, and
        # only the [N] rank vector is fetched.
        q_embs = jnp.concatenate(dev_q)[real]
        d_embs = jnp.concatenate(dev_p)[real]
        total_loss = float(dev_loss)
        ranks = np.concatenate(
            [
                np.asarray(_block_ranks(q_embs[i : i + self.rank_block_rows], d_embs, i))
                for i in range(0, q_embs.shape[0], self.rank_block_rows)
            ]
        )
        metrics = {f"Recall@{k}": float((ranks <= k).mean()) for k in self.top_k}
        metrics["MRR"] = float((1.0 / ranks).mean())
        return metrics, total_loss / max(num_batches, 1)


class CorpusEvaluator:
    """Multi-positive corpus eval (ref: evaluators.py:83-209)."""

    def __init__(
        self,
        top_k: Sequence[int] = (1, 5, 10),
        max_candidates: int = 1000,
        max_queries: int = 50,
        seed: int = 0,
    ):
        self.top_k = tuple(top_k)
        self.max_candidates = max_candidates
        self.max_queries = max_queries
        self.seed = seed

    def evaluate(self, encoder: TextEncoder, val_data: Sequence[Triplet]) -> Dict[str, float]:
        if not val_data:
            return {}
        rng = random.Random(self.seed)

        # 1. group positives per query; pool = all unique docs
        # (ref: evaluators.py:107-121) — insertion-ordered for determinism
        # where the reference's set() ordering is hash-randomized.
        query_to_positives: Dict[str, set] = {}
        all_docs: Dict[str, None] = {}
        for query, pos_doc, neg_doc in val_data:
            query_to_positives.setdefault(query, set()).add(pos_doc)
            all_docs.setdefault(pos_doc)
            all_docs.setdefault(neg_doc)
        unique_queries = list(query_to_positives.keys())
        unique_docs = list(all_docs.keys())
        if len(unique_docs) > self.max_candidates:
            unique_docs = rng.sample(unique_docs, self.max_candidates)

        # 2. pre-compute document embeddings (ref: evaluators.py:162-175)
        doc_embs = encoder.encode_documents(unique_docs)
        doc_set = set(unique_docs)

        # 3. sample queries, batch-encode, device top-k
        sample_queries = rng.sample(unique_queries, min(self.max_queries, len(unique_queries)))
        q_embs = encoder.encode_queries(sample_queries)
        k_max = min(max(self.top_k), len(unique_docs))
        sim = jnp.dot(jnp.asarray(q_embs), jnp.asarray(doc_embs).T, preferred_element_type=jnp.float32)
        _, top_idx = jax.lax.top_k(sim, k_max)
        top_idx = np.asarray(top_idx)

        metrics: Dict[str, List[float]] = {f"Recall@{k}": [] for k in self.top_k}
        metrics.update({f"Hit@{k}": [] for k in self.top_k})
        for qi, query in enumerate(sample_queries):
            known_positives = query_to_positives[query]
            available = [d for d in known_positives if d in doc_set]
            if not available:
                continue  # ref: evaluators.py:189-192
            retrieved = [unique_docs[j] for j in top_idx[qi]]
            for k in self.top_k:
                top_docs = retrieved[:k]
                found = sum(1 for d in top_docs if d in known_positives)
                metrics[f"Recall@{k}"].append(found / len(available))
                metrics[f"Hit@{k}"].append(1.0 if found > 0 else 0.0)

        return {
            name: float(np.mean(vals)) if vals else 0.0 for name, vals in metrics.items()
        }


class TestEvaluator:
    """Qualitative eval with ground-truth markers (ref: evaluators.py:212-285)."""

    def __init__(self, num_examples: int = 10, top_k: int = 5, seed: int = 0):
        self.num_examples = num_examples
        self.top_k = top_k
        self.seed = seed

    def evaluate(
        self, encoder: TextEncoder, test_data: Sequence[Triplet], print_fn=print
    ) -> List[Dict]:
        if not test_data:
            return []
        rng = random.Random(self.seed)

        all_queries = list(dict.fromkeys(t[0] for t in test_data))
        all_docs: Dict[str, None] = {}
        ground_truth: Dict[str, set] = {}
        for query, pos_doc, neg_doc in test_data:
            ground_truth.setdefault(query, set()).add(pos_doc)
            all_docs.setdefault(pos_doc)
            all_docs.setdefault(neg_doc)
        unique_docs = list(all_docs.keys())

        doc_embs = encoder.encode_documents(unique_docs)
        sample_queries = rng.sample(all_queries, min(self.num_examples, len(all_queries)))
        q_embs = encoder.encode_queries(sample_queries)
        k = min(self.top_k, len(unique_docs))
        sim = jnp.dot(jnp.asarray(q_embs), jnp.asarray(doc_embs).T, preferred_element_type=jnp.float32)
        top_scores, top_idx = jax.lax.top_k(sim, k)
        top_scores, top_idx = np.asarray(top_scores), np.asarray(top_idx)

        results = []
        for qi, query in enumerate(sample_queries):
            positives = ground_truth.get(query, set())
            retrieved = []
            found = 0
            print_fn(f"\nQuery: {query}")
            for rank in range(k):
                doc = unique_docs[top_idx[qi, rank]]
                is_positive = doc in positives
                found += int(is_positive)
                marker = "+" if is_positive else "-"
                print_fn(f"  {rank + 1}. [{marker}] {doc[:100]} (score {top_scores[qi, rank]:.4f})")
                retrieved.append({"doc": doc, "score": float(top_scores[qi, rank]), "positive": is_positive})
            print_fn(f"  found {found}/{len(positives)} ground-truth positives in top {k}")
            results.append({"query": query, "retrieved": retrieved, "found": found, "total_positives": len(positives)})
        return results
