"""Hybrid search engine: dense top-k -> TF-IDF blend -> ranked results.

Implements the reference's two /search branches exactly
(ref: frontend/main.py:102-210):

- ``alpha == 0.0`` -> pure corpus-wide keyword search: TF-IDF cosine against
  the full matrix, top-10 via argpartition, scores <= 1e-5 dropped
  (frontend/main.py:119-147);
- otherwise -> hybrid: query-tower embedding, dense top-``fanout`` (50) from
  the device index, semantic score = cosine (== the reference's
  ``1 - distance``, frontend/main.py:162), TF-IDF cosine for those docs,
  ``final = alpha * dense + (1 - alpha) * tfidf`` (frontend/main.py:187),
  sort, top-10.

Fixed reference quirk (SURVEY.md §7): the fanout docs' TF-IDF rows come
from the precomputed matrix via the doc->index map instead of re-vectorizing
the 50 texts per request (the reference builds ``doc_to_index`` then never
uses it — frontend/main.py:69-70 vs 170-171). Same values, less host work.
"""

from __future__ import annotations

import contextlib
import functools
import threading
import time
from collections import OrderedDict
from pathlib import Path
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from twotowermlretrieval_tpu.models.two_tower import encode_query
from twotowermlretrieval_tpu.ops.tfidf import cosine_similarity, hybrid_blend
from twotowermlretrieval_tpu.serve.index import RetrievalIndex
from twotowermlretrieval_tpu.serve.inferencer import QueryInferencer
from twotowermlretrieval_tpu.train.artifacts import load_artifacts


# Single-dispatch serving (VERDICT r3 #1): query-tower encode + corpus
# top-k as ONE jitted executable, returning ONE packed f32 buffer
# [rows, 2k] = [scores | bitcast(ids)] so each micro-batch costs exactly
# one device dispatch and one host fetch. The reference runs /search as
# two host stages (embed then ANN, frontend/main.py:149-198) and the
# two-call path here previously paid two dispatch+fetch relay round-trips
# per batch. ``index`` is static (hashed by identity — one engine, one
# index) and the corpus rides as an explicit argument tuple: closing over
# it would bake 100s of MB into the serialized program.
@functools.partial(jax.jit, static_argnames=("spec", "k", "index"))
def _fused_encode_search(params, packed, corpus_args, spec, k, index):
    emb = encode_query(params, packed[:, :-1], packed[:, -1], spec)
    vals, ids = index.traced_search(emb, corpus_args, k)
    return jnp.concatenate(
        [
            vals[:, :k].astype(jnp.float32),
            jax.lax.bitcast_convert_type(
                ids[:, :k].astype(jnp.int32), jnp.float32
            ),
        ],
        axis=1,
    )


class _MicroBatcher:
    """Coalesce concurrent calls into one device batch (leader pattern).

    The first caller to arrive becomes the leader: it waits ``window_ms``
    collecting followers, snapshots the queue, runs ``fn`` once over the
    whole batch and distributes results. A caller arriving after the
    snapshot finds an empty queue and becomes the next leader — no request
    is ever dropped. One extra ``window_ms`` of latency buys one device
    dispatch per batch instead of per request.
    """

    def __init__(self, fn, window_ms: float = 2.0, max_wait_s: float = 30.0):
        self._fn = fn
        self._window = window_ms / 1000.0
        self._max_wait = max_wait_s
        self._lock = threading.Lock()
        self._items: list = []

    def submit(self, request):
        event = threading.Event()
        slot: Dict = {}
        with self._lock:
            self._items.append((request, event, slot))
            is_leader = len(self._items) == 1
        if is_leader:
            time.sleep(self._window)
            with self._lock:
                batch, self._items = self._items, []
            try:
                results = self._fn([b[0] for b in batch])
                for (_, ev, sl), r in zip(batch, results):
                    sl["result"] = r
                    ev.set()
            except BaseException as e:  # noqa: BLE001 — followers must never hang
                for _, ev, sl in batch:
                    sl["error"] = e
                    ev.set()
                if not isinstance(e, Exception):
                    raise  # re-raise KeyboardInterrupt/SystemExit in the leader
        if not event.wait(self._max_wait):
            raise TimeoutError("micro-batch leader did not complete in time")
        if "error" in slot:
            raise slot["error"]
        return slot["result"]


class SearchEngine:
    def __init__(
        self,
        artifacts_path: str | Path,
        mesh=None,
        storage_dtype: str = "bfloat16",
        use_pallas: Optional[bool] = None,
        interpret: bool = False,
        batch_window_ms: float = 0.0,  # >0 enables request micro-batching
        index_type: str = "exact",  # 'exact' | 'ivf'
        nprobe: Optional[int] = None,  # None -> persisted tuning or 16
        warmup: Optional[bool] = None,  # compile the search path up front
        cache_size: int = 0,  # >0 enables the LRU response cache
        autotune_retrieval: bool = False,  # measure kernel variants at boot
        profile_dir: Optional[str] = None,  # trace the first N live searches
        profile_requests: int = 20,
    ):
        from twotowermlretrieval_tpu.serve.index import (
            load_retrieval_tuning,
            save_retrieval_tuning,
        )

        loaded = load_artifacts(artifacts_path, require_index=True)
        self.config = loaded.config
        self.documents = loaded.documents
        self.tfidf_vectorizer = loaded.tfidf_vectorizer
        self.tfidf_matrix = loaded.tfidf_matrix
        self.inferencer = QueryInferencer(artifacts_path)
        # Persisted tuning (VERDICT r3 #6): an explicit --nprobe wins; else
        # the value tools/build_index.py measured for THIS corpus; else 16.
        tuning = load_retrieval_tuning(artifacts_path)
        if nprobe is None:
            persisted_nprobe = (tuning or {}).get("nprobe")
            sig = (tuning or {}).get("nprobe_signature", {})
            shape_ok = (
                sig.get("num_docs") == int(loaded.doc_embeddings.shape[0])
                and sig.get("dim") == int(loaded.doc_embeddings.shape[1])
            )
            nprobe = persisted_nprobe if (persisted_nprobe and shape_ok) else 16
        self.index = RetrievalIndex(
            loaded.doc_embeddings,
            storage_dtype=storage_dtype,
            mesh=mesh,
            use_pallas=use_pallas,
            interpret=interpret,
            index_type=index_type,
            nprobe=nprobe,
            # a prebuilt index exported with the artifacts skips cold-start
            # k-means entirely
            ivf_index=loaded.ivf_index if index_type == "ivf" else None,
        )
        self._batcher = (
            _MicroBatcher(self._dense_batch, window_ms=batch_window_ms)
            if batch_window_ms > 0
            else None
        )
        # Opt-in LRU cache of ranked results keyed on the full request
        # (query, alpha, top_k, fanout). All engine state is read-only
        # after init, so entries never go stale; a hit skips both device
        # dispatches — on remote-attached TPUs that is several ~24 ms
        # relay round-trips. Off by default to keep latency behavior
        # identical to the reference.
        self._cache: "Optional[OrderedDict]" = (
            OrderedDict() if cache_size > 0 else None
        )
        self._cache_size = cache_size
        self._cache_lock = threading.Lock()
        self._stats_lock = threading.Lock()
        self._searches = 0
        self._cache_hits = 0
        # Compile the dense search path before serving: the first search
        # otherwise pays XLA compilation (6-60 s through a remote relay),
        # which can starve micro-batch followers past their wait deadline.
        # Every micro-batch bucket is warmed — a burst wider than the
        # smallest bucket would otherwise still hit a cold executable.
        # Autotune BEFORE warmup so the warmed executables are built for
        # the variant that will actually serve (RetrievalIndex.autotune:
        # no-op off the fused-kernel dispatch path).
        if autotune_retrieval:
            timings = self.index.autotune()
            if timings:
                # persist the winner with the artifacts: the next boot
                # (without --autotune-retrieval) applies it with ZERO
                # timing chains (VERDICT r3 #6)
                save_retrieval_tuning(
                    artifacts_path,
                    {
                        "decision_signature": self.index.tuning_signature(),
                        "decision": self.index.decision(),
                        "timings_ms": {
                            f"{p}{'+sorted' if s else ''}": t * 1e3
                            for (p, s), t in timings.items()
                        },
                    },
                )
            if timings:
                # report the index's AUTHORITATIVE post-tune state, not a
                # re-derived winner (the xla-wins case routes via
                # use_pallas=False rather than phase2)
                chosen = (
                    "xla two-phase"
                    if self.index.use_pallas is False
                    else f"phase2={self.index.phase2}"
                    + ("+sorted" if self.index.sort_candidates else "")
                )
                print(
                    "retrieval autotune: "
                    + ", ".join(
                        f"{p}{'+sorted' if s else ''} {t * 1e3:.3f} ms"
                        for (p, s), t in sorted(timings.items())
                    )
                    + f" -> serving with {chosen}"
                )
            else:
                print(
                    "retrieval autotune: no-op — the fused kernels are not "
                    "dispatched on this path (mesh/ivf serving or XLA-only "
                    "backend); serving with the defaults"
                )
        elif tuning and tuning.get("decision") and use_pallas is None:
            # a previous --autotune-retrieval boot persisted its winner;
            # apply it IF it was measured for this exact corpus/backend
            if tuning.get("decision_signature") == self.index.tuning_signature():
                self.index.apply_decision(tuning["decision"])
                d = self.index.decision()
                chosen = (
                    "xla two-phase" if d["use_pallas"] is False
                    else f"phase2={d['phase2']}"
                    + ("+sorted" if d["sort_candidates"] else "")
                )
                print(f"retrieval tuning: applied persisted decision "
                      f"({chosen}) — no startup timing")
            else:
                print("retrieval tuning: persisted record is stale "
                      "(corpus/backend signature mismatch) — serving with "
                      "defaults; re-run with --autotune-retrieval to refresh")
        # Fused single-dispatch path: resolved AFTER autotune so the traced
        # kernel variant is the one autotune settled on. Mesh exact paths
        # fuse too (the shard_map per-shard scan + cross-shard merge traces
        # into the same executable as the encode); only sharded-IVF keeps
        # the two-call structure with a host-side embedding handoff.
        self._corpus_args = self.index.traced_args()
        # Serving-side profiler window (the training driver's --profile_dir
        # twin): a jax.profiler trace spanning the first N LIVE searches —
        # cache hits do no device work and do not consume the window.
        # Lazy start keeps warmup compiles out of the timeline; close()
        # (the CLI's shutdown path) finalizes an unfilled window so the
        # trace is written even when fewer than N searches ever arrive.
        from twotowermlretrieval_tpu.utils.profiling import TraceWindow

        self._profile = (
            TraceWindow(profile_dir, int(profile_requests),
                        what="live searches")
            if profile_dir
            else None
        )
        warmup = warmup if warmup is not None else batch_window_ms > 0
        if warmup:
            for bucket in self._BATCH_BUCKETS:
                self._dense_batch([{"query": "warmup", "fanout": 50}] * bucket)

    def close(self):
        """End-of-life hook (the serving CLI's shutdown path): finalize
        an unfilled profiler window — trace data is only written at
        stop, so exiting mid-window would silently lose the capture."""
        if self._profile is not None:
            self._profile.close()

    def counters(self) -> Dict[str, int]:
        """Engine-level counters for the /metrics surface."""
        with self._stats_lock:
            return {
                "searches_total": self._searches,
                "cache_hits_total": self._cache_hits,
            }

    # Micro-batch sizes are bucketed so each concurrency level does not
    # compile a fresh query-tower executable (the index pads internally;
    # the encoder's own buckets are {16, 128, ...} — see TextEncoder._run).
    _BATCH_BUCKETS = (1, 8, 16, 32)

    def _dense_batch(self, requests: Sequence[Dict]):
        """One batched encode + index search for many concurrent requests;
        each request dict carries {'query', 'fanout'}. The coalesced batch
        is padded up to a fixed bucket size (repeating the first query) so
        distinct concurrency levels share executables. Bursts wider than
        the largest bucket are SPLIT into bucket-sized sub-batches — a
        len(queries)-sized fallback would compile a fresh executable at
        request time for every new concurrency level >32, exactly the
        cold-compile stall the buckets exist to prevent (ADVICE r2)."""
        cap = self._BATCH_BUCKETS[-1]
        if len(requests) > cap:
            results = []
            for i in range(0, len(requests), cap):
                results.extend(self._dense_batch(requests[i : i + cap]))
            return results
        fanout = max(r["fanout"] for r in requests)
        queries = [r["query"] for r in requests]
        bucket = next(b for b in self._BATCH_BUCKETS if b >= len(queries))
        if self._corpus_args is not None:
            # fused path: one dispatch + one fetch for the whole batch.
            # Encode rows are >=16 (a sublane multiple that also keeps the
            # fused recurrent kernels on their B%16 path), so the buckets
            # {1, 8, 16} share ONE executable per fanout.
            rows = max(bucket, 16)
            padded = queries + [queries[0]] * (rows - len(queries))
            tokens, lengths = self.inferencer.tokenizer.encode_batch(
                padded, self.inferencer.encoder.max_query_len
            )
            packed = np.concatenate(
                [tokens, lengths[:, None].astype(np.int32)], axis=1
            )
            kk = min(fanout, self.index.num_docs)
            buf = np.asarray(
                _fused_encode_search(
                    self.inferencer.encoder.params, jnp.asarray(packed),
                    self._corpus_args, spec=self.inferencer.spec, k=kk,
                    index=self.index,
                )
            )
            scores, ids = buf[:, :kk], buf[:, kk:].view(np.int32)
        else:
            padded = queries + [queries[0]] * (bucket - len(queries))
            embs = self.inferencer.get_query_embeddings(padded)
            scores, ids = self.index.search(embs, k=fanout)
        return [
            (scores[i, : r["fanout"]], ids[i, : r["fanout"]])
            for i, r in enumerate(requests)
        ]

    def _dense_search(self, query: str, fanout: int):
        if self._batcher is not None:
            return self._batcher.submit({"query": query, "fanout": fanout})
        return self._dense_batch([{"query": query, "fanout": fanout}])[0]

    # ------------------------------------------------------------------
    def search(
        self, query: str, alpha: float = 0.5, top_k: int = 10, fanout: int = 50
    ) -> Dict:
        """One query -> the reference's response payload
        ({query, alpha, results: [{rank, id, doc, score, dense_score,
        tfidf_score}]}, ref: frontend/main.py:203-210)."""
        start = time.time()
        key = (query, alpha, top_k, fanout)
        results = None
        if self._cache is not None:
            with self._cache_lock:
                if key in self._cache:
                    self._cache.move_to_end(key)
                    results = self._cache[key]
        with self._stats_lock:
            self._searches += 1
            self._cache_hits += results is not None
        if results is None:
            # only LIVE searches count against the profiler window —
            # a cache hit does no device work worth a trace slot
            ctx = (
                self._profile.event()
                if self._profile is not None
                else contextlib.nullcontext()
            )
            with ctx:
                if alpha == 0.0:
                    results = self._keyword_search(query, top_k)
                else:
                    results = self._hybrid_search(query, alpha, top_k, fanout)
            if self._cache is not None:
                with self._cache_lock:
                    self._cache[key] = results
                    while len(self._cache) > self._cache_size:
                        self._cache.popitem(last=False)
        elapsed_ms = (time.time() - start) * 1000
        return {
            "query": query,
            "alpha": alpha,
            "took_ms": elapsed_ms,
            "results": [
                {"rank": i + 1, "id": f"result-{i + 1}", **res}
                for i, res in enumerate(results)
            ],
        }

    # ------------------------------------------------------------------
    def _keyword_search(self, query: str, top_k: int) -> List[Dict]:
        """Pure TF-IDF branch (ref: frontend/main.py:119-147)."""
        query_tfidf = self.tfidf_vectorizer.transform([query])
        all_sims = cosine_similarity(query_tfidf, self.tfidf_matrix).ravel()
        if len(all_sims) > top_k:
            top = np.argpartition(all_sims, -top_k)[-top_k:]
            order = top[np.argsort(all_sims[top])[::-1]]
        else:
            order = np.argsort(all_sims)[::-1]
        results = []
        for idx in order:
            score = float(all_sims[idx])
            if score > 1e-5:  # only actual keyword matches (ref :143)
                results.append(
                    {
                        "doc": self.documents[idx],
                        "score": score,
                        "dense_score": 0.0,
                        "tfidf_score": score,
                    }
                )
        return results

    def _hybrid_search(self, query: str, alpha: float, top_k: int, fanout: int) -> List[Dict]:
        """Dense top-fanout + TF-IDF re-rank (ref: frontend/main.py:149-198)."""
        dense_scores, doc_ids = self._dense_search(query, fanout)
        # IVF paths pad with id -1 (score -3e38) when fewer than fanout real
        # docs were probed; -1 would otherwise wrap to the LAST document
        valid = doc_ids >= 0
        dense_scores, doc_ids = dense_scores[valid], doc_ids[valid]
        if doc_ids.size == 0:
            return []

        query_tfidf = self.tfidf_vectorizer.transform([query])
        if query_tfidf.nnz > 0:
            doc_rows = self.tfidf_matrix[doc_ids]  # precomputed rows (quirk fix)
            tfidf_scores = np.nan_to_num(cosine_similarity(query_tfidf, doc_rows)[0])
        else:
            tfidf_scores = np.zeros(len(doc_ids))

        final = hybrid_blend(dense_scores, tfidf_scores, alpha)
        order = np.argsort(final)[::-1][:top_k]
        return [
            {
                "doc": self.documents[doc_ids[i]],
                "score": float(final[i]),
                "dense_score": float(dense_scores[i]),
                "tfidf_score": float(tfidf_scores[i]),
            }
            for i in order
        ]
