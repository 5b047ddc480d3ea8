"""Device-side retrieval index over raw document embeddings.

Replaces the reference's ChromaDB HNSW collection + offline indexing
notebook (ref: frontend/main.py:74-76, 153-156; frontend/save_to_chromaDB.ipynb):
the corpus embedding matrix lives in device HBM (bf16 by default — halves
the bandwidth per query; int8 row-quantized halves it again) and every
search is an exact score+top-k, auto-dispatched by measured speed
(ops.topk.use_streaming_kernel: segmax Pallas kernel for bf16/f32 on
TPU, two-phase XLA elsewhere). By default no approximate index is built,
persisted, or tuned; "indexing" is one device_put. For corpora beyond
~1M docs, ``index_type='ivf'`` switches to the on-device IVF index
(ops/ivf.py).

Scores are inner products == cosine for normalized towers, matching the
reference's ``1 - distance`` (frontend/main.py:162).

With a multi-device mesh the corpus is row-sharded over 'data' and searches
run through parallel.topk.distributed_topk[_int8] (BASELINE config 4).
"""

from __future__ import annotations

import functools
import json
import os
import time
from pathlib import Path
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from twotowermlretrieval_tpu.ops.topk import (
    fused_topk_segmax,
    fused_topk_segmax_s8,
    quantize_segments,
    topk_segmented,
    topk_segmented_s8,
    use_streaming_kernel,
)

_SUBLANE = 8  # pad query batches to a VPU-friendly multiple
_ROW_TILE = 8192  # corpus rows padded once to the streaming-kernel tile

# Persisted autotune decision (VERDICT r3 #6): the measured winner lives
# with the artifacts so a fleet restart reads a cached decision instead of
# re-paying the per-variant timing chains on every boot. The file carries
# a SIGNATURE (corpus shape, storage dtype, index type, backend) — a
# stale signature invalidates the record rather than mis-applying it.
RETRIEVAL_TUNING_FILE = "retrieval_tuning.json"


def load_retrieval_tuning(artifacts_path) -> Optional[dict]:
    p = Path(artifacts_path) / RETRIEVAL_TUNING_FILE
    if not p.exists():
        return None
    try:
        return json.loads(p.read_text())
    except (OSError, ValueError):
        return None  # unreadable/corrupt records never block serving


def save_retrieval_tuning(artifacts_path, record: dict) -> None:
    """Merge ``record`` into the artifact dir's tuning file (atomic
    publish — a reader never sees a half-written file)."""
    p = Path(artifacts_path) / RETRIEVAL_TUNING_FILE
    merged = load_retrieval_tuning(artifacts_path) or {}
    merged.update(record)
    tmp = p.with_suffix(".json.tmp")
    tmp.write_text(json.dumps(merged, indent=2))
    os.replace(tmp, p)


def _pad_rows(x: np.ndarray) -> np.ndarray:
    """Zero-pad dim 0 to a multiple of the kernel tile (done once at
    construction; search masks the padding via n_valid)."""
    pad = (-x.shape[0]) % _ROW_TILE
    if not pad:
        return x
    widths = ((0, pad),) + ((0, 0),) * (x.ndim - 1)
    return np.pad(x, widths)


# Variant-timing chains for RetrievalIndex.autotune: M kernel calls inside
# ONE jit, data-dependence threaded through the carry so XLA can neither
# hoist nor dead-code them; a host fetch then pays the relay round-trip
# once for all M calls (docs/RESULTS.md timing notes). Corpus arrays are
# ARGUMENTS, never closures — a jit that closes over a large array bakes
# it into the program (remote-compile killer).
@functools.partial(
    jax.jit, static_argnames=("m", "k", "phase2", "srt", "interpret")
)
def _time_chain_s8(q, docs, scales, n_valid, m, k, phase2, srt, interpret):
    def body(acc, _):
        qq = q + acc * 1e-30
        if phase2 == "xla":
            v, _ = topk_segmented_s8(qq, docs, scales, k=k, n_valid=n_valid)
        else:
            v, _ = fused_topk_segmax_s8(
                qq, docs, scales, k=k, interpret=interpret,
                n_valid=n_valid, phase2=phase2, sort_candidates=srt,
            )
        return acc * 0.5 + jnp.sum(v) * 1e-20, None

    acc, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=m)
    return acc


@functools.partial(
    jax.jit, static_argnames=("m", "k", "phase2", "srt", "interpret")
)
def _time_chain(q, docs, n_valid, m, k, phase2, srt, interpret):
    def body(acc, _):
        qq = (q + acc * 1e-30).astype(docs.dtype)
        if phase2 == "xla":
            v, _ = topk_segmented(qq, docs, k=k, n_valid=n_valid)
        else:
            v, _ = fused_topk_segmax(
                qq, docs, k=k, interpret=interpret, n_valid=n_valid,
                phase2=phase2, sort_candidates=srt,
            )
        return acc * 0.5 + jnp.sum(v.astype(jnp.float32)) * 1e-20, None

    acc, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=m)
    return acc


class RetrievalIndex:
    def __init__(
        self,
        doc_embeddings: np.ndarray,  # [N, H] f32 (host)
        storage_dtype: str = "bfloat16",  # 'float32' | 'bfloat16' | 'int8'
        mesh=None,
        use_pallas: Optional[bool] = None,
        interpret: bool = False,
        index_type: str = "exact",  # 'exact' | 'ivf' (approximate, >1M docs)
        nprobe: int = 16,
        num_clusters: int = 0,  # ivf only; 0 = sqrt(N) heuristic
        ivf_index=None,  # prebuilt ops.ivf.IVFIndex (artifact cold-start path)
    ):
        self.num_docs = int(doc_embeddings.shape[0])
        self.dim = int(doc_embeddings.shape[1])
        self.storage_dtype = storage_dtype
        self.mesh = mesh
        self.interpret = interpret
        # fused-kernel phase-2 strategy (ops.topk): re-score the winning
        # segments (default) or gather their phase-1-cached scores, with
        # optionally address-sorted candidate gathers. The best choice is
        # hardware/shape-dependent — autotune() measures on the live
        # corpus and flips these.
        self.phase2 = "rescore"
        self.sort_candidates = False
        # None = auto-dispatch per search by measured speed
        # (ops.topk.use_streaming_kernel): segmax streaming kernel for
        # bf16/f32 on TPU, two-phase XLA for int8/huge batches/CPU.
        # True/False forces the Pallas / XLA path.
        self.use_pallas = use_pallas
        # 'ivf': approximate index for beyond-1M-doc corpora (ops/ivf.py);
        # storage may be f32/bf16/int8 (per-slot quantization). A prebuilt
        # index (exported with the artifacts, ops.ivf.save_ivf) skips the
        # k-means entirely on server cold start. With a mesh the blocks are
        # row-sharded over 'data' and searches run through
        # parallel.ivf.distributed_ivf_search (same probe semantics).
        self.ivf = None
        self.ivf_sharded = None
        if ivf_index is not None:
            index_type = "ivf"
        if index_type == "ivf":
            if ivf_index is None:
                from twotowermlretrieval_tpu.ops.ivf import build_ivf

                ivf_index = build_ivf(
                    np.asarray(doc_embeddings, np.float32),
                    num_clusters=num_clusters, storage_dtype=storage_dtype,
                )
            if mesh is not None:
                from twotowermlretrieval_tpu.parallel.ivf import shard_ivf

                # blocks live sharded on the mesh; no local device copy
                self.ivf_sharded = shard_ivf(ivf_index, mesh)
            else:
                self.ivf = ivf_index
            self.nprobe = nprobe
            self.quantized = ivf_index.scales is not None
            self._n_valid = self.num_docs
            return
        # 'int8' quantizes the corpus per 128-row covering segment
        # (ops.topk.quantize_segments): 2x less HBM + scan traffic than
        # bf16 at ~0.97 top-50 recall vs f32, and the segment-constant
        # scale lets the s8xs8 segmax kernel run at the int8 matmul floor
        # (no dequant in the scan — VERDICT r2 weak #1). Rows are padded
        # to the streaming tile multiple ONCE here — an in-call pad would
        # re-copy the whole corpus on every search.
        self.quantized = storage_dtype == "int8"
        if self.quantized and mesh is not None:
            from twotowermlretrieval_tpu.parallel.topk import shard_corpus_s8

            self._docs, self._scales, self._n_valid = shard_corpus_s8(
                np.asarray(doc_embeddings, np.float32), mesh
            )
        elif self.quantized:
            values, seg_scales = quantize_segments(
                _pad_rows(np.asarray(doc_embeddings, np.float32))
            )
            self._docs = jnp.asarray(values)
            self._scales = jnp.asarray(seg_scales)
            self._n_valid = self.num_docs
        else:
            dtype = jnp.dtype(storage_dtype)
            if mesh is not None:
                from twotowermlretrieval_tpu.parallel.topk import shard_corpus

                self._docs, self._n_valid = shard_corpus(
                    np.asarray(doc_embeddings, np.float32).astype(dtype), mesh
                )
            else:
                self._docs = jnp.asarray(_pad_rows(np.asarray(doc_embeddings))).astype(dtype)
                self._n_valid = self.num_docs

    def search(self, query_embeddings: np.ndarray, k: int) -> Tuple[np.ndarray, np.ndarray]:
        """[B, H] queries -> ([B, k] scores, [B, k] doc ids), exact,
        sorted descending. Replaces ``collection.query(n_results=k)``
        (ref: frontend/main.py:153-156)."""
        q = np.atleast_2d(np.asarray(query_embeddings, np.float32))
        B = q.shape[0]
        k = min(k, self.num_docs)
        pad = (-B) % _SUBLANE
        if pad:
            q = np.concatenate([q, np.zeros((pad, self.dim), np.float32)], axis=0)
        if self.ivf_sharded is not None:
            from twotowermlretrieval_tpu.parallel.ivf import distributed_ivf_search

            vals, ids = distributed_ivf_search(
                jnp.asarray(q), self.ivf_sharded, k=k, nprobe=self.nprobe,
                mesh=self.mesh,
            )
            return np.asarray(vals)[:B], np.asarray(ids)[:B]
        if self.quantized and self.mesh is not None:
            from twotowermlretrieval_tpu.parallel.topk import distributed_topk_s8

            vals, ids = distributed_topk_s8(
                jnp.asarray(q), self._docs, self._scales, k=k, mesh=self.mesh,
                n_valid=self._n_valid, use_pallas=self.use_pallas,
                interpret=self.interpret, phase2=self.phase2,
                sort_candidates=self.sort_candidates,
            )
            return np.asarray(vals)[:B], np.asarray(ids)[:B]
        if self.mesh is not None:
            from twotowermlretrieval_tpu.parallel.topk import distributed_topk

            vals, ids = distributed_topk(
                jnp.asarray(q).astype(self._docs.dtype), self._docs, k=k,
                mesh=self.mesh, n_valid=self._n_valid,
                use_pallas=self.use_pallas, interpret=self.interpret,
                phase2=self.phase2, sort_candidates=self.sort_candidates,
            )
            return np.asarray(vals)[:B], np.asarray(ids)[:B]
        vals, ids = self.traced_search(jnp.asarray(q), self.traced_args(), k)
        return np.asarray(vals)[:B], np.asarray(ids)[:B]

    # -- single-dispatch serving support ---------------------------------
    def traced_args(self) -> Optional[tuple]:
        """The device-resident corpus as an explicit argument tuple for
        ``traced_search``, or None when the search is not traceable inside
        the engine's fused executable (the sharded-IVF path, whose probe
        routing is its own pre-compiled program).

        Mesh exact paths return the SHARDED arrays: their NamedShardings
        ride into the enclosing jit, whose traced shard_map (parallel/
        topk.mapped_topk*) consumes them in place — encode, per-shard
        search and cross-shard merge become one executable (VERDICT r3
        #1 for pod serving).

        Explicit args matter for the enclosing jit (serve/engine.py's
        fused encode+search executable): closing over a corpus-sized
        array would bake 100s of MB into the serialized program."""
        if self.ivf_sharded is not None:
            return None
        if self.ivf is not None:
            return (self.ivf,)
        if self.quantized:
            return (self._docs, self._scales)
        return (self._docs,)

    def traced_search(self, qj, corpus_args: tuple, k: int):
        """Pure traced search: ``qj`` [Bp, H] f32 (Bp already a sublane
        multiple) + the ``traced_args()`` tuple -> ([Bp, k], [Bp, k])
        device arrays. Safe to call inside an enclosing jit — all dispatch
        decisions (index type, dtype, kernel variant) are Python-static
        attributes resolved at trace time, so the engine builds its fused
        executable AFTER ``autotune()`` has settled them."""
        k = min(k, self.num_docs)
        if self.mesh is not None:
            return self._traced_search_mesh(qj, corpus_args, k)
        if self.ivf is not None:
            from twotowermlretrieval_tpu.ops.ivf import ivf_search

            (ivf,) = corpus_args
            return ivf_search(qj, ivf, k=k, nprobe=self.nprobe)
        if self.quantized:
            docs, scales = corpus_args
            if (
                self.use_pallas
                if self.use_pallas is not None
                else jax.default_backend() == "tpu"
            ):
                # the s8 segmax kernel never materializes [B, N] and runs
                # the scan at the s8 matmul floor — always preferred on TPU
                return fused_topk_segmax_s8(
                    qj, docs, scales, k=k, interpret=self.interpret,
                    n_valid=self._n_valid, phase2=self.phase2,
                    sort_candidates=self.sort_candidates,
                )
            return topk_segmented_s8(qj, docs, scales, k=k, n_valid=self._n_valid)
        (docs,) = corpus_args
        qj = qj.astype(docs.dtype)
        if use_streaming_kernel(qj.shape[0], docs.shape[0], self.use_pallas):
            return fused_topk_segmax(
                qj, docs, k=k, interpret=self.interpret,
                n_valid=self._n_valid, phase2=self.phase2,
                sort_candidates=self.sort_candidates,
            )
        return topk_segmented(qj, docs, k=k, n_valid=self._n_valid)

    def _traced_search_mesh(self, qj, corpus_args: tuple, k: int):
        """Mesh twin of ``traced_search``: the same shard_map bodies the
        two-call path jits (parallel/topk), traced HERE inside the engine's
        enclosing fused jit — per-shard scan + O(shards*k) merge compile
        into the one serving executable. The shard_map closure is rebuilt
        per call, which is free on the serving path: the engine's fused
        executable traces once per (bucket, fanout) and caches."""
        import jax.numpy as _jnp

        from twotowermlretrieval_tpu.parallel.mesh import DATA_AXIS
        from twotowermlretrieval_tpu.parallel.topk import (
            mapped_topk,
            mapped_topk_s8,
        )

        num_shards = self.mesh.shape[DATA_AXIS]
        if self.quantized:
            docs, scales = corpus_args
            use_pallas = (
                self.use_pallas
                if self.use_pallas is not None
                else jax.default_backend() == "tpu"
            )
            body = mapped_topk_s8(
                self.mesh, k, bool(use_pallas), self.interpret,
                phase2=self.phase2, sort_candidates=self.sort_candidates,
            )
            return body(qj, docs, scales, _jnp.int32(self._n_valid))
        (docs,) = corpus_args
        qj = qj.astype(docs.dtype)
        shard_rows = docs.shape[0] // num_shards
        use_pallas = use_streaming_kernel(
            qj.shape[0], shard_rows, self.use_pallas
        )
        body = mapped_topk(
            self.mesh, k, use_pallas, self.interpret, quantized=False,
            phase2=self.phase2, sort_candidates=self.sort_candidates,
        )
        return body(qj, docs, _jnp.int32(self._n_valid))

    def tuning_signature(self) -> dict:
        """What the persisted tuning decision is valid FOR: same corpus
        shape, storage dtype, index type and backend. Any mismatch means
        the record was measured for a different program and is ignored."""
        return {
            "num_docs": self.num_docs,
            "dim": self.dim,
            "storage_dtype": self.storage_dtype,
            "index_type": (
                "ivf" if (self.ivf is not None or self.ivf_sharded is not None)
                else "exact"
            ),
            "backend": jax.default_backend(),
        }

    def decision(self) -> dict:
        return {
            "phase2": self.phase2,
            "sort_candidates": self.sort_candidates,
            "use_pallas": self.use_pallas,
        }

    def apply_decision(self, decision: dict) -> None:
        """Apply a persisted autotune decision (the signature must already
        have been validated by the caller)."""
        self.phase2 = str(decision.get("phase2", self.phase2))
        self.sort_candidates = bool(
            decision.get("sort_candidates", self.sort_candidates)
        )
        if decision.get("use_pallas") is not None:
            self.use_pallas = bool(decision["use_pallas"])

    _AUTOTUNE_VARIANTS = (
        ("rescore", False), ("rescore", True),
        ("gather", False), ("gather", True),
        ("xla", False),  # the two-phase XLA path, [B, N] materialized —
        # near-competitive on v5e bf16; other TPU generations may flip it
    )

    def autotune(self, B: int = 8, k: int = 50, iters: int = 20,
                 timer=None) -> dict:
        """Measure the retrieval variants on the LIVE corpus and keep the
        fastest: the fused-kernel phase-2 strategies (sets ``self.phase2``
        / ``self.sort_candidates``) plus the two-phase XLA path (sets
        ``self.use_pallas = False`` when it wins). FAISS-style: the right
        variant depends on hardware generation, corpus size, and batch
        shape, so it is resolved by measurement where the index actually
        runs rather than hard-coded from one machine's numbers.

        Only meaningful where the streaming kernels dispatch (single
        device, non-ivf, TPU unless ``use_pallas`` forces them);
        otherwise a no-op returning {}. Each variant compiles its own
        timing program — through a remote relay that is ~6-60 s per
        variant, so this is opt-in (``ttr-serve --autotune-retrieval``).
        Returns {(phase2, sort_candidates): seconds_per_call}.

        ``timer``: optional ``f(phase2, sort_candidates, B, k, iters) ->
        seconds`` override (tests inject canned values)."""
        if self.ivf is not None or self.ivf_sharded is not None or self.mesh is not None:
            return {}
        kernel_on = (
            self.use_pallas
            if self.use_pallas is not None
            else jax.default_backend() == "tpu"
        )
        if not kernel_on or not (
            self.quantized
            or use_streaming_kernel(B, self._docs.shape[0], self.use_pallas)
        ):
            return {}
        k = min(k, self.num_docs)
        iters = max(iters, 2)  # the timer differences M=1 vs M=iters
        timer = timer or self._time_variant
        results = {v: timer(*v, B, k, iters) for v in self._AUTOTUNE_VARIANTS}
        best = min(results, key=results.get)
        if best[0] == "xla":
            # the two-phase XLA path won: route search() off the fused
            # kernels entirely (phase2/sort are then irrelevant)
            self.use_pallas = False
            self.phase2, self.sort_candidates = "rescore", False
        else:
            self.phase2, self.sort_candidates = best
        return results

    def _time_variant(self, phase2, srt, B, k, iters) -> float:
        """Seconds per search call for one variant: chain `iters` calls
        inside one jit and difference against the 1-call program (host
        fetches on a remote-attached device cost ~24 ms regardless of
        compute, so per-call timing would measure only the relay)."""
        rng = np.random.default_rng(0)
        q = rng.standard_normal((B, self.dim)).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        qj = jnp.asarray(q)
        if self.quantized:
            run = lambda m: float(_time_chain_s8(  # noqa: E731
                qj, self._docs, self._scales, self._n_valid, m, k, phase2,
                srt, self.interpret,
            ))
        else:
            run = lambda m: float(_time_chain(  # noqa: E731
                qj, self._docs, self._n_valid, m, k, phase2, srt,
                self.interpret,
            ))
        run(1)  # compile both program lengths before timing
        run(iters)
        t0 = time.monotonic()
        run(1)
        t1 = time.monotonic()
        run(iters)
        t2 = time.monotonic()
        return max((t2 - t1) - (t1 - t0), 1e-9) / (iters - 1)
