"""IVF (inverted-file) approximate retrieval index, TPU-first.

The exact fused scan (ops/topk.py) is sub-ms over 1M docs; IVF is the
scale headroom beyond that (BASELINE.json north star: "brute-force/IVF
top-k retrieval kernel"). Design:

- **k-means on device**: spherical Lloyd iterations as dense XLA —
  assignment is one [N, H] @ [H, C] MXU matmul + argmax, the update a
  ``segment_sum`` scatter-add (N·C·H FLOPs per iteration; ~seconds for
  1M×128×1024 on one chip).
- **Static shapes throughout**: clusters are padded to a common capacity
  (a multiple of 128 lanes) and the corpus is reordered into a dense
  [C, cap, H] tensor plus an id map [C, cap] (−1 = padding). No ragged
  structures, no host-side inverted lists — "the index" is three arrays.
- **Skew-proof blocks**: capacity is set near the MEAN cluster size and
  oversized clusters split into multiple blocks sharing a centroid — a
  popular cluster's blocks tie in the probe scores and naturally claim
  several top-``nprobe`` slots, so padding never dominates the gather.
- **Search** = centroid matmul → top-``nprobe`` blocks → gather those
  blocks → score [B, nprobe·cap] on the MXU → ``lax.top_k``. Probe
  traffic is ``nprobe·cap·H`` bytes/query vs the full corpus for the
  exact scan. Measured (one v5e chip, clustered 4M×128 bf16 corpus,
  8-query batch): 1.19 ms vs 4.82 ms exact at recall@50 = 0.998
  (nprobe=16). The exact scan stays the right choice at ≤1M docs.

This replaces the role of the reference's ChromaDB HNSW (ref:
frontend/main.py:74-76) at corpus sizes where even the exact scan's
HBM pass is too slow, while staying a pure-array, jit-compatible design.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class IVFIndex(NamedTuple):
    centroids: jax.Array  # [C, H] f32, unit-norm
    docs: jax.Array  # [C, cap, H] storage dtype (f32/bf16/int8)
    ids: jax.Array  # [C, cap] int32, -1 for padding slots
    cap: int
    scales: Optional[jax.Array] = None  # [C, cap] f32, int8 storage only


_KMEANS_CHUNK = 131072  # bounds the [chunk, C] score tile to ~0.5-1 GB


def _pad_to_chunks(docs: jax.Array):
    """Reshape [N, H] into [num_chunks, chunk, H] for the Lloyd scan.

    The chunk width is capped by _KMEANS_CHUNK AND chosen so the scan runs
    at least ~4 iterations: XLA fully unrolls 1-2-step scans and the
    unrolled segment_sum fusion is pathologically slow on TPU (measured
    16 s/iteration for a length-2 scan vs 0.3 s for the same data as 4+
    chunks on v5e)."""
    N = docs.shape[0]
    chunk = min(_KMEANS_CHUNK, max(128, (-(-N // 4) + 127) // 128 * 128))
    pad = (-N) % chunk
    if pad:
        docs = jnp.concatenate([docs, jnp.zeros((pad, docs.shape[1]), docs.dtype)])
    return docs.reshape(-1, chunk, docs.shape[1])


@functools.partial(jax.jit, static_argnames=("num_segments",))
def _lloyd_step(chunked_docs, centroids, num_segments):
    """One spherical Lloyd iteration, scanning the corpus in chunks so the
    [chunk, C] score tile (not [N, C]) is the peak HBM cost. Zero padding
    rows contribute zero vectors to whatever cluster they argmax into.
    ``chunked_docs`` is an argument — a closure would bake the corpus into
    the compiled program as a constant."""

    def body(sums, chunk):
        scores = jnp.dot(chunk, centroids.T, preferred_element_type=jnp.float32)
        assign = jnp.argmax(scores, axis=1)
        return sums + jax.ops.segment_sum(chunk, assign, num_segments=num_segments), None

    sums, _ = jax.lax.scan(
        body, jnp.zeros((num_segments, chunked_docs.shape[-1]), jnp.float32), chunked_docs
    )
    norms = jnp.linalg.norm(sums, axis=1, keepdims=True)
    # empty clusters keep their previous centroid
    return jnp.where(norms > 1e-6, sums / jnp.maximum(norms, 1e-6), centroids)


@jax.jit
def _assign_chunk(chunk, centroids):
    return jnp.argmax(
        jnp.dot(chunk, centroids.T, preferred_element_type=jnp.float32), axis=1
    )


def _kmeans(
    chunked: jax.Array, n_real: int, num_clusters: int, iters: int, seed: int
) -> jax.Array:
    """Spherical k-means over pre-chunked [nc, chunk, H] docs; returns
    unit-norm centroids [C, H] f32. Init samples only the ``n_real``
    leading rows — the chunk tail is zero padding, and seeding centroids
    from it would collapse the effective cluster count for any corpus much
    smaller than the chunk width (ADVICE r1)."""
    flat = chunked.reshape(-1, chunked.shape[-1])
    key = jax.random.key(seed)
    init_idx = jax.random.choice(key, n_real, (num_clusters,), replace=False)
    centroids = flat[init_idx]
    for _ in range(iters):
        centroids = _lloyd_step(chunked, centroids, num_clusters)
    return centroids


def build_ivf(
    doc_embeddings: np.ndarray,  # [N, H] f32 (host), assumed ~unit-norm
    num_clusters: int = 0,  # 0 = sqrt(N) rounded to a multiple of 8
    iters: int = 10,
    storage_dtype: str = "bfloat16",
    seed: int = 0,
    kmeans_sample: int = 0,  # >0: Lloyd iterations run on <= this many rows
) -> IVFIndex:
    """Cluster the corpus and reorder it into dense [C, cap, H] blocks.
    storage_dtype 'int8' row-quantizes each packed slot (scale = max|row|/127,
    kept in ``scales``) — half the probe gather traffic of bf16.

    ``kmeans_sample > 0`` runs the Lloyd iterations on a uniform sample (the
    standard large-corpus recipe — centroid quality converges long before
    the full corpus is needed, and each Lloyd pass costs N·C·H FLOPs); only
    the final assignment scans every row. Worth it for N >> 1M on
    co-located hardware; the default clusters on all rows (on a
    remote-attached chip the extra program compile outweighs the saved
    device time at 1M scale — docs/RESULTS.md).
    """
    x = np.asarray(doc_embeddings, np.float32)
    N, H = x.shape
    if not num_clusters:
        num_clusters = max(8, int(round(np.sqrt(N) / 8)) * 8)
    num_clusters = min(num_clusters, N)

    if kmeans_sample and N > kmeans_sample:
        sample_idx = np.random.default_rng(seed).choice(N, kmeans_sample, replace=False)
        train_rows, n_train = x[sample_idx], kmeans_sample
    else:
        train_rows, n_train = x, N
    centroids = _kmeans(_pad_to_chunks(jnp.asarray(train_rows)), n_train, num_clusters, iters, seed)
    chunked = _pad_to_chunks(jnp.asarray(x))
    assign = np.concatenate(
        [np.asarray(_assign_chunk(c, centroids)) for c in chunked]
    )[:N]

    counts = np.bincount(assign, minlength=num_clusters)
    # Block capacity near the MEAN cluster size (not the max): skewed
    # clusters would otherwise set the pad width for everyone and the
    # probe's gather volume would be mostly padding. Oversized clusters
    # are split into multiple blocks that share a centroid — their blocks
    # tie in the probe scores, so a popular cluster naturally receives
    # several of the top-nprobe slots.
    mean = max(int(counts[counts > 0].mean()) if (counts > 0).any() else 128, 1)
    cap = max(128, int(-(-mean // 128) * 128))
    # empty clusters contribute ZERO blocks (their stale centroids would
    # otherwise waste probe slots on all-padding gathers)
    blocks_per_cluster = -(-counts // cap)
    n_blocks = int(blocks_per_cluster.sum())
    block_of_cluster_start = np.concatenate([[0], np.cumsum(blocks_per_cluster)[:-1]])

    # vectorized packing: sort by cluster; a row's block = cluster's first
    # block + (rank within cluster) // cap, its slot = rank % cap
    order = np.argsort(assign, kind="stable")
    sorted_assign = assign[order]
    starts = np.searchsorted(sorted_assign, np.arange(num_clusters))
    rank = np.arange(N) - starts[sorted_assign]
    block = block_of_cluster_start[sorted_assign] + rank // cap
    slot = rank % cap
    packed = np.zeros((n_blocks, cap, H), np.float32)
    ids = np.full((n_blocks, cap), -1, np.int32)
    packed[block, slot] = x[order]
    ids[block, slot] = order.astype(np.int32)
    block_centroids = np.asarray(centroids)[
        np.repeat(np.arange(num_clusters), blocks_per_cluster)
    ]

    if storage_dtype == "int8":
        absmax = np.abs(packed).max(axis=-1)  # [n_blocks, cap]
        scales = (absmax / 127.0).astype(np.float32)
        safe = np.where(scales > 0, scales, 1.0)
        values = np.rint(packed / safe[..., None]).astype(np.int8)
        return IVFIndex(
            centroids=jnp.asarray(block_centroids),
            docs=jnp.asarray(values),
            ids=jnp.asarray(ids),
            cap=cap,
            scales=jnp.asarray(scales),
        )

    return IVFIndex(
        centroids=jnp.asarray(block_centroids),
        docs=jnp.asarray(packed).astype(jnp.dtype(storage_dtype)),
        ids=jnp.asarray(ids),
        cap=cap,
    )


def save_ivf(path, index: IVFIndex) -> None:
    """Persist the three-array (plus optional scales) index as one .npz —
    the offline/online split the reference gets from its ChromaDB store
    (ref: frontend/save_to_chromaDB.ipynb): build once at export, load at
    serve with no k-means on the cold-start path. bfloat16 payloads ride as
    a uint16 view (npz has no native bf16)."""
    docs = np.asarray(index.docs)
    docs_dtype = str(docs.dtype)
    if docs_dtype == "bfloat16":
        docs = docs.view(np.uint16)
    arrays = dict(
        centroids=np.asarray(index.centroids),
        docs=docs,
        docs_dtype=np.asarray(docs_dtype),
        ids=np.asarray(index.ids),
        cap=np.asarray(index.cap, np.int32),
    )
    if index.scales is not None:
        arrays["scales"] = np.asarray(index.scales)
    np.savez(path, **arrays)


def load_ivf(path) -> IVFIndex:
    """Inverse of :func:`save_ivf`; arrays go straight to device."""
    with np.load(path) as z:
        docs = z["docs"]
        docs_dtype = str(z["docs_dtype"])
        if docs_dtype == "bfloat16":
            import ml_dtypes

            docs = docs.view(ml_dtypes.bfloat16)
        return IVFIndex(
            centroids=jnp.asarray(z["centroids"]),
            docs=jnp.asarray(docs),
            ids=jnp.asarray(z["ids"]),
            cap=int(z["cap"]),
            scales=jnp.asarray(z["scales"]) if "scales" in z.files else None,
        )


IVF_INDEX_FILE = "ivf_index.npz"


@functools.partial(jax.jit, static_argnames=("k", "nprobe"))
def ivf_search(
    queries: jax.Array,  # [B, H]
    index: IVFIndex,
    k: int = 50,
    nprobe: int = 32,
) -> Tuple[jax.Array, jax.Array]:
    """Approximate top-k. Returns ([B, k] scores, [B, k] ORIGINAL doc ids),
    sorted descending; ids are -1 when fewer than k real docs were probed."""
    B, H = queries.shape
    C = index.centroids.shape[0]
    nprobe = min(nprobe, C)
    q = queries.astype(jnp.float32)

    c_scores = jnp.dot(q, index.centroids.T, preferred_element_type=jnp.float32)  # [B, C]
    _, probe = jax.lax.top_k(c_scores, nprobe)  # [B, nprobe]

    blocks = index.docs[probe]  # [B, nprobe, cap, H] (gather)
    block_ids = index.ids[probe]  # [B, nprobe, cap]
    if index.scales is not None:
        # int8 rows: dot in f32 (the gather already paid the bandwidth;
        # the in-register upcast is free), then per-slot dequant scale
        scores = jnp.einsum(
            "bh,bpch->bpc", q, blocks.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        ) * index.scales[probe]
        scores = scores.reshape(B, -1)
    else:
        scores = jnp.einsum(
            "bh,bpch->bpc", q.astype(blocks.dtype), blocks,
            preferred_element_type=jnp.float32,
        ).reshape(B, -1)
    flat_ids = block_ids.reshape(B, -1)
    scores = jnp.where(flat_ids >= 0, scores, jnp.float32(-3.0e38))

    k_eff = min(k, scores.shape[1])
    vals, pos = jax.lax.top_k(scores, k_eff)
    out_ids = jnp.take_along_axis(flat_ids, pos, axis=1)
    if k_eff < k:  # fewer probed columns than k: pad to the promised shape
        vals = jnp.pad(vals, ((0, 0), (0, k - k_eff)), constant_values=-3.0e38)
        out_ids = jnp.pad(out_ids, ((0, 0), (0, k - k_eff)), constant_values=-1)
    return vals, jnp.where(vals <= -3.0e38, -1, out_ids)


def pick_nprobe(
    index: IVFIndex,
    doc_embeddings: np.ndarray,  # [N, H] f32, row i = original doc id i
    k: int = 50,
    target_recall: float = 0.99,
    num_queries: int = 256,
    queries: Optional[np.ndarray] = None,  # real query embeddings, if any
    seed: int = 0,
) -> Tuple[int, float]:
    """Smallest nprobe whose measured recall@k vs EXACT search meets
    ``target_recall`` — the recall/latency dial resolved by measurement
    instead of folklore. Recall is hardware-independent, so this runs
    anywhere (CPU included) and the result transfers to the serving chip;
    run it once at index-build time (``ttr-build-index --target-recall``)
    and serve with the returned value (``ttr-serve --nprobe``).

    Probe queries default to ``num_queries`` sampled corpus rows
    (self-retrieval proxy, the standard stand-in when no query
    distribution is available); pass ``queries`` for a real sample.
    Walks nprobe up a doubling ladder (1, 2, 4, ... C), so at most
    log2(C)+1 search compiles. Returns (nprobe, measured_recall) for the
    first rung meeting the target, or (C, recall) if even exhaustive
    probing misses it (at nprobe=C every packed slot is scored, so f32 /
    bf16 storage recalls 1.0 by construction; int8 storage can still
    fall short of the f32-exact oracle by its quantization error)."""
    from twotowermlretrieval_tpu.ops.topk import topk_oracle

    d = np.asarray(doc_embeddings, np.float32)
    if queries is None:
        rng = np.random.default_rng(seed)
        sample = rng.choice(d.shape[0], size=min(num_queries, d.shape[0]),
                            replace=False)
        queries = d[sample]
    q = jnp.asarray(np.asarray(queries, np.float32))
    k = min(k, d.shape[0])
    _, exact_ids = topk_oracle(q, jnp.asarray(d), k)
    exact_sets = [set(np.asarray(row).tolist()) for row in exact_ids]

    C = int(index.centroids.shape[0])
    nprobe = 1
    while True:
        _, ids = ivf_search(q, index, k=k, nprobe=nprobe)
        ids = np.asarray(ids)
        recall = float(
            np.mean([
                len(exact_sets[b].intersection(ids[b].tolist())) / k
                for b in range(ids.shape[0])
            ])
        )
        if recall >= target_recall or nprobe >= C:
            return min(nprobe, C), recall
        nprobe = min(nprobe * 2, C)
