"""IVF approximate index: build invariants + recall vs the exact scan."""

import jax.numpy as jnp
import numpy as np
import pytest

from twotowermlretrieval_tpu.ops.ivf import build_ivf, ivf_search
from twotowermlretrieval_tpu.ops.topk import topk_oracle


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(0)
    # clustered corpus: 40 centers, unit-norm
    centers = rng.standard_normal((40, 64)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    docs = centers[rng.integers(0, 40, 6000)] + 0.25 * rng.standard_normal((6000, 64)).astype(np.float32)
    docs /= np.linalg.norm(docs, axis=1, keepdims=True)
    queries = centers[rng.integers(0, 40, 16)] + 0.25 * rng.standard_normal((16, 64)).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)
    return docs, queries


def test_build_invariants(corpus):
    docs, _ = corpus
    index = build_ivf(docs, num_clusters=64, iters=5, storage_dtype="float32")
    ids = np.asarray(index.ids)
    real = ids[ids >= 0]
    assert len(real) == len(docs) and len(set(real.tolist())) == len(docs)  # a partition
    # blocks: skewed clusters split into shared-centroid blocks, empty
    # clusters contribute none; same leading dim for centroids/docs/ids
    n_blocks = index.docs.shape[0]
    assert n_blocks >= 1
    assert index.docs.shape == (n_blocks, index.cap, 64)
    assert index.centroids.shape == (n_blocks, 64)
    assert index.ids.shape == (n_blocks, index.cap)
    assert index.cap % 128 == 0
    norms = np.linalg.norm(np.asarray(index.centroids), axis=1)
    np.testing.assert_allclose(norms, 1.0, rtol=1e-4)


def test_full_probe_equals_exact(corpus):
    """nprobe == C probes everything -> identical to the exact scan."""
    docs, queries = corpus
    index = build_ivf(docs, num_clusters=32, iters=4, storage_dtype="float32")
    av, ai = ivf_search(jnp.asarray(queries), index, k=10, nprobe=int(index.docs.shape[0]))
    ev, ei = topk_oracle(jnp.asarray(queries), jnp.asarray(docs), 10)
    np.testing.assert_allclose(np.asarray(av), np.asarray(ev), rtol=1e-4, atol=1e-5)
    assert (np.asarray(ai) == np.asarray(ei)).mean() > 0.95  # ties may reorder


def test_recall_at_small_nprobe(corpus):
    docs, queries = corpus
    index = build_ivf(docs, num_clusters=64, iters=8, storage_dtype="bfloat16")
    av, ai = ivf_search(jnp.asarray(queries), index, k=10, nprobe=16)  # probe 1/4
    _, ei = topk_oracle(jnp.asarray(queries), jnp.asarray(docs), 10)
    ai, ei = np.asarray(ai), np.asarray(ei)
    recall = np.mean([len(set(ai[b]) & set(ei[b])) / 10 for b in range(len(ai))])
    assert recall >= 0.9, recall


def test_kmeans_init_ignores_chunk_padding(corpus):
    """N=6000 << the 131072-row kmeans chunk: init must sample only real
    rows, so the effective cluster count stays near C instead of
    collapsing to ~N/chunk (ADVICE r1, medium)."""
    docs, _ = corpus
    index = build_ivf(docs, num_clusters=64, iters=5, storage_dtype="float32")
    ids = np.asarray(index.ids)
    # count distinct non-empty blocks; with zero-seeded centroids nearly
    # all clusters die and everything lands in a handful of blocks
    non_empty = int((ids >= 0).any(axis=1).sum())
    assert non_empty >= 32, f"only {non_empty} non-empty blocks — init collapsed"
    # cap near the mean cluster size => no block is mostly padding
    occupancy = (ids >= 0).sum() / ids.size
    assert occupancy > 0.3, occupancy


def test_int8_ivf_recall_matches_exact(corpus):
    """int8 block storage: recall@50 >= 0.99 vs the exact f32 scan with a
    full probe, isolating the quantization error from the probe-coverage
    error (VERDICT r1 item 6 acceptance bar). At matched nprobe, int8
    recall tracks f32 recall to ~1e-3 (probe coverage dominates both)."""
    docs, queries = corpus
    index = build_ivf(docs, num_clusters=64, iters=8, storage_dtype="int8")
    assert index.scales is not None and np.asarray(index.docs).dtype == np.int8
    full_probe = int(index.docs.shape[0])
    av, ai = ivf_search(jnp.asarray(queries), index, k=50, nprobe=full_probe)
    _, ei = topk_oracle(jnp.asarray(queries), jnp.asarray(docs), 50)
    ai, ei = np.asarray(ai), np.asarray(ei)
    recall = np.mean([len(set(ai[b]) & set(ei[b])) / 50 for b in range(len(ai))])
    assert recall >= 0.99, recall


def test_ivf_persistence_roundtrip(corpus, tmp_path):
    """save_ivf/load_ivf reproduce identical search results for every
    storage dtype (bf16 rides as a uint16 view inside the npz)."""
    from twotowermlretrieval_tpu.ops.ivf import load_ivf, save_ivf

    docs, queries = corpus
    for dtype in ("float32", "bfloat16", "int8"):
        index = build_ivf(docs, num_clusters=32, iters=3, storage_dtype=dtype)
        path = tmp_path / f"ivf_{dtype}.npz"
        save_ivf(path, index)
        loaded = load_ivf(path)
        assert str(np.asarray(loaded.docs).dtype) == str(np.asarray(index.docs).dtype)
        v1, i1 = ivf_search(jnp.asarray(queries), index, k=10, nprobe=8)
        v2, i2 = ivf_search(jnp.asarray(queries), loaded, k=10, nprobe=8)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
        np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-6)


def test_sampled_kmeans_recall(corpus):
    """Lloyd iterations on a corpus sample (the large-corpus build path)
    must still produce a valid partition with near-full recall."""
    docs, queries = corpus
    index = build_ivf(docs, num_clusters=64, iters=8, kmeans_sample=2000)
    ids = np.asarray(index.ids)
    real = ids[ids >= 0]
    assert len(real) == len(docs) and len(set(real.tolist())) == len(docs)
    av, ai = ivf_search(jnp.asarray(queries), index, k=10, nprobe=16)
    _, ei = topk_oracle(jnp.asarray(queries), jnp.asarray(docs), 10)
    ai, ei = np.asarray(ai), np.asarray(ei)
    recall = np.mean([len(set(ai[b]) & set(ei[b])) / 10 for b in range(len(ai))])
    assert recall >= 0.85, recall


def test_pick_nprobe_meets_target_and_is_minimal_rung(corpus):
    """pick_nprobe returns the first doubling rung whose measured recall
    meets the target, and the measurement it reports is reproducible."""
    from twotowermlretrieval_tpu.ops.ivf import pick_nprobe

    docs, queries = corpus
    index = build_ivf(docs, num_clusters=64, iters=8, storage_dtype="float32")
    nprobe, recall = pick_nprobe(
        index, docs, k=10, target_recall=0.95, queries=queries
    )
    assert recall >= 0.95
    assert nprobe >= 1 and (nprobe & (nprobe - 1)) == 0 or nprobe == index.docs.shape[0]
    # the reported recall is what ivf_search actually delivers at that rung
    _, ids = ivf_search(jnp.asarray(queries), index, k=10, nprobe=nprobe)
    _, ei = topk_oracle(jnp.asarray(queries), jnp.asarray(docs), 10)
    ids, ei = np.asarray(ids), np.asarray(ei)
    measured = np.mean([len(set(ids[b]) & set(ei[b])) / 10 for b in range(len(ids))])
    np.testing.assert_allclose(measured, recall, atol=1e-9)
    # the previous rung (if any) must have missed the target — minimality
    if nprobe > 1:
        _, ids_prev = ivf_search(jnp.asarray(queries), index, k=10, nprobe=nprobe // 2)
        ids_prev = np.asarray(ids_prev)
        prev = np.mean([len(set(ids_prev[b]) & set(ei[b])) / 10 for b in range(len(ids_prev))])
        assert prev < 0.95


def test_pick_nprobe_unreachable_target_returns_ceiling(corpus):
    """A target above what even exhaustive probing delivers returns C and
    the honest measured recall (f32 storage: 1.0 at nprobe=C up to ties)."""
    from twotowermlretrieval_tpu.ops.ivf import pick_nprobe

    docs, queries = corpus
    index = build_ivf(docs, num_clusters=32, iters=4, storage_dtype="float32")
    nprobe, recall = pick_nprobe(
        index, docs, k=10, target_recall=1.01, queries=queries  # impossible
    )
    assert nprobe == index.docs.shape[0]
    assert recall > 0.99  # exhaustive probe of f32 blocks == exact (ties aside)


def test_pick_nprobe_sampled_queries_default(corpus):
    """Without an explicit query set, corpus rows are sampled as probes
    (self-retrieval proxy) and the tuner still converges."""
    from twotowermlretrieval_tpu.ops.ivf import pick_nprobe

    docs, _ = corpus
    index = build_ivf(docs, num_clusters=64, iters=8, storage_dtype="bfloat16")
    nprobe, recall = pick_nprobe(index, docs, k=10, target_recall=0.9,
                                 num_queries=32)
    assert recall >= 0.9 or nprobe == index.docs.shape[0]
