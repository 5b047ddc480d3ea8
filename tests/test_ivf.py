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
