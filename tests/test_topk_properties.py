"""Property-based tests over the top-k kernel family (hypothesis).

The fixed-seed tests in test_topk.py pin known shapes; here the SHAPE
SPACE itself is explored — ragged corpus sizes vs tile/segment widths,
n_valid boundaries, every phase-2 variant — against the lax.top_k oracle
(f32 path) or by score-recompute consistency (s8 path, where integer
score ties make id-order comparisons ill-posed). Data stays benign
random normals (ties in continuous f32 scores are measure-zero); the
adversarial axis is the shapes.

Strategy draws are (seed, shape) tuples rather than raw arrays so each
example costs one small trace, and sizes are bounded to keep the
interpret-mode runtime in CI territory.
"""

import jax
import jax.numpy as jnp
import numpy as np
from hypothesis import given, settings, strategies as st

from twotowermlretrieval_tpu.ops.topk import (
    fused_topk_segmax,
    fused_topk_segmax_s8,
    quantize_segments,
    topk_oracle,
    topk_segmented,
    topk_segmented_s8,
)

INTERPRET = jax.default_backend() != "tpu"

_EXAMPLES = 20  # per property; each distinct shape pays one trace


def _make(seed, B, N, H):
    rng = np.random.default_rng(seed)
    q = rng.standard_normal((B, H)).astype(np.float32)
    d = rng.standard_normal((N, H)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return q, d


shapes = st.tuples(
    st.integers(0, 2**31 - 1),  # seed
    st.integers(1, 9),  # B
    st.integers(130, 640),  # N (ragged vs the 128 segment / 256 tile)
    st.sampled_from([8, 16, 32]),  # H
)


@settings(max_examples=_EXAMPLES, deadline=None, derandomize=True)
@given(
    shapes,
    st.integers(1, 40),  # k
    st.sampled_from(["rescore", "gather"]),
    st.booleans(),
    st.booleans(),  # whether to shrink n_valid below N
)
def test_segmax_matches_oracle_everywhere(shape, k, phase2, srt, cut):
    seed, B, N, H = shape
    q, d = _make(seed, B, N, H)
    n_valid = max(k, N - (N // 5)) if cut else None
    if cut:
        d[n_valid:] = 0.0
    k = min(k, n_valid or N)
    vals, ids = fused_topk_segmax(
        jnp.asarray(q), jnp.asarray(d), k=k, tile_n=256,
        interpret=INTERPRET, n_valid=n_valid, phase2=phase2,
        sort_candidates=srt,
    )
    o_vals, o_ids = topk_oracle(
        jnp.asarray(q), jnp.asarray(d[: n_valid or N]), k
    )
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(o_ids))
    np.testing.assert_allclose(
        np.asarray(vals), np.asarray(o_vals), rtol=2e-5, atol=1e-6
    )


@settings(max_examples=_EXAMPLES, deadline=None, derandomize=True)
@given(shapes, st.integers(1, 40))
def test_two_phase_xla_matches_oracle_everywhere(shape, k):
    seed, B, N, H = shape
    q, d = _make(seed, B, N, H)
    k = min(k, N)
    vals, ids = topk_segmented(jnp.asarray(q), jnp.asarray(d), k=k)
    o_vals, o_ids = topk_oracle(jnp.asarray(q), jnp.asarray(d), k)
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(o_ids))
    np.testing.assert_allclose(
        np.asarray(vals), np.asarray(o_vals), rtol=2e-5, atol=1e-6
    )


def _host_quantized_scores(q, values, scales):
    """The doubly-quantized serving metric, recomputed in numpy:
    (q_i8 . d_i8) * seg_scale * q_scale — the ground truth both s8 paths
    must report (ops/topk.py module comment)."""
    q_absmax = np.abs(q).max(axis=1, keepdims=True)
    q_scale = np.where(q_absmax == 0.0, 1.0, q_absmax / 127.0)
    q_i8 = np.clip(np.round(q / q_scale), -127, 127).astype(np.int8)
    scores = q_i8.astype(np.int64) @ values.astype(np.int64).T  # exact
    seg_scale = np.repeat(scales, 128)[None, : values.shape[0]]
    return scores.astype(np.float64) * seg_scale * q_scale


@settings(max_examples=_EXAMPLES, deadline=None, derandomize=True)
@given(
    shapes,
    st.integers(1, 40),
    st.sampled_from(["rescore", "gather"]),
    st.booleans(),
)
def test_s8_paths_report_true_quantized_scores(shape, k, phase2, srt):
    """Every (id, val) the s8 kernel and its XLA twin return is the true
    doubly-quantized score of that doc, the two paths' VALUES agree
    bitwise, and the value sequence equals the top-k of the host-computed
    metric (id order under integer ties is legitimately free)."""
    seed, B, N, H = shape
    q, d = _make(seed, B, N, H)
    pad = (-N) % 128
    d_padded = np.concatenate([d, np.zeros((pad, H), np.float32)]) if pad else d
    values, scales = quantize_segments(d_padded)
    k = min(k, N)
    kw = dict(k=k, n_valid=N)
    f_vals, f_ids = fused_topk_segmax_s8(
        jnp.asarray(q), jnp.asarray(values), jnp.asarray(scales),
        tile_n=256, interpret=INTERPRET, phase2=phase2,
        sort_candidates=srt, **kw,
    )
    x_vals, x_ids = topk_segmented_s8(
        jnp.asarray(q), jnp.asarray(values), jnp.asarray(scales), **kw
    )
    f_vals, f_ids = np.asarray(f_vals), np.asarray(f_ids)
    np.testing.assert_array_equal(f_vals, np.asarray(x_vals))

    host = _host_quantized_scores(q, values, scales)[:, :N]
    top_host = -np.sort(-host, axis=1)[:, :k]
    np.testing.assert_allclose(f_vals, top_host.astype(np.float32), rtol=1e-6)
    for b in range(B):
        np.testing.assert_allclose(
            f_vals[b], host[b, f_ids[b]].astype(np.float32), rtol=1e-6
        )


@settings(max_examples=10, deadline=None, derandomize=True)
@given(shapes)
def test_k_beyond_n_valid_pads_with_sentinels(shape):
    """k larger than the real corpus: the tail is (-1, NEG_INF) padding,
    the head is the exact result."""
    seed, B, N, H = shape
    q, d = _make(seed, B, N, H)
    n_valid = min(20, N - 1)
    d[n_valid:] = 0.0
    k = n_valid + 5
    vals, ids = fused_topk_segmax(
        jnp.asarray(q), jnp.asarray(d), k=k, tile_n=256,
        interpret=INTERPRET, n_valid=n_valid,
    )
    vals, ids = np.asarray(vals), np.asarray(ids)
    assert (ids[:, n_valid:] == -1).all()
    o_vals, o_ids = topk_oracle(jnp.asarray(q), jnp.asarray(d[:n_valid]), n_valid)
    np.testing.assert_array_equal(ids[:, :n_valid], np.asarray(o_ids))
    np.testing.assert_allclose(
        vals[:, :n_valid], np.asarray(o_vals), rtol=2e-5, atol=1e-6
    )


@settings(max_examples=15, deadline=None, derandomize=True)
@given(
    st.tuples(
        st.integers(0, 2**31 - 1),
        st.integers(1, 6),  # B
        st.integers(150, 900),  # N
        st.sampled_from([8, 16]),  # H
    ),
    st.integers(1, 30),  # k
    st.sampled_from(["float32", "bfloat16", "int8"]),
)
def test_retrieval_index_matches_oracle_everywhere(shape, k, dtype):
    """The serving surface end to end: RetrievalIndex.search over any
    (storage dtype, ragged N, B, k) returns the exact oracle ids for f32
    and >= 0.9 recall for the lossy storages (bf16 rounding / int8
    quantization can legitimately reorder near-ties)."""
    from twotowermlretrieval_tpu.serve.index import RetrievalIndex

    seed, B, N, H = shape
    q, d = _make(seed, B, N, H)
    k = min(k, N)
    index = RetrievalIndex(d, storage_dtype=dtype, use_pallas=False)
    vals, ids = index.search(q, k=k)
    assert vals.shape == (B, k) and ids.shape == (B, k)
    assert (ids >= 0).all() and (ids < N).all()
    assert (np.diff(vals, axis=1) <= 1e-6).all()  # sorted descending
    o_vals, o_ids = topk_oracle(jnp.asarray(q), jnp.asarray(d), k)
    o_ids = np.asarray(o_ids)
    if dtype == "float32":
        np.testing.assert_array_equal(ids, o_ids)
        np.testing.assert_allclose(
            vals, np.asarray(o_vals), rtol=2e-5, atol=1e-6
        )
    else:
        recall = np.mean(
            [len(set(ids[b]) & set(o_ids[b])) / k for b in range(B)]
        )
        assert recall >= 0.9, (dtype, recall)
