"""Fused top-k kernel vs the lax.top_k oracle (SURVEY.md §4 numerics tests).

On CPU the kernel runs in Pallas interpret mode; the same code path compiles
natively on TPU (exercised by bench.py / the serving drive).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from twotowermlretrieval_tpu.ops.topk import fused_topk, topk_oracle, topk_segmented

INTERPRET = jax.default_backend() != "tpu"


def _data(rng, B=8, N=1000, H=32, normalized=True):
    q = rng.normal(size=(B, H)).astype(np.float32)
    d = rng.normal(size=(N, H)).astype(np.float32)
    if normalized:
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(q), jnp.asarray(d)


def test_oracle_matches_numpy(rng):
    q, d = _data(rng)
    vals, ids = topk_oracle(q, d, 10)
    scores = np.asarray(q) @ np.asarray(d).T
    np_ids = np.argsort(-scores, axis=1)[:, :10]
    np.testing.assert_array_equal(np.asarray(ids), np_ids)
    np.testing.assert_allclose(np.asarray(vals), np.take_along_axis(scores, np_ids, 1), rtol=1e-5)


@pytest.mark.parametrize("N,tile_n", [(1000, 256), (256, 256), (4096, 512)])
def test_fused_matches_oracle(rng, N, tile_n):
    q, d = _data(rng, B=8, N=N, H=32)
    k = 50
    ref_vals, ref_ids = topk_oracle(q, d, k)
    vals, ids = fused_topk(q, d, k=k, tile_n=tile_n, interpret=INTERPRET)
    np.testing.assert_allclose(np.asarray(vals), np.asarray(ref_vals), rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(ref_ids))


def test_fused_non_multiple_padding(rng):
    # N deliberately not a multiple of tile_n: padding rows must never win
    q, d = _data(rng, B=4, N=777, H=16)
    ref_vals, ref_ids = topk_oracle(q, d, 20)
    vals, ids = fused_topk(q, d, k=20, tile_n=256, interpret=INTERPRET)
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(ref_ids))
    assert (np.asarray(ids) < 777).all()


def test_fused_bf16_storage(rng):
    q, d = _data(rng, B=4, N=512, H=32)
    d16 = d.astype(jnp.bfloat16)
    vals, ids = fused_topk(q, d16, k=10, tile_n=256, interpret=INTERPRET)
    # bf16 scoring: the top-sets should broadly agree with f32
    ref_vals, ref_ids = topk_oracle(q, d, 10)
    overlap = np.mean([
        len(set(np.asarray(ids)[i]) & set(np.asarray(ref_ids)[i])) / 10 for i in range(4)
    ])
    assert overlap > 0.8
    assert vals.dtype == jnp.float32  # f32 accumulation regardless of storage


def test_fused_negative_scores_beat_padding(rng):
    # all-negative scores: zero-padding rows (score 0) must still lose
    q = jnp.asarray(-np.abs(rng.normal(size=(2, 8))).astype(np.float32))
    d = jnp.asarray(np.abs(rng.normal(size=(300, 8))).astype(np.float32))
    vals, ids = fused_topk(q, d, k=5, tile_n=256, interpret=INTERPRET)
    assert (np.asarray(vals) < 0).all()
    assert (np.asarray(ids) < 300).all()


def test_fused_k_larger_than_corpus_raises(rng):
    q, d = _data(rng, B=2, N=10, H=8)
    with pytest.raises(ValueError):
        fused_topk(q, d, k=50, tile_n=256, interpret=INTERPRET)


def test_fused_sorted_descending(rng):
    q, d = _data(rng, B=8, N=2000, H=32)
    vals, _ = fused_topk(q, d, k=50, tile_n=512, interpret=INTERPRET)
    v = np.asarray(vals)
    assert (np.diff(v, axis=1) <= 1e-7).all()


@pytest.mark.parametrize("N,seg", [(1000, 128), (777, 128), (4096, 64), (100, 128)])
def test_segmented_matches_oracle(rng, N, seg):
    q, d = _data(rng, B=8, N=N, H=32)
    k = min(50, N)
    ref_vals, ref_ids = topk_oracle(q, d, k)
    vals, ids = topk_segmented(q, d, k=k, segment=seg)
    np.testing.assert_allclose(np.asarray(vals), np.asarray(ref_vals), rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(ref_ids))


def test_segmented_clustered_scores(rng):
    # adversarial: many top scores inside ONE segment (covering argument)
    d = rng.normal(size=(1024, 16)).astype(np.float32) * 0.01
    d[256:288] += 10.0  # 32 near-identical high-score docs in one segment
    q = np.ones((2, 16), np.float32)
    ref_vals, ref_ids = topk_oracle(jnp.asarray(q), jnp.asarray(d), 40)
    vals, ids = topk_segmented(jnp.asarray(q), jnp.asarray(d), k=40, segment=128)
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(ref_ids))


# ---------------------------------------------------------------------------
# int8 row-quantized corpus
# ---------------------------------------------------------------------------


def test_quantize_rows_roundtrip():
    from twotowermlretrieval_tpu.ops.topk import quantize_rows

    rng = np.random.default_rng(0)
    x = rng.standard_normal((100, 64)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    values, scales = quantize_rows(x)
    assert values.dtype == np.int8 and scales.dtype == np.float32
    deq = values.astype(np.float32) * scales[:, None]
    # symmetric int8 of unit-norm rows: elementwise error bounded by scale/2
    assert np.abs(deq - x).max() <= (scales.max() / 2) + 1e-7
    # zero rows quantize without NaN/inf
    v0, s0 = quantize_rows(np.zeros((3, 8), np.float32))
    assert np.all(v0 == 0) and np.all(np.isfinite(s0))


def test_fused_topk_int8_matches_segmented():
    """Kernel vs the XLA int8 fallback on the same quantized corpus — both
    score in bf16, so ids/values must agree."""
    from twotowermlretrieval_tpu.ops.topk import (
        fused_topk_int8,
        quantize_rows,
        topk_segmented_int8,
    )

    rng = np.random.default_rng(1)
    docs = rng.standard_normal((3000, 128)).astype(np.float32)
    docs /= np.linalg.norm(docs, axis=1, keepdims=True)
    q = rng.standard_normal((8, 128)).astype(np.float32)
    values, scales = quantize_rows(docs)
    kv, ki = fused_topk_int8(
        jnp.asarray(q), jnp.asarray(values), jnp.asarray(scales),
        k=20, tile_n=1024, interpret=True,
    )
    sv, si = topk_segmented_int8(jnp.asarray(q), jnp.asarray(values), jnp.asarray(scales), k=20)
    np.testing.assert_allclose(np.asarray(kv), np.asarray(sv), rtol=1e-5, atol=1e-5)
    assert (np.asarray(ki) == np.asarray(si)).mean() > 0.95  # ties may reorder


def test_int8_index_recall_vs_f32():
    from twotowermlretrieval_tpu.ops.topk import quantize_rows, topk_oracle, topk_segmented_int8

    rng = np.random.default_rng(2)
    docs = rng.standard_normal((4000, 64)).astype(np.float32)
    docs /= np.linalg.norm(docs, axis=1, keepdims=True)
    q = rng.standard_normal((16, 64)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    values, scales = quantize_rows(docs)
    _, ref_ids = topk_oracle(jnp.asarray(q), jnp.asarray(docs), 50)
    _, i8_ids = topk_segmented_int8(jnp.asarray(q), jnp.asarray(values), jnp.asarray(scales), k=50)
    ref_ids, i8_ids = np.asarray(ref_ids), np.asarray(i8_ids)
    recall = np.mean([
        len(set(ref_ids[b]) & set(i8_ids[b])) / 50 for b in range(q.shape[0])
    ])
    assert recall >= 0.9, recall


def test_streaming_dispatch_rule():
    """Auto-dispatch by measured speed: segmax streaming kernel for
    bf16/f32, two-phase XLA for int8 (and for huge query batches) until
    the score matrix would not fit; explicit flags always win."""
    import jax

    from twotowermlretrieval_tpu.ops.topk import use_streaming_kernel

    assert use_streaming_kernel(8, 1_000_000, True) is True
    assert use_streaming_kernel(8, 1_000_000, False) is False
    on_tpu = jax.default_backend() == "tpu"
    # bf16/f32: the segmax kernel wins at every size (TPU only)
    assert use_streaming_kernel(8, 1_000_000, None) is on_tpu
    # int8: XLA two-phase until the scores blow past 256 MB
    assert use_streaming_kernel(8, 1_000_000, None, quantized=True) is False
    assert use_streaming_kernel(256, 10_000_000, None, quantized=True) is on_tpu
    # huge query batches exceed the segmax VMEM budget -> size rule again
    assert use_streaming_kernel(512, 1_000_000, None) is False
    assert use_streaming_kernel(512, 10_000_000, None) is on_tpu


# ---------------------------------------------------------------------------
# segment-max streaming kernel (the TPU streaming path)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("N,tile_n", [(1000, 256), (777, 256), (4096, 512), (100, 128)])
def test_segmax_kernel_matches_oracle(rng, N, tile_n):
    from twotowermlretrieval_tpu.ops.topk import fused_topk_segmax

    q, d = _data(rng, B=8, N=N, H=32)
    k = min(50, N)
    ref_vals, ref_ids = topk_oracle(q, d, k)
    vals, ids = fused_topk_segmax(q, d, k=k, tile_n=tile_n, interpret=INTERPRET)
    np.testing.assert_allclose(np.asarray(vals), np.asarray(ref_vals), rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(ref_ids))


def test_segmax_kernel_negative_scores_beat_padding(rng):
    from twotowermlretrieval_tpu.ops.topk import fused_topk_segmax

    q = jnp.asarray(-np.abs(rng.normal(size=(2, 8))).astype(np.float32))
    d = jnp.asarray(np.abs(rng.normal(size=(300, 8))).astype(np.float32))
    vals, ids = fused_topk_segmax(q, d, k=5, tile_n=256, interpret=INTERPRET)
    assert (np.asarray(vals) < 0).all()
    assert (np.asarray(ids) < 300).all()


def test_segmax_kernel_prepadded_corpus(rng):
    """The serving index pads rows once and passes n_valid; results must
    match the unpadded corpus exactly."""
    from twotowermlretrieval_tpu.ops.topk import fused_topk_segmax

    q, d = _data(rng, B=4, N=900, H=16)
    padded = jnp.concatenate([d, jnp.zeros((124, 16), d.dtype)])
    ref_vals, ref_ids = topk_oracle(q, d, 20)
    vals, ids = fused_topk_segmax(q, padded, k=20, tile_n=256, interpret=INTERPRET, n_valid=900)
    np.testing.assert_allclose(np.asarray(vals), np.asarray(ref_vals), rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(ref_ids))


def test_segmax_int8_matches_segmented(rng):
    from twotowermlretrieval_tpu.ops.topk import (
        fused_topk_segmax_int8,
        quantize_rows,
        topk_segmented_int8,
    )

    docs = rng.standard_normal((3000, 128)).astype(np.float32)
    docs /= np.linalg.norm(docs, axis=1, keepdims=True)
    q = rng.standard_normal((8, 128)).astype(np.float32)
    values, scales = quantize_rows(docs)
    kv, ki = fused_topk_segmax_int8(
        jnp.asarray(q), jnp.asarray(values), jnp.asarray(scales),
        k=20, tile_n=1024, interpret=True,
    )
    sv, si = topk_segmented_int8(jnp.asarray(q), jnp.asarray(values), jnp.asarray(scales), k=20)
    np.testing.assert_allclose(np.asarray(kv), np.asarray(sv), rtol=1e-5, atol=1e-5)
    assert (np.asarray(ki) == np.asarray(si)).mean() > 0.95
