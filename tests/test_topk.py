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
    bf16/f32, two-phase XLA for int8 (and for bulk query batches) until
    the score matrix would not fit; explicit flags always win. The rule is
    backend-pinned here so the TPU policy is asserted even on the CPU CI
    mesh (ADVICE r2: the old test only matched the CPU branch)."""
    from twotowermlretrieval_tpu.ops.topk import use_streaming_kernel

    assert use_streaming_kernel(8, 1_000_000, True) is True
    assert use_streaming_kernel(8, 1_000_000, False) is False
    # non-TPU backends always take the XLA path
    assert use_streaming_kernel(8, 1_000_000, None, backend="cpu") is False
    # bf16/f32 on TPU: the segmax kernel wins at every size up to B=256
    assert use_streaming_kernel(8, 1_000_000, None, backend="tpu") is True
    # int8: XLA two-phase until the scores blow past 256 MB
    assert use_streaming_kernel(8, 1_000_000, None, quantized=True, backend="tpu") is False
    assert use_streaming_kernel(256, 10_000_000, None, quantized=True, backend="tpu") is True
    # bulk query batches: size rule again (the kernels shrink their tile
    # to keep the [tile_n, B] score tile inside the VMEM budget)
    assert use_streaming_kernel(512, 100_000, None, backend="tpu") is False
    assert use_streaming_kernel(512, 1_000_000, None, backend="tpu") is True
    assert use_streaming_kernel(512, 10_000_000, None, backend="tpu") is True


def test_fit_tile_n_vmem_budget():
    """tile_n shrinks so the [tile_n, B] f32 score tile fits scoped VMEM,
    stays a multiple of 8*128, and never drops below the Mosaic minimum."""
    from twotowermlretrieval_tpu.ops.topk import (
        _MAX_KERNEL_B,
        _MIN_TILE_N,
        _SCORES_VMEM_BUDGET,
        _fit_tile_n,
    )

    assert _fit_tile_n(8192, 8) == 8192  # serving shape: untouched
    assert _fit_tile_n(8192, 256) == 8192  # boundary: 8 MB exactly
    for B in (257, 512, 1024, 2048):
        t = _fit_tile_n(8192, B)
        assert t * B * 4 <= _SCORES_VMEM_BUDGET
        assert t % _MIN_TILE_N == 0 and t >= _MIN_TILE_N
    assert _fit_tile_n(8192, _MAX_KERNEL_B) == _MIN_TILE_N


def test_segmax_bulk_batch_query_blocking(rng):
    """B > _MAX_KERNEL_B takes the query-blocking path (one corpus pass per
    block) and still matches the oracle exactly."""
    from twotowermlretrieval_tpu.ops import topk as topk_mod
    from twotowermlretrieval_tpu.ops.topk import fused_topk_segmax

    q, d = _data(rng, B=12, N=700, H=16)
    ref_vals, ref_ids = topk_oracle(q, d, 10)
    # shrink the blocking threshold so the path runs at test sizes
    orig = topk_mod._MAX_KERNEL_B
    topk_mod._MAX_KERNEL_B = 5
    try:
        vals, ids = fused_topk_segmax(q, d, k=10, tile_n=256, interpret=INTERPRET)
    finally:
        topk_mod._MAX_KERNEL_B = orig
    np.testing.assert_allclose(np.asarray(vals), np.asarray(ref_vals), rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(ref_ids))


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


# ---------------------------------------------------------------------------
# s8 x s8 per-segment quantized kernel
# ---------------------------------------------------------------------------


def _seg_quant_oracle(q, values, seg_scales, k):
    """Exact top-k under the kernel's doubly-quantized metric:
    (q_i8 . d_i8) * scale_seg * scale_q."""
    q = np.asarray(q, np.float32)
    qmax = np.abs(q).max(axis=1, keepdims=True)
    q_scale = np.where(qmax == 0, 1.0, qmax / 127.0)
    q_i8 = np.clip(np.rint(q / q_scale), -127, 127)
    scores = (q_i8 @ np.asarray(values, np.float32).T)
    scores *= np.repeat(np.asarray(seg_scales), 128)[None, :]
    scores *= q_scale
    ids = np.argsort(-scores, axis=1, kind="stable")[:, :k]
    return np.take_along_axis(scores, ids, axis=1), ids


def test_quantize_segments_roundtrip():
    from twotowermlretrieval_tpu.ops.topk import quantize_segments

    rng = np.random.default_rng(0)
    x = rng.standard_normal((512, 32)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    values, scales = quantize_segments(x)
    assert values.dtype == np.int8 and scales.shape == (4,)
    recon = values.astype(np.float32) * np.repeat(scales, 128)[:, None]
    err = np.abs(recon - x).max()
    assert err <= scales.max() / 2 + 1e-6  # one quantization step
    # all-zero segment: scale 1.0, values 0
    z_vals, z_scales = quantize_segments(np.zeros((128, 8), np.float32))
    assert (z_vals == 0).all() and z_scales[0] == 1.0


@pytest.mark.parametrize("N,n_valid", [(1024, None), (1024, 900), (512, 130)])
def test_segmax_s8_matches_quantized_oracle(rng, N, n_valid):
    from twotowermlretrieval_tpu.ops.topk import fused_topk_segmax_s8, quantize_segments

    q, d = _data(rng, B=8, N=N, H=32)
    d_np = np.asarray(d)
    if n_valid is not None:
        d_np = d_np.copy()
        d_np[n_valid:] = 0.0  # the index pads with zero rows
    values, scales = quantize_segments(d_np)
    k = 20
    vals, ids = fused_topk_segmax_s8(
        q, jnp.asarray(values), jnp.asarray(scales), k=k,
        tile_n=256, interpret=INTERPRET, n_valid=n_valid,
    )
    ref_vals, ref_ids = _seg_quant_oracle(
        np.asarray(q), values, scales, k + 10
    )
    limit = N if n_valid is None else n_valid
    # padding ids never returned
    assert (np.asarray(ids) < limit).all() and (np.asarray(ids) >= 0).all()
    # exact under the quantized metric (drop oracle rows pointing past
    # n_valid before comparing)
    for b in range(8):
        want = [i for i in ref_ids[b] if i < limit][:k]
        np.testing.assert_array_equal(np.asarray(ids)[b], want)


def test_segmax_s8_all_negative_scores_with_padding(rng):
    """All-real-scores-negative + zero padding rows: the unmasked phase-1
    maxima promote padding segments, and the widened phase-2 candidate set
    must still recover the true (negative-score) top-k."""
    from twotowermlretrieval_tpu.ops.topk import fused_topk_segmax_s8, quantize_segments

    H = 16
    q = jnp.asarray(np.abs(rng.normal(size=(2, H))).astype(np.float32))
    d = -np.abs(rng.normal(size=(384, H))).astype(np.float32)
    d_pad = np.concatenate([d, np.zeros((128, H), np.float32)])  # one fake segment
    values, scales = quantize_segments(d_pad)
    vals, ids = fused_topk_segmax_s8(
        q, jnp.asarray(values), jnp.asarray(scales), k=5,
        tile_n=256, interpret=INTERPRET, n_valid=384,
    )
    assert (np.asarray(vals) < 0).all()
    assert (np.asarray(ids) < 384).all() and (np.asarray(ids) >= 0).all()
    ref_vals, ref_ids = _seg_quant_oracle(np.asarray(q), values[:384], scales[:3], 5)
    np.testing.assert_array_equal(np.asarray(ids), ref_ids)


@pytest.mark.parametrize("N,n_valid", [(1024, None), (1000, None), (1024, 900)])
def test_segmax_gather_phase2_matches_rescore(rng, N, n_valid):
    """phase2='gather' (score-cache kernel) selects the same ids as the
    re-score path and the oracle. Values may differ from the re-score
    path by float accumulation order (cached scores come from the phase-1
    kernel dot; re-score recomputes with a separate XLA dot), so values
    are compared with a tight tolerance rather than bitwise."""
    from twotowermlretrieval_tpu.ops.topk import fused_topk_segmax

    q, d = _data(rng, B=8, N=N, H=32)
    if n_valid is not None:
        d = d.at[n_valid:].set(0.0)
    k = 20
    g_vals, g_ids = fused_topk_segmax(
        q, d, k=k, tile_n=256, interpret=INTERPRET, n_valid=n_valid,
        phase2="gather",
    )
    r_vals, r_ids = fused_topk_segmax(
        q, d, k=k, tile_n=256, interpret=INTERPRET, n_valid=n_valid,
        phase2="rescore",
    )
    np.testing.assert_array_equal(np.asarray(g_ids), np.asarray(r_ids))
    np.testing.assert_allclose(np.asarray(g_vals), np.asarray(r_vals), rtol=1e-6)
    o_vals, o_ids = topk_oracle(q, d[: n_valid or N], k)
    np.testing.assert_array_equal(np.asarray(g_ids), np.asarray(o_ids))
    np.testing.assert_allclose(np.asarray(g_vals), np.asarray(o_vals), rtol=1e-5)


def test_segmax_gather_phase2_beyond_unroll_falls_back(rng):
    """B beyond the unroll bound silently uses the re-score path (the
    score cache write grows with B while its benefit does not)."""
    from twotowermlretrieval_tpu.ops.topk import (
        _PHASE2_UNROLL_MAX_B, fused_topk_segmax,
    )

    B = _PHASE2_UNROLL_MAX_B + 1
    q, d = _data(rng, B=B, N=512, H=16)
    vals, ids = fused_topk_segmax(
        q, d, k=10, tile_n=256, interpret=INTERPRET, phase2="gather"
    )
    o_vals, o_ids = topk_oracle(q, d, 10)
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(o_ids))


@pytest.mark.parametrize("phase2", ["rescore", "gather"])
def test_segmax_sorted_candidates_match_oracle(rng, phase2):
    """sort_candidates=True (ascending-address phase-2 gathers) returns
    the same result set — the final top-k re-ranks the candidate union,
    so candidate order is free up to exact score ties (a bitwise tie at
    the k boundary may legitimately resolve to the other doc; this fixed
    seed produces none, so the assertions below can stay bitwise)."""
    from twotowermlretrieval_tpu.ops.topk import (
        fused_topk_segmax, fused_topk_segmax_s8, quantize_segments,
    )

    q, d = _data(rng, B=8, N=1024, H=32)
    k = 20
    vals, ids = fused_topk_segmax(
        q, d, k=k, tile_n=256, interpret=INTERPRET, phase2=phase2,
        sort_candidates=True,
    )
    o_vals, o_ids = topk_oracle(q, d, k)
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(o_ids))
    np.testing.assert_allclose(np.asarray(vals), np.asarray(o_vals), rtol=1e-5)

    values, scales = quantize_segments(np.asarray(d))
    s_vals, s_ids = fused_topk_segmax_s8(
        q, jnp.asarray(values), jnp.asarray(scales), k=k, tile_n=256,
        interpret=INTERPRET, phase2=phase2, sort_candidates=True,
    )
    u_vals, u_ids = fused_topk_segmax_s8(
        q, jnp.asarray(values), jnp.asarray(scales), k=k, tile_n=256,
        interpret=INTERPRET, phase2=phase2, sort_candidates=False,
    )
    np.testing.assert_array_equal(np.asarray(s_ids), np.asarray(u_ids))
    np.testing.assert_array_equal(np.asarray(s_vals), np.asarray(u_vals))


def test_segmax_phase2_rejects_unknown_mode(rng):
    from twotowermlretrieval_tpu.ops.topk import fused_topk_segmax

    q, d = _data(rng, B=2, N=256, H=16)
    with pytest.raises(ValueError, match="phase2"):
        fused_topk_segmax(q, d, k=5, tile_n=256, interpret=INTERPRET,
                          phase2="bogus")


@pytest.mark.parametrize("N,n_valid", [(1024, None), (1024, 900), (512, 130)])
def test_segmax_s8_gather_phase2_bitwise(rng, N, n_valid):
    """s8 score-cache phase 2 is bit-identical to the re-score path: both
    read the same i32 integer scores (exact in f32)."""
    from twotowermlretrieval_tpu.ops.topk import fused_topk_segmax_s8, quantize_segments

    q, d = _data(rng, B=8, N=N, H=32)
    d_np = np.asarray(d)
    if n_valid is not None:
        d_np = d_np.copy()
        d_np[n_valid:] = 0.0
    values, scales = quantize_segments(d_np)
    kwargs = dict(k=20, tile_n=256, interpret=INTERPRET, n_valid=n_valid)
    g_vals, g_ids = fused_topk_segmax_s8(
        q, jnp.asarray(values), jnp.asarray(scales), phase2="gather", **kwargs
    )
    r_vals, r_ids = fused_topk_segmax_s8(
        q, jnp.asarray(values), jnp.asarray(scales), phase2="rescore", **kwargs
    )
    np.testing.assert_array_equal(np.asarray(g_ids), np.asarray(r_ids))
    np.testing.assert_array_equal(np.asarray(g_vals), np.asarray(r_vals))


def test_segmax_s8_recall_vs_f32(rng):
    """Per-segment int8 retrieval keeps >= 0.9 top-20 recall vs exact f32
    on normalized embeddings (the serving trade-off being bought)."""
    from twotowermlretrieval_tpu.ops.topk import fused_topk_segmax_s8, quantize_segments

    q, d = _data(rng, B=8, N=2048, H=64)
    values, scales = quantize_segments(np.asarray(d))
    _, ref_ids = topk_oracle(q, d, 20)
    _, ids = fused_topk_segmax_s8(
        q, jnp.asarray(values), jnp.asarray(scales), k=20,
        tile_n=256, interpret=INTERPRET,
    )
    recall = np.mean([
        len(set(np.asarray(ids)[b]) & set(np.asarray(ref_ids)[b])) / 20
        for b in range(8)
    ])
    assert recall >= 0.9, recall


def test_segmented_s8_matches_kernel(rng):
    """The XLA fallback and the Pallas kernel score the per-segment index
    under the identical doubly-quantized metric: same ids, same values."""
    from twotowermlretrieval_tpu.ops.topk import (
        fused_topk_segmax_s8,
        quantize_segments,
        topk_segmented_s8,
    )

    q, d = _data(rng, B=8, N=1152, H=32)
    values, scales = quantize_segments(np.asarray(d))
    kv, ki = fused_topk_segmax_s8(
        q, jnp.asarray(values), jnp.asarray(scales), k=15,
        tile_n=256, interpret=INTERPRET, n_valid=1100,
    )
    xv, xi = topk_segmented_s8(
        q, jnp.asarray(values), jnp.asarray(scales), k=15, n_valid=1100
    )
    np.testing.assert_array_equal(np.asarray(ki), np.asarray(xi))
    np.testing.assert_allclose(np.asarray(kv), np.asarray(xv), rtol=1e-6, atol=1e-7)


@pytest.mark.parametrize("seg", [32, 64])
def test_segmax_s8_narrow_segments(rng, seg):
    """The s8 path generalizes to narrower covering segments (smaller
    phase-2 gather volume, tighter quantization) — kernel == XLA twin."""
    from twotowermlretrieval_tpu.ops.topk import (
        fused_topk_segmax_s8,
        quantize_segments,
        topk_segmented_s8,
    )

    q, d = _data(rng, B=4, N=1024, H=32)
    values, scales = quantize_segments(np.asarray(d), seg=seg)
    assert scales.shape == (1024 // seg,)
    kv, ki = fused_topk_segmax_s8(
        q, jnp.asarray(values), jnp.asarray(scales), k=12,
        tile_n=256, interpret=INTERPRET, n_valid=1000, seg=seg,
    )
    xv, xi = topk_segmented_s8(
        q, jnp.asarray(values), jnp.asarray(scales), k=12, n_valid=1000, seg=seg
    )
    np.testing.assert_array_equal(np.asarray(ki), np.asarray(xi))
    np.testing.assert_allclose(np.asarray(kv), np.asarray(xv), rtol=1e-6, atol=1e-7)


def test_effective_tile_never_exceeds_corpus():
    """Small corpora/shards must not zero-pad themselves inside every
    compiled call: the effective tile caps at the corpus rounded up to
    the minimum tile (review r3)."""
    from twotowermlretrieval_tpu.ops.topk import _MIN_TILE_N, _effective_tile_n

    assert _effective_tile_n(8192, 8, 1_000_000) == 8192  # serving shape
    assert _effective_tile_n(8192, 8, 1024) == 1024  # small shard: no pad
    assert _effective_tile_n(8192, 8, 384) == _MIN_TILE_N  # min tile floor
    assert _effective_tile_n(8192, 8, 5000) == 5120  # round up to 1024
    # VMEM fit still applies first
    assert _effective_tile_n(8192, 512, 1_000_000) * 512 * 4 <= 8 << 20


def test_shard_corpus_s8_shards_are_tile_aligned():
    """Sharded s8 corpora keep every shard a multiple of the kernel's
    MINIMUM tile so searches never re-pad the shard in-call."""
    from twotowermlretrieval_tpu.ops.topk import _MIN_TILE_N
    from twotowermlretrieval_tpu.parallel.mesh import make_mesh
    from twotowermlretrieval_tpu.parallel.topk import shard_corpus_s8

    rng = np.random.default_rng(3)
    docs = rng.standard_normal((3000, 16)).astype(np.float32)
    mesh = make_mesh(data=8, model=1)
    values, scales, n_valid = shard_corpus_s8(docs, mesh)
    shard_rows = values.shape[0] // 8
    assert n_valid == 3000
    assert shard_rows % _MIN_TILE_N == 0
    assert scales.shape[0] == values.shape[0] // 128
