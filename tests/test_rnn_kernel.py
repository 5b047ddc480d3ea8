"""Pallas fused GRU time-loop kernels vs the XLA masked scan (interpret mode).

The fused layer kernels (ops/rnn_scan.py) must reproduce the XLA scan's
forward outputs and the custom-VJP backward's gradients exactly (f32).
These run in Pallas interpret mode so they execute on the CPU CI mesh; the
same kernels compile on TPU where models/rnn.py dispatches to them
(_use_fused_gru).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from twotowermlretrieval_tpu.models.rnn import _scan_layer_fwd_impl
from twotowermlretrieval_tpu.ops.rnn_scan import rnn_layer_bwd, rnn_layer_fwd


@pytest.fixture(scope="module", params=[(1, "GRU"), (2, "GRU"), (2, "LSTM"), (2, "RNN")],
                ids=["unidir-GRU", "bidir-GRU", "bidir-LSTM", "bidir-RNN"])
def gru_case(request):
    D, cell = request.param
    G = {"GRU": 3, "LSTM": 4, "RNN": 1}[cell]
    T, B, H = 12, 16, 128
    GH = G * H
    ks = jax.random.split(jax.random.key(0), 6)
    xps = tuple(jax.random.normal(k, (T, B, GH)) for k in ks[:D])
    # includes full-length, empty, length-1 and random rows
    lengths = jnp.asarray(
        np.r_[T, 0, 1, np.random.default_rng(0).integers(1, T + 1, B - 3)], jnp.int32
    )
    t_idx = jax.lax.broadcasted_iota(jnp.int32, (T, B), 0)
    mask2 = (t_idx < lengths[None, :]).astype(jnp.float32)
    w_hh = jax.random.normal(ks[2], (D, H, GH)) * 0.2
    b_hh = jax.random.normal(ks[3], (D, GH)) * 0.1
    cts = tuple(jax.random.normal(k, (T, B, H)) for k in jax.random.split(ks[4], D))
    ct_fin = jax.random.normal(ks[5], (D, B, H))
    return cell, xps, mask2, w_hh, b_hh, cts, ct_fin


def _ref_fwd(cell, xps, mask2, w_hh, b_hh):
    import os

    os.environ["TTMR_DISABLE_FUSED_RNN"] = "1"
    try:
        return _scan_layer_fwd_impl(cell, "float32", xps, mask2, w_hh, b_hh)
    finally:
        del os.environ["TTMR_DISABLE_FUSED_RNN"]


def test_fused_gru_fwd_matches_scan(gru_case):
    cell, xps, mask2, w_hh, b_hh, _, _ = gru_case
    outs_ref, _, fin_ref = _ref_fwd(cell, xps, mask2, w_hh, b_hh)
    outs_k, _, fin_k = rnn_layer_fwd(
        cell, xps, mask2, w_hh, b_hh, compute_dtype="float32", interpret=True
    )
    for a, b in zip(outs_k, outs_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(fin_k), np.asarray(fin_ref), rtol=1e-5, atol=1e-6)


def test_fused_gru_bwd_matches_autodiff(gru_case):
    cell, xps, mask2, w_hh, b_hh, cts, ct_fin = gru_case

    def loss(xps, w, b):
        outs, _, fin = _scan_layer_fwd_impl(cell, "float32", xps, mask2, w, b)
        return sum(jnp.sum(o * c) for o, c in zip(outs, cts)) + jnp.sum(fin * ct_fin)

    import os

    os.environ["TTMR_DISABLE_FUSED_RNN"] = "1"
    try:
        gx, gw, gb = jax.grad(loss, argnums=(0, 1, 2))(xps, w_hh, b_hh)
        outs_saved, _, _ = _scan_layer_fwd_impl(cell, "float32", xps, mask2, w_hh, b_hh)
    finally:
        del os.environ["TTMR_DISABLE_FUSED_RNN"]

    # the fused forward's own c history feeds the fused backward (LSTM)
    _, c_hist_k, _ = rnn_layer_fwd(
        cell, xps, mask2, w_hh, b_hh, compute_dtype="float32", interpret=True
    )
    dxps, dw, db = rnn_layer_bwd(
        cell, xps, mask2, w_hh, b_hh, outs_saved, c_hist_k, cts, ct_fin,
        compute_dtype="float32", interpret=True,
    )
    for a, b in zip(dxps, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dw), np.asarray(gw), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(db), np.asarray(gb), rtol=1e-4, atol=1e-4)


def test_fused_gru_multi_b_block_matches_single(gru_case):
    """B-blocked grid (nb > 1) must be numerically identical to one block;
    exercises per-block state reset and cross-block dW accumulation."""
    cell, xps, mask2, w_hh, b_hh, cts, ct_fin = gru_case
    outs_1, c1, fin_1 = rnn_layer_fwd(
        cell, xps, mask2, w_hh, b_hh, compute_dtype="float32", interpret=True
    )
    outs_2, c2, fin_2 = rnn_layer_fwd(
        cell, xps, mask2, w_hh, b_hh, compute_dtype="float32", interpret=True,
        b_block=xps[0].shape[1] // 2,
    )
    for a, b in zip(outs_1, outs_2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(fin_1), np.asarray(fin_2))

    dx1, dw1, db1 = rnn_layer_bwd(
        cell, xps, mask2, w_hh, b_hh, outs_1, c1, cts, ct_fin,
        compute_dtype="float32", interpret=True,
    )
    dx2, dw2, db2 = rnn_layer_bwd(
        cell, xps, mask2, w_hh, b_hh, outs_1, c1, cts, ct_fin,
        compute_dtype="float32", interpret=True, b_block=xps[0].shape[1] // 2,
    )
    for a, b in zip(dx1, dx2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # dW/db sums reassociate across blocks -> tiny f32 differences
    np.testing.assert_allclose(np.asarray(dw1), np.asarray(dw2), rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(db1), np.asarray(db2), rtol=1e-5, atol=1e-4)


def test_pick_b_block_constraints():
    """Chosen row blocks must satisfy Mosaic's lane tiling for the mask
    view: multiple of 128, or the whole batch dimension."""
    from twotowermlretrieval_tpu.ops.rnn_scan import pick_b_block

    for B in (16, 32, 64, 128, 144, 240, 256, 512, 1008, 1024, 4096):
        bb = pick_b_block(B)
        if bb:
            assert B % bb == 0
            assert bb % 128 == 0 or bb == B
            assert bb <= 256 and bb % 16 == 0
    assert pick_b_block(1008) == 0  # not divisible by 128/256, too big whole
    assert pick_b_block(8) == 0  # below the 16-row sublane requirement


def test_split_plan_matches_combined(gru_case):
    """The SPLIT plan (per-direction programs + hoisted weight-grad
    matmul — the H=1024 execution path, VERDICT r3 #5) must reproduce the
    combined kernels: forward outputs exactly, gradients to matmul
    reassociation tolerance."""
    from twotowermlretrieval_tpu.ops.rnn_scan import rnn_layer_bwd_split_full

    cell, xps, mask2, w_hh, b_hh, cts, ct_fin = gru_case
    D = len(xps)
    outs_ref, c_ref, fin_ref = rnn_layer_fwd(
        cell, xps, mask2, w_hh, b_hh, compute_dtype="float32", interpret=True
    )
    dx_ref, dw_ref, db_ref = rnn_layer_bwd(
        cell, xps, mask2, w_hh, b_hh, outs_ref, c_ref, cts, ct_fin,
        compute_dtype="float32", interpret=True,
    )

    outs_s, c_s, fins = [], [], []
    for d in range(D):
        o, ch, hf = rnn_layer_fwd(
            cell, (xps[d],), mask2, w_hh[d : d + 1], b_hh[d : d + 1],
            compute_dtype="float32", interpret=True, directions=(d,),
        )
        outs_s.append(o[0])
        if ch:
            c_s.append(ch[0])
        fins.append(hf)
    for a, b in zip(outs_s, outs_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(
        np.concatenate(fins, axis=0), np.asarray(fin_ref), rtol=1e-6, atol=1e-6
    )

    dx_s, dw_s, db_s = rnn_layer_bwd_split_full(
        cell, xps, mask2, w_hh, b_hh, tuple(outs_s), tuple(c_s), cts, ct_fin,
        compute_dtype="float32", interpret=True,
    )
    for a, b in zip(dx_s, dx_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dw_s), np.asarray(dw_ref), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(db_s), np.asarray(db_ref), rtol=1e-4, atol=1e-4)


def test_hoisted_matches_combined(gru_case):
    """The HOISTED combined-direction backward (one program, dw moved to
    one XLA matmul — round-5 measurement knob TTMR_RNN_BWD_PLAN=hoisted)
    must reproduce the combined kernel to matmul reassociation tolerance
    (its dh chain contracts dhp (x) w directly instead of via the
    materialized transposed copy, so the accumulated dh stream differs
    at f32 rounding level)."""
    from twotowermlretrieval_tpu.ops.rnn_scan import rnn_layer_bwd_hoisted

    cell, xps, mask2, w_hh, b_hh, cts, ct_fin = gru_case
    outs_ref, c_ref, _ = rnn_layer_fwd(
        cell, xps, mask2, w_hh, b_hh, compute_dtype="float32", interpret=True
    )
    dx_ref, dw_ref, db_ref = rnn_layer_bwd(
        cell, xps, mask2, w_hh, b_hh, outs_ref, c_ref, cts, ct_fin,
        compute_dtype="float32", interpret=True,
    )
    dx_h, dw_h, db_h = rnn_layer_bwd_hoisted(
        cell, xps, mask2, w_hh, b_hh, outs_ref, c_ref, cts, ct_fin,
        compute_dtype="float32", interpret=True,
    )
    for a, b in zip(dx_h, dx_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dw_h), np.asarray(dw_ref), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(db_h), np.asarray(db_ref), rtol=1e-4, atol=1e-4)


def test_bf16_history_stays_in_bf16_error_envelope(gru_case):
    """history_in_cdt=True (TTMR_RNN_HISTORY=cdt) stores the saved state
    history in the compute dtype. The forward's carried state stays f32,
    so h_final must be IDENTICAL to the f32-history bf16 run; gradients
    may differ only at the same order as the bf16-compute error already
    accepted vs the f32 reference."""
    cell, xps, mask2, w_hh, b_hh, cts, ct_fin = gru_case

    def run(cdt, hist):
        outs, ch, fin = rnn_layer_fwd(
            cell, xps, mask2, w_hh, b_hh, compute_dtype=cdt, interpret=True,
            history_in_cdt=hist,
        )
        cts_in = tuple(c.astype(outs[0].dtype) for c in cts)
        dx, dw, db = rnn_layer_bwd(
            cell, xps, mask2, w_hh, b_hh, outs, ch, cts_in, ct_fin,
            compute_dtype=cdt, interpret=True,
        )
        return outs, fin, dw, db

    outs_h, fin_h, dw_h, db_h = run("bfloat16", True)
    outs_f, fin_f, dw_f, db_f = run("bfloat16", False)
    _, _, dw_32, db_32 = run("float32", False)

    assert outs_h[0].dtype == jnp.bfloat16
    assert outs_f[0].dtype == jnp.float32
    np.testing.assert_array_equal(np.asarray(fin_h), np.asarray(fin_f))
    # bf16-history error vs f32 truth bounded by ~2x the bf16-compute error
    err_compute = np.abs(np.asarray(dw_f) - np.asarray(dw_32)).max()
    err_hist = np.abs(np.asarray(dw_h) - np.asarray(dw_32)).max()
    assert err_hist <= 2.0 * err_compute + 1e-6, (err_hist, err_compute)


def test_plan_fused_covers_wide_towers():
    """plan selection: reference shapes ride the combined program; H=1024
    (whose resident weights + grad scratch exceed scoped VMEM) gets the
    split plan instead of falling off to the ~4.5x-slower XLA scan; and
    non-tile-aligned H stays off the fused paths entirely."""
    from twotowermlretrieval_tpu.ops.rnn_scan import (
        pick_b_block_split,
        plan_fused,
    )

    assert plan_fused(64, 256, 768, 2) == "fused"  # reference config
    assert plan_fused(256, 256, 768, 2) == "fused"
    # H=1024 bidirectional GRU: combined plan is out, split covers it
    assert plan_fused(256, 1024, 3072, 2) == "split"
    assert pick_b_block_split(256, 1024, 3072) in (128, 256)
    assert plan_fused(64, 1024, 3072, 2) == "split"
    # H=1024 LSTM at a modest batch also stays fused via split
    assert plan_fused(64, 1024, 4096, 2) == "split"
    assert plan_fused(64, 100, 300, 2) is None  # H % 128 != 0
