"""Pallas fused GRU time-loop kernel vs the XLA masked scan (interpret mode).

The fused kernel (ops/rnn_scan.py) must reproduce the XLA scan's forward
outputs and the custom-VJP backward's gradients exactly (f32). These run in
Pallas interpret mode so they execute on the CPU CI mesh; the same kernels
compile on TPU where models/rnn.py dispatches to them (_use_fused_gru).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from twotowermlretrieval_tpu.models.rnn import _scan_directions_fwd_scan
from twotowermlretrieval_tpu.ops.rnn_scan import gru_scan_bwd, gru_scan_fwd


@pytest.fixture(scope="module")
def gru_case():
    T, D, B, H = 12, 2, 16, 128
    GH = 3 * H
    ks = jax.random.split(jax.random.key(0), 6)
    x_proj = jax.random.normal(ks[0], (T, D, B, GH))
    # includes full-length, partial, length-1 and empty rows
    lengths = jnp.asarray(
        np.r_[T, 0, 1, np.random.default_rng(0).integers(1, T + 1, B - 3)], jnp.int32
    )
    t_idx = jax.lax.broadcasted_iota(jnp.int32, (T, B), 0)
    mf = (t_idx < lengths[None, :]).astype(jnp.float32)
    mask3 = jnp.stack([mf, jnp.flip(mf, 0)], axis=1)  # [T, D, B]
    w_hh = jax.random.normal(ks[1], (D, H, GH)) * 0.2
    b_hh = jax.random.normal(ks[2], (D, GH)) * 0.1
    ct_out = jax.random.normal(ks[3], (T, D, B, H))
    ct_fin = jax.random.normal(ks[4], (D, B, H))
    return x_proj, mask3, w_hh, b_hh, ct_out, ct_fin


def test_fused_gru_fwd_matches_scan(gru_case):
    x_proj, mask3, w_hh, b_hh, _, _ = gru_case
    out_ref, _, fin_ref = _scan_directions_fwd_scan(
        "GRU", "float32", x_proj, mask3[..., None], w_hh, b_hh[:, None, :]
    )
    out_k, fin_k = gru_scan_fwd(
        x_proj, mask3, w_hh, b_hh, compute_dtype="float32", interpret=True
    )
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_ref), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(fin_k), np.asarray(fin_ref), rtol=1e-5, atol=1e-6)


def test_fused_gru_bwd_matches_autodiff(gru_case):
    x_proj, mask3, w_hh, b_hh, ct_out, ct_fin = gru_case

    def loss(xp, w, b):
        out, _, fin = _scan_directions_fwd_scan(
            "GRU", "float32", xp, mask3[..., None], w, b
        )
        return jnp.sum(out * ct_out) + jnp.sum(fin * ct_fin)

    gx, gw, gb = jax.grad(loss, argnums=(0, 1, 2))(x_proj, w_hh, b_hh[:, None, :])
    out_saved, _, _ = _scan_directions_fwd_scan(
        "GRU", "float32", x_proj, mask3[..., None], w_hh, b_hh[:, None, :]
    )
    dxp, dw, db = gru_scan_bwd(
        x_proj, mask3, w_hh, b_hh, out_saved, ct_out, ct_fin,
        compute_dtype="float32", interpret=True,
    )
    np.testing.assert_allclose(np.asarray(dxp), np.asarray(gx), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dw), np.asarray(gw), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(db), np.asarray(gb[:, 0, :]), rtol=1e-4, atol=1e-4)
