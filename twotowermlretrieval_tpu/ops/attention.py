"""Fused multi-head attention Pallas kernel (fwd + custom-VJP bwd).

Why this exists (measured, docs/RESULTS.md round 4): at the transformer
config-5 doc-tower shape ([2B=1024, T=128, H=256], 8 heads, head_dim 32)
the XLA attention path costs 4.25 ms per layer forward of which only
1.57 ms is the qkv/out-projection GEMMs — the rest is the
``[B, heads, T, T]`` score/softmax tensors breathing through HBM
(536 MB per layer at f32) plus the head relayouts. Round 3 rejected a
flash-attention kernel on FLOP grounds (attention is 1-5% of step FLOPs,
docs/RESULTS.md:193-200) — correct but incomplete: the cost is HBM
*traffic*, not FLOPs. This kernel keeps scores/probs entirely in VMEM:

- forward: grid over row blocks of the flattened ``[B*heads, T, head_dim]``
  layout; per (row, head) a [T, hd] x [hd, T] MXU score dot, a VPU
  softmax, and a [T, T] x [T, hd] context dot. Nothing [T, T]-shaped
  ever reaches HBM.
- backward: the flash pattern — recompute scores+probs from the saved
  q/k/v (cheap MXU work), then dv = p^T dout, dp = dout v^T,
  ds = p * (dp - rowsum(dp * p)), dq = ds k, dk = ds^T q. The XLA
  backward materializes THREE more [B, heads, T, T] tensors; here none.

Shapes are the encoder-tower regime: full T fits VMEM (T <= ~512), so no
online-softmax streaming is needed — the covering argument is exact, not
approximate. Longer sequences fall back to the XLA einsum path
(``use_fused_attention``).

The reference has no attention at all (GRU towers, ref:
backend/model.py:30-37); this serves the BASELINE config-5 scaling tower.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from twotowermlretrieval_tpu.utils.dtypes import matmul_precision

# rows of the flattened [B*heads, T, hd] processed per grid step; 16 keeps
# the double-buffered q/k/v/out blocks plus the unrolled loop's [T, T]
# stack temporaries inside the 16 MB scoped-VMEM limit (32 OOMs at
# T=128/hd=32, measured)
_ROW_BLOCK = 16


def _bdot(a, b, cdt, ta=False, tb=False):
    """Batched [R, M, K] x [R, K, N] -> [R, M, N] f32 on the MXU; one
    batched dot_general over the whole row block beats a per-row unrolled
    loop by an order of magnitude (the unroll's stack temporaries also
    OOM'd scoped VMEM at block 32 — both measured)."""
    dims = (
        ((1 if ta else 2,), (2 if tb else 1,)),
        ((0,), (0,)),
    )
    return jax.lax.dot_general(
        a.astype(cdt), b.astype(cdt), dimension_numbers=dims,
        preferred_element_type=jnp.float32, precision=matmul_precision(cdt),
    )


def _softmax_rows(s):
    """Numerically-safe softmax over the last axis, all in VMEM."""
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def _fwd_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale, cdt):
    # refs: [block, T, hd] q/k/v, [block, T] additive kv bias, out [block, T, hd]
    s = _bdot(q_ref[:], k_ref[:], cdt, tb=True) * scale  # [blk, T, T]
    p = _softmax_rows(s + bias_ref[:][:, None, :])
    o_ref[:] = _bdot(p, v_ref[:], cdt)


def _bwd_kernel(
    q_ref, k_ref, v_ref, bias_ref, do_ref, dq_ref, dk_ref, dv_ref,
    *, scale, cdt,
):
    # recompute the probabilities (flash backward: trade one extra score
    # dot for never storing [T, T] tensors in HBM)
    s = _bdot(q_ref[:], k_ref[:], cdt, tb=True) * scale
    p = _softmax_rows(s + bias_ref[:][:, None, :])
    do = do_ref[:]
    dv_ref[:] = _bdot(p, do, cdt, ta=True)  # [blk, T, hd]
    dp = _bdot(do, v_ref[:], cdt, tb=True)  # [blk, T, T]
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True)) * scale
    dq_ref[:] = _bdot(ds, k_ref[:], cdt)
    dk_ref[:] = _bdot(ds, q_ref[:], cdt, ta=True)


def _row_specs(block, T, hd):
    return [
        pl.BlockSpec((block, T, hd), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM)
        for _ in range(3)
    ] + [pl.BlockSpec((block, T), lambda i: (i, 0), memory_space=pltpu.VMEM)]


def _pick_block(rows: int) -> int:
    for b in (_ROW_BLOCK, 16, 8, 4, 2, 1):
        if rows % b == 0:
            return b
    return 1


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(4, 5, 6)
)
def fused_attention(q, k, v, bias, scale, compute_dtype="bfloat16",
                    interpret=False):
    """Softmax attention over flattened heads, scores VMEM-resident.

    q, k, v: [R, T, hd] f32 with R = batch * heads; bias: [R, T] additive
    kv-position bias (0 valid / -1e9 masked); returns [R, T, hd] f32.
    Semantics match ``softmax(q k^T * scale + bias[:, None, :]) v`` with
    bf16 operands / f32 accumulation, like the XLA path it replaces
    (models/transformer.py).
    """
    out, _ = _fused_attention_fwd(q, k, v, bias, scale, compute_dtype,
                                  interpret)
    return out


def _fused_attention_fwd(q, k, v, bias, scale, compute_dtype, interpret):
    R, T, hd = q.shape
    cdt = jnp.dtype(compute_dtype)
    block = _pick_block(R)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, cdt=cdt),
        grid=(R // block,),
        in_specs=_row_specs(block, T, hd),
        out_specs=pl.BlockSpec((block, T, hd), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, T, hd), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=4 * R * T * T * hd,
            bytes_accessed=4 * R * T * hd * 4 + R * T * 4,
            transcendentals=R * T * T,
        ),
        interpret=interpret,
    )(q, k, v, bias)
    return out, (q, k, v, bias)


def _fused_attention_bwd(scale, compute_dtype, interpret, res, dout):
    q, k, v, bias = res
    R, T, hd = q.shape
    cdt = jnp.dtype(compute_dtype)
    block = _pick_block(R)
    spec = pl.BlockSpec((block, T, hd), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, cdt=cdt),
        grid=(R // block,),
        in_specs=_row_specs(block, T, hd) + [spec],
        out_specs=[spec] * 3,
        out_shape=[jax.ShapeDtypeStruct((R, T, hd), jnp.float32)] * 3,
        cost_estimate=pl.CostEstimate(
            flops=10 * R * T * T * hd,
            bytes_accessed=7 * R * T * hd * 4 + R * T * 4,
            transcendentals=R * T * T,
        ),
        interpret=interpret,
    )(q, k, v, bias, dout)
    # bias is a length-derived mask constant; its cotangent is never
    # consumed upstream but custom_vjp must return an array for it
    return dq, dk, dv, jnp.zeros_like(bias)


fused_attention.defvjp(_fused_attention_fwd, _fused_attention_bwd)


def use_fused_attention(T: int, hd: int, force: Optional[bool] = None) -> bool:
    """Policy: OFF by default — at the config-5 encoder shapes
    (T<=128, hd=32) this kernel measured ~2.6x slower fwd+bwd than the
    transpose-free bf16-score XLA formulation (12.3 vs 4.75 ms per
    doc-shape layer, docs/RESULTS.md round 4): Mosaic's hd=32 batched
    dots underfill the MXU while XLA fuses softmax into its batched
    matmuls. The kernel remains the MEMORY valve for long sequences,
    where XLA's [B, heads, T, T] materialization is the constraint —
    opt in with FUSED_ATTENTION: true (supported up to T ~ 512 per the
    whole-T-in-VMEM design)."""
    if force is not None:
        return force
    return False
