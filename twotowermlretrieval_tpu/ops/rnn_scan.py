"""Fused GRU time-loop Pallas kernels (forward + backward).

The XLA ``lax.scan`` recurrence (models/rnn.py) is latency-bound: every
timestep is a separate fusion with its own dispatch, and the backward adds
per-step cotangent streams through HBM. These kernels run the WHOLE time
loop inside one Mosaic program:

- the hidden state lives in VMEM scratch across grid steps (never touches
  HBM between timesteps);
- the per-step input-projection block streams HBM->VMEM double-buffered by
  the grid pipeline;
- the backward accumulates the recurrent weight gradient ``dW_hh`` and bias
  gradient in VMEM scratch — the [D, H, G*H] cotangent never rides a scan
  carry and costs zero extra HBM traffic (the XLA autodiff carries it
  through every reverse step);
- gate activations are recomputed in the backward from the saved hidden
  history (one extra MXU matmul — the recurrence is latency-bound, not
  FLOP-bound).

Semantics are identical to the masked-update scan: padding steps are
identity (packed-sequence equivalence, ref: backend/model.py:55-57), the
backward direction sees time-flipped inputs (handled by the caller,
models/rnn.py), and gate math matches ``torch.nn.GRU``.

Only the GRU cell is fused (the reference's default and the benchmark
architecture, ref: backend/config.json:13); LSTM/RNN use the XLA path.
Shape constraints (TPU tiling): H % 128 == 0 and B % 8 == 0 — callers fall
back to the XLA scan otherwise (models/rnn.py:_use_fused_gru).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from twotowermlretrieval_tpu.utils.dtypes import matmul_precision


def _mm(a, b, cdt):
    """[B, K] @ [K, N] -> [B, N] f32, operands cast to compute dtype."""
    return jax.lax.dot_general(
        a.astype(cdt), b.astype(cdt),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=matmul_precision(cdt),
    )


def _gru_gates(xp, hp, h_prev):
    """f32 GRU gate math shared by fwd and bwd. Returns (r, z, n, h_new)."""
    H = h_prev.shape[-1]
    r = jax.nn.sigmoid(xp[:, :H] + hp[:, :H])
    z = jax.nn.sigmoid(xp[:, H : 2 * H] + hp[:, H : 2 * H])
    n = jnp.tanh(xp[:, 2 * H :] + r * hp[:, 2 * H :])
    h_new = (1.0 - z) * n + z * h_prev
    return r, z, n, h_new


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _gru_fwd_kernel(
    xp_ref,  # VMEM [1, D, B, G*H] cdt — this step's input projection (+b_ih)
    mask_ref,  # VMEM [1, D, B] f32
    w_hh_ref,  # VMEM [D, H, G*H] cdt
    b_hh_ref,  # VMEM [D, G*H] f32
    out_ref,  # VMEM [1, D, B, H] f32 — h_t
    hfinal_ref,  # VMEM [D, B, H] f32
    h_scr,  # VMEM scratch [D, B, H] f32 — carried hidden state
    *,
    n_dir: int,
    cdt,
):
    step = pl.program_id(0)
    num_steps = pl.num_programs(0)

    @pl.when(step == 0)
    def _init():
        h_scr[:] = jnp.zeros_like(h_scr)

    for d in range(n_dir):  # static unroll (D <= 2)
        h_prev = h_scr[d]  # [B, H] f32
        xp = xp_ref[0, d].astype(jnp.float32)  # [B, G*H]
        hp = _mm(h_prev, w_hh_ref[d], cdt) + b_hh_ref[d][None, :]
        _, z, n, h_new = _gru_gates(xp, hp, h_prev)
        m = mask_ref[0, d][:, None]  # [B, 1]
        h = m * h_new + (1.0 - m) * h_prev
        h_scr[d] = h
        out_ref[0, d] = h

    @pl.when(step == num_steps - 1)
    def _fin():
        hfinal_ref[:] = h_scr[:]


@functools.partial(jax.jit, static_argnames=("compute_dtype", "interpret"))
def gru_scan_fwd(
    x_proj: jax.Array,  # [T, D, B, G*H] f32
    mask: jax.Array,  # [T, D, B] f32
    w_hh: jax.Array,  # [D, H, G*H] f32
    b_hh: jax.Array,  # [D, G*H] f32
    compute_dtype: str = "bfloat16",
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Fused GRU forward. Returns (outputs [T, D, B, H] f32, h_final [D, B, H] f32)."""
    T, D, B, GH = x_proj.shape
    H = GH // 3
    cdt = jnp.dtype(compute_dtype)

    outputs, h_final = pl.pallas_call(
        functools.partial(_gru_fwd_kernel, n_dir=D, cdt=cdt),
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, D, B, GH), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D, B), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, H, GH), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, GH), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, D, B, H), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, B, H), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, D, B, H), jnp.float32),
            jax.ShapeDtypeStruct((D, B, H), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((D, B, H), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * T * D * B * H * GH,
            bytes_accessed=x_proj.size * x_proj.dtype.itemsize
            + T * D * B * H * 4
            + D * H * GH * 4,
            transcendentals=3 * T * D * B * H,
        ),
        interpret=interpret,
    )(x_proj.astype(cdt), mask, w_hh.astype(cdt), b_hh)
    return outputs, h_final


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------


def _gru_bwd_kernel(
    xp_ref,  # VMEM [1, D, B, G*H] cdt — step t (reversed grid)
    mask_ref,  # VMEM [1, D, B] f32
    hprev_ref,  # VMEM [1, D, B, H] f32 — outputs[t-1] (garbage at t=0, see below)
    dout_ref,  # VMEM [1, D, B, H] f32 — d(outputs)[t]
    w_hh_ref,  # VMEM [D, H, G*H] cdt
    wT_ref,  # VMEM [D, G*H, H] cdt — transposed recurrent weights
    b_hh_ref,  # VMEM [D, G*H] f32
    dhf_ref,  # VMEM [D, B, H] f32 — d(h_final)
    dxp_ref,  # out VMEM [1, D, B, G*H] cdt
    dw_ref,  # out VMEM [D, H, G*H] f32
    db_ref,  # out VMEM [D, G*H] f32
    dh_scr,  # scratch VMEM [D, B, H] f32 — dh carry
    dw_scr,  # scratch VMEM [D, H, G*H] f32
    db_scr,  # scratch VMEM [D, G*H] f32
    *,
    n_dir: int,
    cdt,
):
    step = pl.program_id(0)
    num_steps = pl.num_programs(0)
    is_first_t = step == num_steps - 1  # reversed grid: last program is t == 0

    @pl.when(step == 0)
    def _init():
        dh_scr[:] = dhf_ref[:]
        dw_scr[:] = jnp.zeros_like(dw_scr)
        db_scr[:] = jnp.zeros_like(db_scr)

    for d in range(n_dir):  # static unroll
        # h_{t-1}: the block index map clamps t-1 to 0, so at t == 0 the
        # loaded block is outputs[0] — must be replaced by the true h0 = 0.
        h_prev = jnp.where(is_first_t, 0.0, hprev_ref[0, d])  # [B, H] f32
        xp = xp_ref[0, d].astype(jnp.float32)
        hp = _mm(h_prev, w_hh_ref[d], cdt) + b_hh_ref[d][None, :]
        r, z, n, _ = _gru_gates(xp, hp, h_prev)
        h_n = hp[:, 2 * xp.shape[-1] // 3 :]

        m = mask_ref[0, d][:, None]  # [B, 1]
        dh_t = dh_scr[d] + dout_ref[0, d]
        dh_new = dh_t * m
        dh_direct = dh_t * (1.0 - m)

        dz = dh_new * (h_prev - n)
        dn_pre = dh_new * (1.0 - z) * (1.0 - n * n)
        dr_pre = dn_pre * h_n * r * (1.0 - r)
        dz_pre = dz * z * (1.0 - z)
        dxp = jnp.concatenate([dr_pre, dz_pre, dn_pre], axis=-1)  # [B, G*H]
        dhp = jnp.concatenate([dr_pre, dz_pre, dn_pre * r], axis=-1)

        dxp_ref[0, d] = dxp.astype(cdt)
        # dh_{t-1} = dhp @ W_hh^T + z-path + masked passthrough
        dh_scr[d] = _mm(dhp, wT_ref[d], cdt) + dh_new * z + dh_direct
        # In-VMEM weight-gradient accumulation: [H, B] @ [B, G*H] on the MXU
        dw_scr[d] += jax.lax.dot_general(
            h_prev.astype(cdt), dhp.astype(cdt),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=matmul_precision(cdt),
        )
        db_scr[d] += jnp.sum(dhp, axis=0)

    @pl.when(step == num_steps - 1)
    def _fin():
        dw_ref[:] = dw_scr[:]
        db_ref[:] = db_scr[:]


@functools.partial(jax.jit, static_argnames=("compute_dtype", "interpret"))
def gru_scan_bwd(
    x_proj: jax.Array,  # [T, D, B, G*H] f32
    mask: jax.Array,  # [T, D, B] f32
    w_hh: jax.Array,  # [D, H, G*H] f32
    b_hh: jax.Array,  # [D, G*H] f32
    outputs: jax.Array,  # [T, D, B, H] f32 — saved forward hidden history
    d_outputs: jax.Array,  # [T, D, B, H] f32
    d_hfinal: jax.Array,  # [D, B, H] f32
    compute_dtype: str = "bfloat16",
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Fused GRU backward. Returns (dx_proj [T,D,B,G*H] f32, dw_hh, db_hh)."""
    T, D, B, GH = x_proj.shape
    H = GH // 3
    cdt = jnp.dtype(compute_dtype)

    rev = lambda i: (T - 1 - i, 0, 0, 0)  # reversed time traversal
    rev_prev = lambda i: (jnp.maximum(T - 2 - i, 0), 0, 0, 0)  # t-1, clamped

    dxp, dw_hh, db_hh = pl.pallas_call(
        functools.partial(_gru_bwd_kernel, n_dir=D, cdt=cdt),
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, D, B, GH), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D, B), lambda i: (T - 1 - i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D, B, H), rev_prev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D, B, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((D, H, GH), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, GH, H), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, GH), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, B, H), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, D, B, GH), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((D, H, GH), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, GH), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, D, B, GH), cdt),
            jax.ShapeDtypeStruct((D, H, GH), jnp.float32),
            jax.ShapeDtypeStruct((D, GH), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((D, B, H), jnp.float32),
            pltpu.VMEM((D, H, GH), jnp.float32),
            pltpu.VMEM((D, GH), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=6 * T * D * B * H * GH,
            bytes_accessed=2 * x_proj.size * 2 + 2 * outputs.size * 4,
            transcendentals=3 * T * D * B * H,
        ),
        interpret=interpret,
    )(
        x_proj.astype(cdt),
        mask,
        outputs,
        d_outputs,
        w_hh.astype(cdt),
        jnp.swapaxes(w_hh, 1, 2).astype(cdt),
        b_hh,
        d_hfinal,
    )
    return dxp.astype(x_proj.dtype), dw_hh, db_hh
