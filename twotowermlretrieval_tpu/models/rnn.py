"""Masked-scan RNN text encoders (GRU / LSTM / RNN), pure JAX, TPU-first.

Behavioral equivalent of the reference ``RNNEncoder`` (ref: backend/model.py:8-75):
embedding lookup (optionally frozen pretrained table, model.py:24-27), an
N-layer optionally-bidirectional recurrent stack (model.py:30-37), final
hidden state of the last layer (bidirectional: concat fwd+bwd then a
``Linear(2H -> H)`` projection, model.py:43-46, 65-69), optional L2
normalization (model.py:73-74).

TPU-first design (not a port):

- **No pack_padded_sequence.** The reference relies on cuDNN packed sequences
  (model.py:55-57). Here every step is a masked update inside ``lax.scan``:
  ``h = where(mask_t, cell(x_t, h), h)``. Trailing pad steps are no-ops, so
  the final carried state equals the state after the last *real* token —
  exactly the packed-sequence semantics, with static shapes XLA can compile
  once.
- **Fused input projections.** Per layer and direction, the input
  contribution to all gates for *all timesteps* is one large
  ``[T*B, I] @ [I, G*H]`` matmul on the MXU, hoisted out of the scan. The
  recurrence only performs the unavoidable ``[B, H] @ [H, G*H]`` matmul.
- **Fused Pallas time loop on TPU.** For tile-aligned GRU shapes both
  passes run as single Mosaic programs (ops/rnn_scan.py): hidden state in
  VMEM across steps, per-direction BlockSpec index maps instead of any
  flip/stack/concat copies, weight gradients accumulated in VMEM. The
  XLA masked scan below is the portable fallback and the numerics oracle.
- **Masked reverse = backward direction.** The backward direction scans the
  time-reversed sequence; masked updates keep ``h`` at its initial zeros
  through the (now leading) padding, so the first real update happens at the
  true last token — matching packed bidirectional semantics.
- **Custom VJP.** The backward recomputes gates from the saved hidden
  history and hoists both weight gradients out of the reverse scan; XLA
  autodiff would instead carry the [D, H, G*H] cotangent through every
  step.
- **dtype policy.** Matmul operands are cast to ``compute_dtype`` (bf16 on
  TPU) with float32 accumulation (``preferred_element_type``); gate
  nonlinearities and the carried state stay float32 for recurrence
  stability.
- **Zero-length inputs** carry zeros through every step and (with
  normalization's epsilon guard) encode to the zero vector — subsuming the
  reference's explicit empty-query guard (ref: query_inferencer.py:65-69).

Gate math matches the torch cell definitions (so trained behavior is
comparable): GRU ``r,z,n`` with reset-gated candidate; LSTM ``i,f,g,o``;
vanilla RNN ``tanh``. Initialization is uniform(-1/sqrt(H), 1/sqrt(H)) like
``torch.nn.GRU`` defaults; the embedding table is either copied from the
pretrained array or N(0,1)-initialized (``torch.nn.Embedding`` default).
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from twotowermlretrieval_tpu.utils.dtypes import fast_bernoulli, matmul_precision

_GATES = {"GRU": 3, "LSTM": 4, "RNN": 1}


@dataclasses.dataclass(frozen=True)
class RNNSpec:
    """Static architecture description (hashable; safe as a jit static arg).

    Field meanings mirror the reference encoder kwargs (ref: model.py:84-94).
    """

    vocab_size: int
    embed_dim: int
    hidden_dim: int
    rnn_type: str = "GRU"
    num_layers: int = 1
    dropout: float = 0.0
    bidirectional: bool = False
    normalize_output: bool = True
    compute_dtype: str = "bfloat16"
    # Row-shard the embedding table over this mesh axis (inside shard_map);
    # None -> table is local/replicated and lookup is a plain gather.
    embedding_axis: Optional[str] = None

    def __post_init__(self):
        if self.rnn_type not in _GATES:
            raise ValueError(f"rnn_type must be one of {list(_GATES)}")

    @property
    def num_gates(self) -> int:
        return _GATES[self.rnn_type]

    @classmethod
    def from_config(cls, config) -> "RNNSpec":
        return cls(
            vocab_size=config.vocab_size,
            embed_dim=config.embed_dim,
            hidden_dim=config.hidden_dim,
            rnn_type=config.rnn_type,
            num_layers=config.num_layers,
            dropout=config.dropout,
            bidirectional=config.bidirectional,
            normalize_output=config.normalize_output,
            compute_dtype=config.compute_dtype,
            embedding_axis="model" if config.shard_embedding_table else None,
        )


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def init_rnn_encoder(
    rng: jax.Array,
    spec: RNNSpec,
    pretrained_embeddings: Optional[np.ndarray] = None,
) -> Dict[str, Any]:
    """Initialize encoder params as a pytree of f32 arrays."""
    h = spec.hidden_dim
    g = spec.num_gates
    scale = 1.0 / np.sqrt(h)
    directions = ("fwd", "bwd") if spec.bidirectional else ("fwd",)

    n_keys = 1 + spec.num_layers * len(directions) * 4 + (2 if spec.bidirectional else 0)
    keys = iter(jax.random.split(rng, n_keys))

    if pretrained_embeddings is not None:
        if pretrained_embeddings.shape != (spec.vocab_size, spec.embed_dim):
            raise ValueError(
                f"pretrained table {pretrained_embeddings.shape} != "
                f"({spec.vocab_size}, {spec.embed_dim})"
            )
        embedding = jnp.asarray(pretrained_embeddings, dtype=jnp.float32)
        next(keys)
    else:
        embedding = jax.random.normal(next(keys), (spec.vocab_size, spec.embed_dim), jnp.float32)

    def uniform(key, shape):
        return jax.random.uniform(key, shape, jnp.float32, -scale, scale)

    layers = []
    for layer in range(spec.num_layers):
        in_dim = spec.embed_dim if layer == 0 else h * len(directions)
        layer_params = {}
        for d in directions:
            layer_params[d] = {
                "w_ih": uniform(next(keys), (in_dim, g * h)),
                "w_hh": uniform(next(keys), (h, g * h)),
                "b_ih": uniform(next(keys), (g * h,)),
                "b_hh": uniform(next(keys), (g * h,)),
            }
        layers.append(layer_params)

    params: Dict[str, Any] = {"embedding": embedding, "layers": tuple(layers)}
    if spec.bidirectional:
        # Linear(2H -> H) after fwd/bwd concat (ref: model.py:43-46)
        lim = 1.0 / np.sqrt(2 * h)
        params["projection"] = {
            "w": jax.random.uniform(next(keys), (2 * h, h), jnp.float32, -lim, lim),
            "b": jax.random.uniform(next(keys), (h,), jnp.float32, -lim, lim),
        }
    return params


# ---------------------------------------------------------------------------
# apply
# ---------------------------------------------------------------------------


def _cell_step(rnn_type: str, xp_t: jax.Array, h: jax.Array, c, w_hh, b_hh, cdt):
    """One recurrent step, batched over directions. xp_t: [D, B, G*H]
    precomputed input projection (+b_ih); h, c: [D, B, H] f32 carries;
    w_hh: [D, H, G*H]; b_hh: [D, 1, G*H]. Returns (h_new, c_new).

    The direction axis D rides the matmul as a dot_general batch dim, so a
    bidirectional layer issues ONE batched [D, B, H] @ [D, H, G*H] per step
    instead of two serial scans — the scan is latency-bound (the matmuls are
    far below MXU saturation), so halving the step count ~halves wall time.
    """
    hp = (
        jax.lax.dot_general(
            h.astype(cdt), w_hh.astype(cdt),
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=matmul_precision(cdt),
        )
        + b_hh
    )
    if rnn_type == "GRU":
        x_r, x_z, x_n = jnp.split(xp_t, 3, axis=-1)
        h_r, h_z, h_n = jnp.split(hp, 3, axis=-1)
        r = jax.nn.sigmoid(x_r + h_r)
        z = jax.nn.sigmoid(x_z + h_z)
        n = jnp.tanh(x_n + r * h_n)
        return (1.0 - z) * n + z * h, c
    if rnn_type == "LSTM":
        gi, gf, gg, go = jnp.split(xp_t + hp, 4, axis=-1)
        c_new = jax.nn.sigmoid(gf) * c + jax.nn.sigmoid(gi) * jnp.tanh(gg)
        return jax.nn.sigmoid(go) * jnp.tanh(c_new), c_new
    # vanilla RNN (tanh)
    return jnp.tanh(xp_t + hp), c


def _batched_matmul(a: jax.Array, b: jax.Array, cdt) -> jax.Array:
    """[D, B, K] @ [D, K, N] -> [D, B, N], operands cast to cdt, f32 accum."""
    return jax.lax.dot_general(
        a.astype(cdt), b.astype(cdt),
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=matmul_precision(cdt),
    )


def _fused_plan(xp0, w_hh, compute_dtype):
    """Which fused time-loop plan applies (ops/rnn_scan.plan_fused):
    'fused' (one combined program — the reference-shape fast path),
    'split' (per-direction programs + hoisted weight-grad matmul — keeps
    H=1024 towers fused, VERDICT r3 #5), or None (XLA scan)."""
    if os.environ.get("TTMR_DISABLE_FUSED_RNN"):
        return None
    from twotowermlretrieval_tpu.ops.rnn_scan import plan_fused

    T, B, GH = xp0.shape
    D, H = w_hh.shape[0], w_hh.shape[1]
    cdt_bytes = jnp.dtype(compute_dtype).itemsize
    try:
        if jax.devices()[0].platform != "tpu":
            return None
    except Exception:
        return None
    return plan_fused(B, H, GH, D, cdt_bytes)


def _stack_fallback_inputs(xps, mask2):
    """Per-direction original-order arrays -> the stacked/flipped layout the
    XLA scan consumes: x_proj [T, D, B, G*H], mask [T, D, B, 1]."""
    if len(xps) == 1:
        return xps[0][:, None], mask2[:, None, :, None]
    x_proj = jnp.stack([xps[0], jnp.flip(xps[1], axis=0)], axis=1)
    msk = jnp.stack([mask2, jnp.flip(mask2, axis=0)], axis=1)[..., None]
    return x_proj, msk


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _scan_layer(
    rnn_type: str,
    compute_dtype: str,
    xps,  # tuple of per-direction [T, B, G*H] f32, ORIGINAL time order
    mask2: jax.Array,  # [T, B] f32
    w_hh: jax.Array,  # [D, H, G*H]
    b_hh: jax.Array,  # [D, G*H]
):
    """One recurrent layer over all D directions.

    Returns (outs — tuple of per-direction [T, B, H] in original time
    order, final hidden [D, B, H]).

    Custom VJP: autodiff of a ``lax.scan`` carries the [D, H, G*H] weight
    cotangent through every reverse step and accumulates it with a per-step
    matmul — three serial matmuls per step plus carry traffic, all
    latency-bound. The hand-written backward (:func:`_scan_layer_bwd`)
    recomputes the gate activations from the saved hidden-state history
    (cheap; the recurrence is latency-bound, not FLOP-bound), emits the
    per-step pre-activation cotangents, and hoists BOTH weight gradients
    out of the scan.

    On TPU with tile-aligned GRU shapes both passes run as fused Pallas
    time-loop kernels (ops/rnn_scan.py) whose per-direction BlockSpec index
    maps read/write original-order arrays directly — no stack/flip/concat
    copies anywhere. Elsewhere the XLA masked scan below is used.
    """
    outs, _, h_final = _scan_layer_fwd_impl(rnn_type, compute_dtype, xps, mask2, w_hh, b_hh)
    return outs, h_final


def _scan_layer_fwd_impl(rnn_type, compute_dtype, xps, mask2, w_hh, b_hh):
    plan = _fused_plan(xps[0], w_hh, compute_dtype)
    # Saved state history (the tensors the backward re-reads) is stored in
    # the compute dtype when that is 16-bit: measured +6% step throughput
    # at the reference shape once the timing protocol could resolve it
    # (docs/RESULTS.md round 5), and the gradient error stays inside the
    # bf16-compute envelope (tests/test_rnn_kernel.py). TTMR_RNN_HISTORY
    # overrides: "f32" forces full-precision history, "cdt" forces the
    # compact history even for f32 compute (a no-op there).
    env = os.environ.get("TTMR_RNN_HISTORY")
    if env:
        # any explicit setting other than "cdt" means full-precision
        # history (the pre-round-5 semantics for this variable, so stale
        # values can only ever select the conservative path)
        hist = env == "cdt"
    else:
        hist = jnp.dtype(compute_dtype).itemsize == 2
    if plan == "fused":
        from twotowermlretrieval_tpu.ops.rnn_scan import rnn_layer_fwd

        outs, c_hist, h_final = rnn_layer_fwd(
            rnn_type, xps, mask2, w_hh, b_hh, compute_dtype=compute_dtype,
            history_in_cdt=hist,
        )
        return outs, c_hist, h_final
    if plan == "split":
        # one fused program per direction (the combined program's resident
        # weights would exceed scoped VMEM at this H)
        from twotowermlretrieval_tpu.ops.rnn_scan import _SPLIT_VMEM_MB, rnn_layer_fwd

        outs, c_hists, h_fins = [], [], []
        for d in range(len(xps)):
            o, ch, hf = rnn_layer_fwd(
                rnn_type, (xps[d],), mask2, w_hh[d : d + 1], b_hh[d : d + 1],
                compute_dtype=compute_dtype, directions=(d,),
                vmem_limit_mb=_SPLIT_VMEM_MB, history_in_cdt=hist,
            )
            outs.append(o[0])
            if ch:
                c_hists.append(ch[0])
            h_fins.append(hf)
        return tuple(outs), tuple(c_hists), jnp.concatenate(h_fins, axis=0)

    x_proj, mask = _stack_fallback_inputs(xps, mask2)
    outputs, c_hist, h_final = _stacked_scan_fwd(
        rnn_type, compute_dtype, x_proj, mask, w_hh, b_hh[:, None, :]
    )
    if len(xps) == 1:
        outs = (outputs[:, 0],)
    else:
        outs = (outputs[:, 0], jnp.flip(outputs[:, 1], axis=0))
    return outs, c_hist, h_final


def _stacked_scan_fwd(rnn_type, compute_dtype, x_proj, mask, w_hh, b_hh):
    cdt = jnp.dtype(compute_dtype)
    D, B = x_proj.shape[1], x_proj.shape[2]
    H = w_hh.shape[1]
    h0 = jnp.zeros((D, B, H), jnp.float32)
    c0 = jnp.zeros((D, B, H), jnp.float32) if rnn_type == "LSTM" else h0

    def step(carry, inputs):
        h, c = carry
        xp_t, m_t = inputs
        h_new, c_new = _cell_step(rnn_type, xp_t, h, c, w_hh, b_hh, cdt)
        # Masked update: padding steps are identity (packed-sequence semantics)
        h = m_t * h_new + (1.0 - m_t) * h
        c = m_t * c_new + (1.0 - m_t) * c
        out = (h, c) if rnn_type == "LSTM" else (h, jnp.zeros((0,), jnp.float32))
        return (h, c), out

    (h_final, _), (outputs, c_hist) = jax.lax.scan(step, (h0, c0), (x_proj, mask))
    return outputs, c_hist, h_final


def _scan_layer_fwd(rnn_type, compute_dtype, xps, mask2, w_hh, b_hh):
    outs, c_hist, h_final = _scan_layer_fwd_impl(
        rnn_type, compute_dtype, xps, mask2, w_hh, b_hh
    )
    residuals = (xps, mask2, w_hh, b_hh, outs, c_hist)
    return (outs, h_final), residuals


def _scan_layer_bwd(rnn_type, compute_dtype, residuals, cotangents):
    xps, mask2, w_hh, b_hh, outs, c_hist = residuals
    douts, d_hfinal = cotangents
    plan = _fused_plan(xps[0], w_hh, compute_dtype)
    if plan == "fused":
        from twotowermlretrieval_tpu.ops.rnn_scan import (
            rnn_layer_bwd,
            rnn_layer_bwd_hoisted,
        )

        # TTMR_RNN_BWD_PLAN=hoisted swaps the combined backward for the
        # hoisted-dw variant (2 instead of 3 MXU matmuls per step, weight
        # gradient as one XLA matmul outside) — a measurement knob; the
        # default stays the measured winner (docs/RESULTS.md round 5).
        if os.environ.get("TTMR_RNN_BWD_PLAN") == "hoisted":
            dxps, dw_hh, db_hh = rnn_layer_bwd_hoisted(
                rnn_type, xps, mask2, w_hh, b_hh, outs, c_hist, douts, d_hfinal,
                compute_dtype=compute_dtype,
            )
        else:
            dxps, dw_hh, db_hh = rnn_layer_bwd(
                rnn_type, xps, mask2, w_hh, b_hh, outs, c_hist, douts, d_hfinal,
                compute_dtype=compute_dtype,
            )
        return dxps, jnp.zeros_like(mask2), dw_hh, db_hh
    if plan == "split":
        from twotowermlretrieval_tpu.ops.rnn_scan import rnn_layer_bwd_split_full

        dxps, dw_hh, db_hh = rnn_layer_bwd_split_full(
            rnn_type, xps, mask2, w_hh, b_hh, outs, c_hist, douts, d_hfinal,
            compute_dtype=compute_dtype,
        )
        return dxps, jnp.zeros_like(mask2), dw_hh, db_hh

    # XLA fallback: restack into the [T, D, B, ...] layout, run the
    # hand-written reverse scan, unstack the cotangents.
    x_proj, mask = _stack_fallback_inputs(xps, mask2)
    if len(xps) == 1:
        outputs = outs[0][:, None]
        d_outputs = douts[0][:, None]
    else:
        outputs = jnp.stack([outs[0], jnp.flip(outs[1], axis=0)], axis=1)
        d_outputs = jnp.stack([douts[0], jnp.flip(douts[1], axis=0)], axis=1)
    dxp, dw_hh, db_hh = _stacked_scan_bwd(
        rnn_type, compute_dtype, x_proj, mask, w_hh, b_hh[:, None, :],
        outputs, c_hist, d_outputs, d_hfinal,
    )
    if len(xps) == 1:
        dxps = (dxp[:, 0],)
    else:
        dxps = (dxp[:, 0], jnp.flip(dxp[:, 1], axis=0))
    return dxps, jnp.zeros_like(mask2), dw_hh, db_hh[:, 0, :]


def _stacked_scan_bwd(
    rnn_type, compute_dtype, x_proj, mask, w_hh, b_hh, outputs, c_hist, d_outputs, d_hfinal
):
    cdt = jnp.dtype(compute_dtype)
    T, D, B, H = outputs.shape
    h0 = jnp.zeros((D, B, H), jnp.float32)
    # h_{t-1} history from the saved outputs (h0 is zeros)
    h_prev = jnp.concatenate([h0[None], outputs[:-1]], axis=0)  # [T, D, B, H]
    w_hh_t = jnp.swapaxes(w_hh, 1, 2)  # [D, G*H, H]

    if rnn_type == "LSTM":
        c_prev = jnp.concatenate([h0[None], c_hist[:-1]], axis=0)
    else:
        c_prev = jnp.zeros((T, 0), jnp.float32)  # unused placeholder

    def step(carry, inputs):
        dh, dc = carry
        xp_t, m_t, hp_prev_t, cp_prev_t, h_t, d_out_t = inputs
        dh = dh + d_out_t
        dh_new = dh * m_t
        dh_direct = dh * (1.0 - m_t)

        if rnn_type == "GRU":
            # recompute gates from (h_{t-1}, xp_t) — one batched matmul
            hp = _batched_matmul(hp_prev_t, w_hh, cdt) + b_hh
            x_r, x_z, x_n = jnp.split(xp_t, 3, axis=-1)
            h_r, h_z, h_n = jnp.split(hp, 3, axis=-1)
            r = jax.nn.sigmoid(x_r + h_r)
            z = jax.nn.sigmoid(x_z + h_z)
            n = jnp.tanh(x_n + r * h_n)
            dz = dh_new * (hp_prev_t - n)
            dn = dh_new * (1.0 - z)
            dn_pre = dn * (1.0 - n * n)
            dr = dn_pre * h_n
            dz_pre = dz * z * (1.0 - z)
            dr_pre = dr * r * (1.0 - r)
            dxp_t = jnp.concatenate([dr_pre, dz_pre, dn_pre], axis=-1)
            dhp_t = jnp.concatenate([dr_pre, dz_pre, dn_pre * r], axis=-1)
            dh_prev = (
                _batched_matmul(dhp_t, w_hh_t, cdt) + dh_new * z + dh_direct
            )
            # Emit compact cdt streams: dxp plus the reset gate r, from which
            # dhp is reconstructed outside the scan (dhp differs from dxp
            # only in the candidate third: dhp_n = dxp_n * r). Halves the
            # scan's HBM output traffic in bf16.
            return (dh_prev, dc), (dxp_t.astype(cdt), r.astype(cdt))

        if rnn_type == "LSTM":
            dc_new = dc * m_t
            dc_direct = dc * (1.0 - m_t)
            hp = _batched_matmul(hp_prev_t, w_hh, cdt) + b_hh
            gi, gf, gg, go = jnp.split(xp_t + hp, 4, axis=-1)
            i = jax.nn.sigmoid(gi)
            f = jax.nn.sigmoid(gf)
            g = jnp.tanh(gg)
            o = jax.nn.sigmoid(go)
            c_new = f * cp_prev_t + i * g
            tanh_c = jnp.tanh(c_new)
            do = dh_new * tanh_c
            dc_new = dc_new + dh_new * o * (1.0 - tanh_c * tanh_c)
            di = dc_new * g
            df = dc_new * cp_prev_t
            dg = dc_new * i
            dc_prev = dc_new * f + dc_direct
            dgates = jnp.concatenate(
                [
                    di * i * (1.0 - i),
                    df * f * (1.0 - f),
                    dg * (1.0 - g * g),
                    do * o * (1.0 - o),
                ],
                axis=-1,
            )
            dh_prev = _batched_matmul(dgates, w_hh_t, cdt) + dh_direct
            # dxp == dhp == dgates for LSTM; emit one cdt stream.
            return (dh_prev, dc_prev), (dgates.astype(cdt), jnp.zeros((0,), cdt))

        # vanilla RNN (tanh): h_new == h_t wherever m_t==1, and dh_new==0
        # wherever m_t==0, so the saved (masked) output stands in for h_new.
        dpre = dh_new * (1.0 - h_t * h_t)
        dh_prev = _batched_matmul(dpre, w_hh_t, cdt) + dh_direct
        return (dh_prev, dc), (dpre.astype(cdt), jnp.zeros((0,), cdt))

    dc0 = jnp.zeros((D, B, H), jnp.float32)
    # reverse=True iterates t = T-1 .. 0 and writes stacked outputs at their
    # original time indices — no jnp.flip materializations anywhere.
    (dh0, _), (dxp_c, aux_c) = jax.lax.scan(
        step,
        (d_hfinal, dc0),
        (x_proj, mask, h_prev, c_prev, outputs, d_outputs),
        reverse=True,
    )

    # Reconstruct dhp (cotangent of the recurrent pre-activation) from the
    # compact streams; for GRU it differs from dxp only in the candidate
    # third (dhp_n = dxp_n * r).
    if rnn_type == "GRU":
        GH = dxp_c.shape[-1]
        dhp_c = jnp.concatenate(
            [dxp_c[..., : 2 * GH // 3], dxp_c[..., 2 * GH // 3 :] * aux_c], axis=-1
        )
    else:
        dhp_c = dxp_c

    # Hoisted weight gradient: ONE batched [D, H, T*B] @ [D, T*B, G*H] MXU
    # matmul instead of a per-step accumulation carried through the scan.
    # Transpose-reshape to a single contracting dim — the multi-contraction
    # einsum form is rejected by CPU's bf16 dot thunk.
    TB = T * B
    h_prev_flat = h_prev.transpose(1, 0, 2, 3).reshape(D, TB, H)
    dhp_flat = dhp_c.transpose(1, 0, 2, 3).reshape(D, TB, dhp_c.shape[-1])
    dw_hh = jax.lax.dot_general(
        h_prev_flat.astype(cdt), dhp_flat.astype(cdt),
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=matmul_precision(cdt),
    )  # [D, H, G*H]
    db_hh = jnp.sum(dhp_c.astype(jnp.float32), axis=(0, 2))[:, None, :]  # [D, 1, G*H]
    return dxp_c.astype(x_proj.dtype), dw_hh, db_hh


_scan_layer.defvjp(_scan_layer_fwd, _scan_layer_bwd)


def rnn_encode(
    params: Dict[str, Any],
    tokens: jax.Array,  # int32 [B, T]
    lengths: jax.Array,  # int32 [B]
    spec: RNNSpec,
    *,
    train: bool = False,
    dropout_rng: Optional[jax.Array] = None,
) -> jax.Array:
    """Encode token batches to [B, H] embeddings.

    Equivalent of ``RNNEncoder.forward`` (ref: model.py:48-75) with explicit
    lengths instead of the pad-id-0 sentinel (ref bug: model.py:52).
    """
    cdt = jnp.dtype(spec.compute_dtype)
    B, T = tokens.shape
    H = spec.hidden_dim

    if spec.embedding_axis is not None:
        from twotowermlretrieval_tpu.parallel.embedding import sharded_embedding_lookup

        x = sharded_embedding_lookup(params["embedding"], tokens, spec.embedding_axis)
    else:
        x = jnp.take(params["embedding"], tokens, axis=0)  # [B, T, E] f32
    # [T, B] time-major validity mask from lengths
    t_idx = jax.lax.broadcasted_iota(jnp.int32, (T, B), 0)
    mask2 = (t_idx < lengths[None, :]).astype(jnp.float32)

    directions = ("fwd", "bwd") if spec.bidirectional else ("fwd",)
    use_dropout = train and spec.dropout > 0.0 and spec.num_layers > 1
    if use_dropout and dropout_rng is None:
        raise ValueError("dropout_rng required when train=True and dropout>0")

    # The layer input is carried as per-direction PARTS (the previous
    # layer's fwd/bwd outputs) instead of one concatenated array: the input
    # projection contracts each part against the matching row-block of
    # w_ih, so the [T, B, 2H] concat copy never materializes and the fused
    # kernels read/write original-time-order arrays directly.
    parts = (jnp.swapaxes(x, 0, 1),)  # tuple of [T, B, *]
    finals = {}
    for li, layer in enumerate(params["layers"]):
        w_hh = jnp.stack([layer[d]["w_hh"] for d in directions])  # [D, H, G*H]
        b_hh = jnp.stack([layer[d]["b_hh"] for d in directions])  # [D, G*H]
        xps = []
        for d in directions:
            w_ih = layer[d]["w_ih"]  # [I_total, G*H]
            acc = None
            row = 0
            for p in parts:
                w_rows = jax.lax.slice_in_dim(w_ih, row, row + p.shape[-1], axis=0)
                term = jnp.dot(
                    p.astype(cdt), w_rows.astype(cdt),
                    preferred_element_type=jnp.float32,
                    precision=matmul_precision(cdt),
                )
                acc = term if acc is None else acc + term
                row += p.shape[-1]
            xps.append(acc + layer[d]["b_ih"])  # [T, B, G*H]
        outs, h_final = _scan_layer(
            spec.rnn_type, spec.compute_dtype, tuple(xps), mask2, w_hh, b_hh
        )
        for di, d in enumerate(directions):
            finals[d] = h_final[di]
        parts = outs
        # Inter-layer dropout, as torch: on every layer's output except the
        # last, only when num_layers > 1 (ref: model.py:30-37).
        if use_dropout and li < spec.num_layers - 1:
            keep = 1.0 - spec.dropout
            new_parts = []
            for p in parts:
                dropout_rng, sub = jax.random.split(dropout_rng)
                new_parts.append(p * fast_bernoulli(sub, keep, p.shape) / keep)
            parts = tuple(new_parts)

    if spec.bidirectional:
        hidden = jnp.concatenate([finals["fwd"], finals["bwd"]], axis=-1)  # [B, 2H]
        proj = params["projection"]
        hidden = (
            jnp.dot(hidden.astype(cdt), proj["w"].astype(cdt),
                    preferred_element_type=jnp.float32,
                    precision=matmul_precision(cdt))
            + proj["b"]
        )
    else:
        hidden = finals["fwd"]

    # Zero-length rows must encode to exactly zero (the reference guards
    # empty queries host-side, ref: query_inferencer.py:65-69; here the
    # bidirectional projection bias would otherwise leak through).
    hidden = hidden * (lengths > 0).astype(jnp.float32)[:, None]

    if spec.normalize_output:
        # L2-normalize with the same 1e-12 guard as F.normalize
        # (ref: model.py:73-74); zero-length inputs stay exactly zero.
        norm = jnp.maximum(jnp.linalg.norm(hidden, axis=-1, keepdims=True), 1e-12)
        hidden = hidden / norm
    return hidden
