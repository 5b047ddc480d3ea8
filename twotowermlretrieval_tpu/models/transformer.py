"""Transformer encoder towers — the scaling-efficiency configuration.

The reference has no transformer (its towers are GRU, ref: backend/model.py:30-37);
this is the BASELINE.json config-5 architecture: a pre-LN transformer encoder
over the same GloVe vocabulary, masked mean-pooled to a [B, H] embedding,
designed for large-batch multi-host training where the 'model' mesh axis can
shard attention heads and FFN width.

TPU notes: all shapes static; attention uses a [B, 1, 1, T] additive mask;
matmuls run in ``compute_dtype`` (bf16) with f32 accumulation; head_dim
stays a multiple of MXU-friendly sizes when hidden_dim is (128/256/...).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from twotowermlretrieval_tpu.ops.attention import fused_attention, use_fused_attention
from twotowermlretrieval_tpu.utils.dtypes import fast_bernoulli, matmul_precision


@dataclasses.dataclass(frozen=True)
class TransformerSpec:
    vocab_size: int
    embed_dim: int
    hidden_dim: int
    num_layers: int = 6
    num_heads: int = 4
    ffn_dim: int = 1024
    dropout: float = 0.0
    normalize_output: bool = True
    compute_dtype: str = "bfloat16"
    max_len: int = 512  # learned positional table size
    embedding_axis: Optional[str] = None  # row-shard table over this axis
    # Tensor parallelism over the mesh 'model' axis (SURVEY.md §2b row 2,
    # BASELINE config 5): attention heads and FFN width are column-sharded
    # (each shard computes num_heads/M local heads and ffn_dim/M columns),
    # the attn-out and ffn-out projections are row-sharded, and one psum
    # per sublayer restores the replicated activations. Megatron-style:
    # two collectives per block, everything else local.
    model_axis: Optional[str] = None
    model_axis_size: int = 1
    # Rematerialize each block under jax.checkpoint: recomputing the block
    # forward inside the backward trades cheap MXU FLOPs for the saved
    # intermediates' store/reload traffic and caps activation memory at
    # O(layers) residuals instead of O(layers) full blocks.
    remat_blocks: bool = False
    # Residual-stream dtype: 'float32' (default, exact parity with the
    # round-2 numerics) or 'bfloat16' (halves elementwise/residual HBM
    # traffic; layer-norm statistics are always computed in f32).
    residual_dtype: str = "float32"
    # Fused attention (ops/attention.py): softmax scores stay VMEM-resident
    # instead of materializing [B, heads, T, T] in HBM — the long-sequence
    # memory valve. Measured SLOWER than the transpose-free bf16-score XLA
    # path at encoder shapes (docs/RESULTS.md round 4), so None = off;
    # True forces the kernel, False forces XLA.
    fused_attention: Optional[bool] = None

    def __post_init__(self):
        if self.hidden_dim % self.num_heads != 0:
            raise ValueError("hidden_dim must divide num_heads")
        if self.model_axis is not None and self.model_axis_size > 1:
            if self.num_heads % self.model_axis_size:
                raise ValueError(
                    f"num_heads={self.num_heads} must divide evenly over the "
                    f"model axis ({self.model_axis_size})"
                )
            if self.ffn_dim % self.model_axis_size:
                raise ValueError(
                    f"ffn_dim={self.ffn_dim} must divide evenly over the "
                    f"model axis ({self.model_axis_size})"
                )

    @property
    def head_dim(self) -> int:
        return self.hidden_dim // self.num_heads

    @classmethod
    def from_config(cls, config) -> "TransformerSpec":
        tp = getattr(config, "mesh_model", 1) > 1
        return cls(
            vocab_size=config.vocab_size,
            embed_dim=config.embed_dim,
            hidden_dim=config.hidden_dim,
            num_layers=config.num_layers,
            num_heads=config.num_heads,
            ffn_dim=config.ffn_dim,
            dropout=config.dropout,
            normalize_output=config.normalize_output,
            compute_dtype=config.compute_dtype,
            max_len=max(config.max_doc_len, config.max_query_len),
            embedding_axis="model" if config.shard_embedding_table else None,
            model_axis="model" if tp else None,
            model_axis_size=config.mesh_model if tp else 1,
            remat_blocks=getattr(config, "remat_blocks", False),
            residual_dtype=getattr(config, "residual_dtype", "float32"),
            fused_attention=getattr(config, "fused_attention", None),
        )


def _dense_init(key, shape):
    fan_in = shape[0]
    return jax.random.normal(key, shape, jnp.float32) * (1.0 / np.sqrt(fan_in))


import functools as _functools


@_functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _copy_to_tp(x, axis):
    """Identity forward / psum backward over the TP axis (Megatron's 'f'
    operator). Placed on the replicated activation entering each
    column-parallel matmul: every shard's backward pass contributes only
    its local heads'/FFN-columns' cotangent, so without this psum the
    gradients of all upstream REPLICATED params (layer norms, input
    projection, embeddings) would be silently partial per shard."""
    return x


def _copy_to_tp_fwd(x, axis):
    return x, None


def _copy_to_tp_bwd(axis, _, ct):
    return (jax.lax.psum(ct, axis),)


_copy_to_tp.defvjp(_copy_to_tp_fwd, _copy_to_tp_bwd)


@_functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _reduce_from_tp(x, axis):
    """psum forward / identity backward (Megatron's 'g' operator), used on
    the row-parallel out-projections' partial sums. The custom VJP matters:
    the output cotangent is replicated across the TP axis, so each shard's
    partial input gets it verbatim — differentiating through a raw psum
    under shard_map(check_vma=False) instead transposes to another psum
    and over-counts every upstream gradient by the axis size."""
    return jax.lax.psum(x, axis)


def _reduce_from_tp_fwd(x, axis):
    return jax.lax.psum(x, axis), None


def _reduce_from_tp_bwd(axis, _, ct):
    return (ct,)


_reduce_from_tp.defvjp(_reduce_from_tp_fwd, _reduce_from_tp_bwd)


def init_transformer_encoder(
    rng: jax.Array,
    spec: TransformerSpec,
    pretrained_embeddings: Optional[np.ndarray] = None,
) -> Dict[str, Any]:
    keys = iter(jax.random.split(rng, 3 + spec.num_layers * 4))
    if pretrained_embeddings is not None:
        embedding = jnp.asarray(pretrained_embeddings, jnp.float32)
        next(keys)
    else:
        embedding = jax.random.normal(next(keys), (spec.vocab_size, spec.embed_dim), jnp.float32)

    H = spec.hidden_dim
    params: Dict[str, Any] = {
        "embedding": embedding,
        "input_proj": {"w": _dense_init(next(keys), (spec.embed_dim, H)), "b": jnp.zeros((H,))},
        "pos_embedding": jax.random.normal(next(keys), (spec.max_len, H), jnp.float32) * 0.02,
    }
    blocks = []
    for _ in range(spec.num_layers):
        blocks.append(
            {
                "ln1": {"scale": jnp.ones((H,)), "bias": jnp.zeros((H,))},
                # qkv is head-major [H, 3, H]: the last axis is nh*hd, so a
                # contiguous split over the 'model' mesh axis hands each
                # shard whole heads (q, k and v alike)
                "qkv": {
                    "w": _dense_init(next(keys), (H, 3 * H)).reshape(H, 3, H),
                    "b": jnp.zeros((3, H)),
                },
                "attn_out": {"w": _dense_init(next(keys), (H, H)), "b": jnp.zeros((H,))},
                "ln2": {"scale": jnp.ones((H,)), "bias": jnp.zeros((H,))},
                "ffn_in": {"w": _dense_init(next(keys), (H, spec.ffn_dim)), "b": jnp.zeros((spec.ffn_dim,))},
                "ffn_out": {"w": _dense_init(next(keys), (spec.ffn_dim, H)), "b": jnp.zeros((H,))},
            }
        )
    params["blocks"] = tuple(blocks)
    params["ln_final"] = {"scale": jnp.ones((H,)), "bias": jnp.zeros((H,))}
    return params


def _layer_norm(x, p, eps=1e-6, out_dtype=None):
    """Layer norm with f32 statistics regardless of the stream dtype; the
    result is cast to ``out_dtype`` (default: x.dtype) so a bf16 residual
    stream stays bf16 without giving up f32 mean/variance."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    out = (xf - mean) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]
    return out.astype(out_dtype or x.dtype)


def _dense(x, p, cdt):
    return (
        jnp.dot(x.astype(cdt), p["w"].astype(cdt), preferred_element_type=jnp.float32,
                precision=matmul_precision(cdt))
        + p["b"]
    )


def transformer_encode(
    params: Dict[str, Any],
    tokens: jax.Array,  # int32 [B, T]
    lengths: jax.Array,  # int32 [B]
    spec: TransformerSpec,
    *,
    train: bool = False,
    dropout_rng: Optional[jax.Array] = None,
) -> jax.Array:
    """Masked pre-LN transformer encoder -> masked mean-pool -> [B, H]."""
    cdt = jnp.dtype(spec.compute_dtype)
    B, T = tokens.shape
    H, nh, hd = spec.hidden_dim, spec.num_heads, spec.head_dim
    use_dropout = train and spec.dropout > 0.0
    if use_dropout and dropout_rng is None:
        raise ValueError("dropout_rng required when train=True and dropout>0")

    def maybe_dropout(x, rng):
        if not use_dropout:
            return x, rng
        rng, sub = jax.random.split(rng)
        keep = 1.0 - spec.dropout
        return x * fast_bernoulli(sub, keep, x.shape) / keep, rng

    t_idx = jax.lax.broadcasted_iota(jnp.int32, (B, T), 1)
    valid = (t_idx < lengths[:, None]).astype(jnp.float32)  # [B, T]
    attn_bias = (1.0 - valid)[:, None, None, :] * -1e9  # [B, 1, 1, T]

    if spec.embedding_axis is not None:
        from twotowermlretrieval_tpu.parallel.embedding import sharded_embedding_lookup

        x = sharded_embedding_lookup(params["embedding"], tokens, spec.embedding_axis)
    else:
        x = jnp.take(params["embedding"], tokens, axis=0)  # [B, T, E]
    x = _dense(x, params["input_proj"], cdt) + params["pos_embedding"][:T][None, :, :]

    # Tensor parallelism: under shard_map over spec.model_axis each shard
    # holds whole heads (qkv w [H, 3, H/M]) and an FFN column slice; the
    # row-sharded out-projections produce partial sums, restored to
    # replicated activations by ONE psum per sublayer (Megatron pattern).
    # With model_axis=None the same code runs with M=1 and no collectives.
    tp = spec.model_axis is not None and spec.model_axis_size > 1

    def psum_if_tp(v):
        return _reduce_from_tp(v, spec.model_axis) if tp else v

    rdt = jnp.dtype(spec.residual_dtype)

    def run_block(x, rng, block, attn_bias):
        # --- attention sublayer (pre-LN) ---
        y = _layer_norm(x, block["ln1"], out_dtype=rdt)
        if tp:
            y = _copy_to_tp(y, spec.model_axis)
        w_qkv = block["qkv"]["w"]  # [H, 3, H_local]
        b_qkv = block["qkv"]["b"]
        if w_qkv.ndim == 2:
            # legacy checkpoint layout [H, 3H]/[3H] (pre-head-major);
            # columns were ordered q|k|v, so the reshape is the migration
            w_qkv = w_qkv.reshape(w_qkv.shape[0], 3, w_qkv.shape[1] // 3)
            b_qkv = b_qkv.reshape(3, -1)
        H_local = w_qkv.shape[-1]
        nh_local = H_local // hd
        qkv = (
            jnp.einsum("bth,hcj->btcj", y.astype(cdt), w_qkv.astype(cdt),
                       preferred_element_type=jnp.float32,
                       precision=matmul_precision(cdt))
            + b_qkv
        ).astype(rdt)  # [B, T, 3, H_local]; rdt=bf16 halves the SAVED
        # activation traffic (accumulation stayed f32 — XLA fuses the
        # cast into the matmul epilogue, so no f32 tensor hits HBM)
        if use_fused_attention(T, hd, spec.fused_attention):
            # Opt-in Pallas kernel (ops/attention.py): [B, heads, T, T]
            # never reaches HBM — the long-sequence memory valve. At the
            # config-5 encoder shapes it measured SLOWER than the XLA
            # path below (docs/RESULTS.md round 4), so the policy never
            # auto-selects it; FUSED_ATTENTION: true dispatches it
            # unconditionally (the whole-T-in-VMEM design is supported
            # to T ~ 512 — forcing it beyond that is on the caller).
            q = qkv[:, :, 0].reshape(B, T, nh_local, hd).transpose(0, 2, 1, 3)
            k = qkv[:, :, 1].reshape(B, T, nh_local, hd).transpose(0, 2, 1, 3)
            v = qkv[:, :, 2].reshape(B, T, nh_local, hd).transpose(0, 2, 1, 3)
            R = B * nh_local
            bias_rows = jnp.broadcast_to(
                attn_bias[:, 0], (B, nh_local, T)
            ).reshape(R, T)
            attn = fused_attention(
                q.reshape(R, T, hd), k.reshape(R, T, hd),
                v.reshape(R, T, hd), bias_rows,
                float(1.0 / np.sqrt(hd)), spec.compute_dtype,
            ).reshape(B, nh_local, T, hd)
            attn = attn.transpose(0, 2, 1, 3).reshape(B, T, H_local)
        else:
            # XLA attention, transpose-free: einsums contract straight
            # from the [B, T, heads, hd] projection layout (XLA folds the
            # relayout into the matmuls) and the score/prob tensors are
            # stored bf16 (softmax statistics still f32). Measured 8.84
            # -> 6.40 ms per doc-shape sublayer fwd+bwd vs the explicit-
            # transpose f32-score formulation (docs/RESULTS.md round 4).
            q = qkv[:, :, 0].reshape(B, T, nh_local, hd)
            k = qkv[:, :, 1].reshape(B, T, nh_local, hd)
            v = qkv[:, :, 2].reshape(B, T, nh_local, hd)
            scores = jnp.einsum(
                "bqhd,bkhd->bhqk", q.astype(cdt), k.astype(cdt),
                preferred_element_type=cdt,
                precision=matmul_precision(cdt),
            ) * cdt.type(1.0 / np.sqrt(hd)) + attn_bias.astype(cdt)
            probs = jax.nn.softmax(
                scores.astype(jnp.float32), axis=-1
            ).astype(cdt)
            attn = jnp.einsum("bhqk,bkhd->bqhd", probs, v.astype(cdt),
                              preferred_element_type=jnp.float32,
                              precision=matmul_precision(cdt))
            attn = attn.reshape(B, T, H_local)
        # row-sharded out-projection: partial [B, T, H] per shard -> psum;
        # the replicated bias is added AFTER the reduction (once)
        attn = jnp.einsum("btj,jh->bth", attn.astype(rdt).astype(cdt),
                          block["attn_out"]["w"].astype(cdt),
                          preferred_element_type=jnp.float32,
                          precision=matmul_precision(cdt))
        attn = psum_if_tp(attn) + block["attn_out"]["b"]
        # dropout applies AFTER the residual-dtype cast: the mask multiply
        # then reads/writes rdt-width tensors (half the traffic at bf16;
        # numerically identical up to one rounding)
        attn, rng = maybe_dropout(attn.astype(rdt), rng)
        x = x + attn.astype(rdt)
        # --- FFN sublayer ---
        y = _layer_norm(x, block["ln2"], out_dtype=rdt)
        if tp:
            y = _copy_to_tp(y, spec.model_axis)
        # gelu runs on the f32 matmul output BEFORE the residual-dtype cast:
        # residual_dtype='bfloat16' must not downgrade activation precision
        # below compute_dtype (ADVICE r3)
        h = jax.nn.gelu(_dense(y, block["ffn_in"], cdt)).astype(rdt)  # [B, T, F_local]
        y = jnp.einsum("btf,fh->bth", h.astype(cdt),
                       block["ffn_out"]["w"].astype(cdt),
                       preferred_element_type=jnp.float32,
                       precision=matmul_precision(cdt))
        y = psum_if_tp(y) + block["ffn_out"]["b"]
        y, rng = maybe_dropout(y.astype(rdt), rng)
        x = x + y.astype(rdt)
        return x, rng

    if spec.remat_blocks:
        # attn_bias is an explicit arg (not a closure) so the checkpoint
        # boundary saves exactly (x, rng, bias) per block and recomputes
        # everything else in the backward pass
        run_block = jax.checkpoint(run_block)

    rng = dropout_rng
    x = x.astype(rdt)
    for block in params["blocks"]:
        x, rng = run_block(x, rng, block, attn_bias)

    x = _layer_norm(x, params["ln_final"], out_dtype=jnp.float32)
    # Masked mean-pool; zero-length rows -> zero vector (empty-query guard,
    # ref: query_inferencer.py:65-69).
    denom = jnp.maximum(jnp.sum(valid, axis=-1, keepdims=True), 1.0)
    pooled = jnp.sum(x * valid[..., None], axis=1) / denom
    pooled = pooled * (lengths > 0).astype(jnp.float32)[:, None]
    if spec.normalize_output:
        norm = jnp.maximum(jnp.linalg.norm(pooled, axis=-1, keepdims=True), 1e-12)
        pooled = pooled / norm
    return pooled
