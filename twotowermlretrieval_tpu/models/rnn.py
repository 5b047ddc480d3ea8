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
- **Fused input projections.** Per layer, the input contribution to all
  gates for *all timesteps* is one large ``[B*T, I] @ [I, G*H]`` matmul on
  the MXU, hoisted out of the scan. The scan body only performs the
  unavoidable recurrent ``[B, H] @ [H, G*H]`` matmul.
- **Masked reverse = backward direction.** The backward pass scans the
  time-reversed sequence; masked updates keep ``h`` at its initial zeros
  through the (now leading) padding, so the first real update happens at the
  true last token — matching packed bidirectional semantics.
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
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from twotowermlretrieval_tpu.utils.dtypes import matmul_precision

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
    """One recurrent step. xp_t: [B, G*H] precomputed input projection
    (+b_ih); h, c: [B, H] f32 carries. Returns (h_new, c_new)."""
    hp = (
        jnp.dot(h.astype(cdt), w_hh.astype(cdt), preferred_element_type=jnp.float32,
                precision=matmul_precision(cdt))
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


def _scan_direction(
    rnn_type: str,
    x_proj: jax.Array,  # [T, B, G*H] f32 — input projections (+ b_ih)
    mask: jax.Array,  # [T, B, 1] f32
    w_hh: jax.Array,
    b_hh: jax.Array,
    compute_dtype,
):
    """Scan one direction; returns (outputs [T, B, H], final hidden [B, H])."""
    B = x_proj.shape[1]
    H = w_hh.shape[0]
    h0 = jnp.zeros((B, H), jnp.float32)
    c0 = jnp.zeros((B, H), jnp.float32) if rnn_type == "LSTM" else h0

    def step(carry, inputs):
        h, c = carry
        xp_t, m_t = inputs
        h_new, c_new = _cell_step(rnn_type, xp_t, h, c, w_hh, b_hh, compute_dtype)
        # Masked update: padding steps are identity (packed-sequence semantics)
        h = m_t * h_new + (1.0 - m_t) * h
        c = m_t * c_new + (1.0 - m_t) * c
        return (h, c), h

    # unroll reduces per-iteration loop overhead on TPU; the recurrent
    # matmul stays the serial bottleneck
    (h_final, _), outputs = jax.lax.scan(step, (h0, c0), (x_proj, mask), unroll=4)
    return outputs, h_final


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
    # [T, B, 1] time-major mask from lengths
    t_idx = jax.lax.broadcasted_iota(jnp.int32, (T, B), 0)
    mask = (t_idx < lengths[None, :]).astype(jnp.float32)[..., None]

    directions = ("fwd", "bwd") if spec.bidirectional else ("fwd",)
    use_dropout = train and spec.dropout > 0.0 and spec.num_layers > 1
    if use_dropout and dropout_rng is None:
        raise ValueError("dropout_rng required when train=True and dropout>0")

    layer_in = jnp.swapaxes(x, 0, 1)  # [T, B, E]
    finals = {}
    for li, layer in enumerate(params["layers"]):
        outs = []
        for d in directions:
            p = layer[d]
            seq = layer_in if d == "fwd" else jnp.flip(layer_in, axis=0)
            msk = mask if d == "fwd" else jnp.flip(mask, axis=0)
            # Fused input projection: one [T*B, I] @ [I, G*H] MXU matmul.
            x_proj = (
                jnp.dot(seq.astype(cdt), p["w_ih"].astype(cdt),
                        preferred_element_type=jnp.float32,
                        precision=matmul_precision(cdt))
                + p["b_ih"]
            )
            out, h_final = _scan_direction(spec.rnn_type, x_proj, msk, p["w_hh"], p["b_hh"], cdt)
            if d == "bwd":
                out = jnp.flip(out, axis=0)  # re-align time for the next layer
            outs.append(out)
            finals[d] = h_final
        layer_in = jnp.concatenate(outs, axis=-1) if len(outs) > 1 else outs[0]
        # Inter-layer dropout, as torch: on every layer's output except the
        # last, only when num_layers > 1 (ref: model.py:30-37).
        if use_dropout and li < spec.num_layers - 1:
            dropout_rng, sub = jax.random.split(dropout_rng)
            keep = 1.0 - spec.dropout
            layer_in = layer_in * jax.random.bernoulli(sub, keep, layer_in.shape) / keep

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
