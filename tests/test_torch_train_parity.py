"""End-to-end training parity vs a torch twin of the reference.

The strongest behavioral-parity evidence available without MS MARCO access:
build the reference's exact training setup (frozen-embedding bidirectional
GRU towers + cosine triplet loss + global-norm clip + Adam,
ref: backend/main.py:222-259, backend/model.py) in torch, copy OUR initial
parameters into it, feed both the same fixed batches in f32, and require
the per-step loss trajectories to track to ~1e-4 for 10 steps.

This catches anything the op-level parity tests can't: optimizer math
(optax.adam vs torch.optim.Adam), clip ordering, loss reduction semantics,
and gradient flow through the full two-tower graph.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from twotowermlretrieval_tpu.config import Config
from twotowermlretrieval_tpu.data.batching import Batch
from twotowermlretrieval_tpu.models.two_tower import TwoTowerSpec, init_two_tower
from twotowermlretrieval_tpu.train.train_step import create_train_state, make_train_step

VOCAB, EMBED, HIDDEN, B, TQ, TD = 80, 12, 16, 8, 6, 10
LR, MARGIN, STEPS = 1e-3, 0.5, 10


class _TorchTower(nn.Module):
    """The reference encoder (ref: backend/model.py:8-75), weights injected."""

    def __init__(self, params, table, rnn_type="GRU"):
        super().__init__()
        self.rnn_type = rnn_type
        self.embedding = nn.Embedding(VOCAB, EMBED)
        self.embedding.weight.data.copy_(torch.from_numpy(table))
        self.embedding.weight.requires_grad = False
        rnn_cls = getattr(nn, rnn_type)
        self.rnn = rnn_cls(EMBED, HIDDEN, num_layers=1, batch_first=True, bidirectional=True)
        self.projection = nn.Linear(2 * HIDDEN, HIDDEN)
        layer = params["layers"][0]
        for d_name, suffix in zip(("fwd", "bwd"), ("", "_reverse")):
            p = layer[d_name]
            getattr(self.rnn, f"weight_ih_l0{suffix}").data.copy_(
                torch.from_numpy(np.asarray(p["w_ih"]).T))
            getattr(self.rnn, f"weight_hh_l0{suffix}").data.copy_(
                torch.from_numpy(np.asarray(p["w_hh"]).T))
            getattr(self.rnn, f"bias_ih_l0{suffix}").data.copy_(
                torch.from_numpy(np.asarray(p["b_ih"])))
            getattr(self.rnn, f"bias_hh_l0{suffix}").data.copy_(
                torch.from_numpy(np.asarray(p["b_hh"])))
        self.projection.weight.data.copy_(torch.from_numpy(np.asarray(params["projection"]["w"]).T))
        self.projection.bias.data.copy_(torch.from_numpy(np.asarray(params["projection"]["b"])))

    def forward(self, tokens, lengths):
        packed = nn.utils.rnn.pack_padded_sequence(
            self.embedding(tokens), lengths, batch_first=True, enforce_sorted=False
        )
        if self.rnn_type == "LSTM":
            _, (h_n, _) = self.rnn(packed)
        else:
            _, h_n = self.rnn(packed)
        hidden = self.projection(torch.cat([h_n[-2], h_n[-1]], dim=1))
        return F.normalize(hidden, p=2, dim=1)


def _batches(rng, n):
    out = []
    for _ in range(n):
        def tok(L):
            lengths = rng.integers(1, L + 1, (B,)).astype(np.int32)
            t = rng.integers(1, VOCAB, (B, L)).astype(np.int32)
            for i, l in enumerate(lengths):
                t[i, l:] = 0
            return t, lengths
        q, ql = tok(TQ)
        p, pl = tok(TD)
        ng, nl = tok(TD)
        out.append((q, ql, p, pl, ng, nl))
    return out


@pytest.mark.parametrize("rnn_type", ["GRU", "LSTM"])
def test_ten_step_loss_trajectory_matches_torch(rnn_type):
    config = Config(
        vocab_size=VOCAB, embed_dim=EMBED, hidden_dim=HIDDEN, rnn_type=rnn_type,
        num_layers=1, bidirectional=True, dropout=0.0, batch_size=B,
        lr=LR, margin=MARGIN, loss_type="triplet", normalize_output=True,
        max_query_len=TQ, max_doc_len=TD,
        compute_dtype="float32", freeze_embeddings=True,
    )
    rng = np.random.default_rng(0)
    table = (rng.standard_normal((VOCAB, EMBED)) * 0.3).astype(np.float32)
    spec = TwoTowerSpec.from_config(config)
    params = init_two_tower(jax.random.key(0), spec, pretrained_embeddings=table)
    state = create_train_state(jax.random.key(1), params, config)
    step_fn = jax.jit(make_train_step(spec, config))

    torch.manual_seed(0)
    q_tower = _TorchTower(params["query"], table, rnn_type)
    d_tower = _TorchTower(params["doc"], table, rnn_type)
    t_params = [p for t in (q_tower, d_tower) for p in t.parameters() if p.requires_grad]
    opt = torch.optim.Adam(t_params, lr=LR)

    ours, theirs = [], []
    for q, ql, p, pl, ng, nl in _batches(rng, STEPS):
        batch = Batch(
            jnp.asarray(q), jnp.asarray(ql), jnp.asarray(p), jnp.asarray(pl),
            jnp.asarray(ng), jnp.asarray(nl), jnp.ones((B,), jnp.float32),
        )
        state, metrics = step_fn(state, batch)
        ours.append(float(metrics["loss"]))

        opt.zero_grad()
        q_emb = q_tower(torch.from_numpy(q).long(), torch.from_numpy(ql).long())
        p_emb = d_tower(torch.from_numpy(p).long(), torch.from_numpy(pl).long())
        n_emb = d_tower(torch.from_numpy(ng).long(), torch.from_numpy(nl).long())
        loss = torch.clamp(
            F.cosine_similarity(q_emb, n_emb) - F.cosine_similarity(q_emb, p_emb) + MARGIN,
            min=0.0,
        ).mean()
        loss.backward()
        torch.nn.utils.clip_grad_norm_(t_params, max_norm=config.grad_clip_norm)
        opt.step()
        theirs.append(float(loss))

    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=2e-4)
