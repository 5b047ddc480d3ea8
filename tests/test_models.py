"""Model numerics tests.

The key oracle: our masked-scan encoder must match torch's packed-sequence
RNN (the reference's exact compute path, ref: backend/model.py:48-75) when
weights are copied over — validating that masked scan == pack_padded_sequence
semantics for every cell type and for bidirectionality.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from twotowermlretrieval_tpu.models.losses import (
    combined_loss,
    in_batch_softmax_loss,
    triplet_loss_cosine,
)
from twotowermlretrieval_tpu.models.rnn import RNNSpec, init_rnn_encoder, rnn_encode
from twotowermlretrieval_tpu.models.two_tower import (
    TwoTowerSpec,
    encode_document,
    encode_query,
    init_two_tower,
    two_tower_forward,
)


def _spec(**kw):
    base = dict(
        vocab_size=50,
        embed_dim=8,
        hidden_dim=16,
        rnn_type="GRU",
        num_layers=1,
        dropout=0.0,
        bidirectional=False,
        normalize_output=False,
        compute_dtype="float32",
    )
    base.update(kw)
    return RNNSpec(**base)


def _batch(rng, B=4, T=10, vocab=50):
    tokens = rng.integers(1, vocab, size=(B, T)).astype(np.int32)
    lengths = rng.integers(1, T + 1, size=(B,)).astype(np.int32)
    for i, L in enumerate(lengths):
        tokens[i, L:] = 0
    return jnp.asarray(tokens), jnp.asarray(lengths)


# ---------------------------------------------------------------------------
# torch parity oracle
# ---------------------------------------------------------------------------


def _torch_encode(params, spec, tokens, lengths):
    """Run torch's packed-sequence RNN with weights copied from our params."""
    import torch
    import torch.nn as nn

    emb = nn.Embedding(spec.vocab_size, spec.embed_dim)
    emb.weight.data.copy_(torch.from_numpy(np.asarray(params["embedding"])))
    rnn_cls = getattr(nn, spec.rnn_type if spec.rnn_type != "RNN" else "RNN")
    rnn = rnn_cls(
        spec.embed_dim,
        spec.hidden_dim,
        num_layers=spec.num_layers,
        batch_first=True,
        bidirectional=spec.bidirectional,
    )
    dirs = ["", "_reverse"] if spec.bidirectional else [""]
    for li, layer in enumerate(params["layers"]):
        for d_name, suffix in zip(("fwd", "bwd"), dirs):
            p = layer[d_name]
            # ours: w_ih [I, G*H] (gate-major columns); torch: [G*H, I]
            getattr(rnn, f"weight_ih_l{li}{suffix}").data.copy_(
                torch.from_numpy(np.asarray(p["w_ih"]).T)
            )
            getattr(rnn, f"weight_hh_l{li}{suffix}").data.copy_(
                torch.from_numpy(np.asarray(p["w_hh"]).T)
            )
            getattr(rnn, f"bias_ih_l{li}{suffix}").data.copy_(
                torch.from_numpy(np.asarray(p["b_ih"]))
            )
            getattr(rnn, f"bias_hh_l{li}{suffix}").data.copy_(
                torch.from_numpy(np.asarray(p["b_hh"]))
            )

    x = emb(torch.from_numpy(np.asarray(tokens)).long())
    packed = nn.utils.rnn.pack_padded_sequence(
        x, torch.from_numpy(np.asarray(lengths)).long(), batch_first=True, enforce_sorted=False
    )
    with torch.no_grad():
        if spec.rnn_type == "LSTM":
            _, (h_n, _) = rnn(packed)
        else:
            _, h_n = rnn(packed)
    if spec.bidirectional:
        hidden = torch.cat([h_n[-2], h_n[-1]], dim=1)
        proj = params["projection"]
        w = torch.from_numpy(np.asarray(proj["w"]))
        b = torch.from_numpy(np.asarray(proj["b"]))
        hidden = hidden @ w + b
    else:
        hidden = h_n[-1]
    return hidden.numpy()


@pytest.mark.parametrize("rnn_type", ["GRU", "LSTM", "RNN"])
@pytest.mark.parametrize("bidirectional", [False, True])
def test_masked_scan_matches_torch_packed(rnn_type, bidirectional):
    spec = _spec(rnn_type=rnn_type, bidirectional=bidirectional, num_layers=2)
    params = init_rnn_encoder(jax.random.key(0), spec)
    tokens, lengths = _batch(np.random.default_rng(1))
    ours = np.asarray(rnn_encode(params, tokens, lengths, spec))
    theirs = _torch_encode(params, spec, tokens, lengths)
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# invariants
# ---------------------------------------------------------------------------


def test_padding_invariance():
    """Extra padding must not change the encoding (masked-update contract)."""
    spec = _spec(bidirectional=True, num_layers=2)
    params = init_rnn_encoder(jax.random.key(0), spec)
    tokens = jnp.asarray([[3, 7, 9, 0, 0, 0, 0, 0, 0, 0]], dtype=jnp.int32)
    lengths = jnp.asarray([3], dtype=jnp.int32)
    short = rnn_encode(params, tokens[:, :4], lengths, spec)
    long = rnn_encode(params, tokens, lengths, spec)
    np.testing.assert_allclose(np.asarray(short), np.asarray(long), rtol=1e-5, atol=1e-6)


def test_pad_id_zero_is_not_special():
    """Real token id 0 inside the valid length must affect the output —
    the reference's (x != 0) length inference bug must not exist here."""
    spec = _spec()
    params = init_rnn_encoder(jax.random.key(0), spec)
    with_zero = rnn_encode(
        params, jnp.asarray([[5, 0, 7]], jnp.int32), jnp.asarray([3], jnp.int32), spec
    )
    without_zero = rnn_encode(
        params, jnp.asarray([[5, 9, 7]], jnp.int32), jnp.asarray([3], jnp.int32), spec
    )
    assert np.abs(np.asarray(with_zero) - np.asarray(without_zero)).max() > 1e-6


@pytest.mark.parametrize("bidirectional", [False, True])
def test_zero_length_gives_zero_vector(bidirectional):
    # bidirectional is the hard case: the projection bias must not leak
    # through the all-zero hidden states
    spec = _spec(normalize_output=True, bidirectional=bidirectional)
    params = init_rnn_encoder(jax.random.key(0), spec)
    out = rnn_encode(
        params, jnp.zeros((2, 5), jnp.int32), jnp.asarray([0, 3], jnp.int32), spec
    )
    np.testing.assert_array_equal(np.asarray(out[0]), 0.0)
    assert np.linalg.norm(np.asarray(out[1])) > 0.9


def test_normalized_outputs_unit_norm():
    spec = _spec(normalize_output=True, bidirectional=True)
    params = init_rnn_encoder(jax.random.key(0), spec)
    tokens, lengths = _batch(np.random.default_rng(2))
    out = np.asarray(rnn_encode(params, tokens, lengths, spec))
    np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, rtol=1e-5)


def test_dropout_train_vs_eval():
    spec = _spec(num_layers=2, dropout=0.5)
    params = init_rnn_encoder(jax.random.key(0), spec)
    tokens, lengths = _batch(np.random.default_rng(3))
    eval_out = rnn_encode(params, tokens, lengths, spec, train=False)
    train_out = rnn_encode(
        params, tokens, lengths, spec, train=True, dropout_rng=jax.random.key(1)
    )
    assert np.abs(np.asarray(eval_out) - np.asarray(train_out)).max() > 1e-6
    # deterministic given the rng
    train_out2 = rnn_encode(
        params, tokens, lengths, spec, train=True, dropout_rng=jax.random.key(1)
    )
    np.testing.assert_array_equal(np.asarray(train_out), np.asarray(train_out2))
    with pytest.raises(ValueError):
        rnn_encode(params, tokens, lengths, spec, train=True)


def test_pretrained_embeddings_copied():
    spec = _spec()
    table = np.random.default_rng(0).normal(size=(50, 8)).astype(np.float32)
    params = init_rnn_encoder(jax.random.key(0), spec, pretrained_embeddings=table)
    np.testing.assert_array_equal(np.asarray(params["embedding"]), table)
    with pytest.raises(ValueError):
        init_rnn_encoder(jax.random.key(0), spec, pretrained_embeddings=table[:, :4])


def test_bfloat16_compute_close_to_f32():
    spec32 = _spec(bidirectional=True)
    spec16 = _spec(bidirectional=True, compute_dtype="bfloat16")
    params = init_rnn_encoder(jax.random.key(0), spec32)
    tokens, lengths = _batch(np.random.default_rng(4))
    out32 = np.asarray(rnn_encode(params, tokens, lengths, spec32))
    out16 = np.asarray(rnn_encode(params, tokens, lengths, spec16))
    assert np.abs(out32 - out16).max() < 0.05


# ---------------------------------------------------------------------------
# two-tower
# ---------------------------------------------------------------------------


def test_two_tower_independent_towers():
    spec = TwoTowerSpec(tower_type="rnn", rnn=_spec())
    params = init_two_tower(jax.random.key(0), spec)
    tokens, lengths = _batch(np.random.default_rng(5))
    q = np.asarray(encode_query(params, tokens, lengths, spec))
    d = np.asarray(encode_document(params, tokens, lengths, spec))
    assert np.abs(q - d).max() > 1e-4  # independently initialized (ref model.py:96-97)


def test_two_tower_forward_pair():
    spec = TwoTowerSpec(tower_type="rnn", rnn=_spec())
    params = init_two_tower(jax.random.key(0), spec)
    tokens, lengths = _batch(np.random.default_rng(6))
    q, d = two_tower_forward(params, tokens, lengths, tokens, lengths, spec)
    assert q.shape == d.shape == (4, 16)


def test_two_tower_jit_compiles_once():
    spec = TwoTowerSpec(tower_type="rnn", rnn=_spec())
    params = init_two_tower(jax.random.key(0), spec)
    fn = jax.jit(encode_query, static_argnames=("spec",))
    tokens, lengths = _batch(np.random.default_rng(7))
    out1 = fn(params, tokens, lengths, spec)
    out2 = fn(params, tokens + 1, lengths, spec)
    assert out1.shape == out2.shape


# ---------------------------------------------------------------------------
# losses
# ---------------------------------------------------------------------------


def test_triplet_loss_matches_torch():
    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(8)
    q, p, n = (rng.normal(size=(6, 16)).astype(np.float32) for _ in range(3))
    ours = float(triplet_loss_cosine((jnp.asarray(q), jnp.asarray(p), jnp.asarray(n)), 0.5))
    tq, tp, tn = map(torch.from_numpy, (q, p, n))
    theirs = float(
        torch.clamp(
            F.cosine_similarity(tq, tn) - F.cosine_similarity(tq, tp) + 0.5, min=0.0
        ).mean()
    )
    assert abs(ours - theirs) < 1e-5


def test_triplet_loss_hand_computed():
    # orthogonal pos, identical neg -> loss = clamp(1 - 0 + margin) = 1 + m
    q = jnp.asarray([[1.0, 0.0]])
    pos = jnp.asarray([[0.0, 1.0]])
    neg = jnp.asarray([[1.0, 0.0]])
    assert float(triplet_loss_cosine((q, pos, neg), margin=0.2)) == pytest.approx(1.2)
    # perfect retrieval -> clamp(-1 -1 + m) = 0
    assert float(triplet_loss_cosine((q, q, -q), margin=0.2)) == pytest.approx(0.0)


def test_triplet_loss_weighted_matches_ragged():
    rng = np.random.default_rng(9)
    q, p, n = (jnp.asarray(rng.normal(size=(8, 4)).astype(np.float32)) for _ in range(3))
    w = jnp.asarray([1, 1, 1, 1, 1, 0, 0, 0], jnp.float32)
    full = triplet_loss_cosine((q[:5], p[:5], n[:5]), 0.5)
    weighted = triplet_loss_cosine((q, p, n), 0.5, weights=w)
    assert abs(float(full) - float(weighted)) < 1e-6


def test_in_batch_loss_weighted_matches_ragged():
    """Repeat-padded rows must not change the in-batch loss: their NLL is
    weighted out AND their doc columns (duplicates of a real positive) are
    masked out of every softmax (VERDICT r1 weak #2)."""
    rng = np.random.default_rng(11)
    q5 = rng.normal(size=(5, 4)).astype(np.float32)
    d5 = rng.normal(size=(5, 4)).astype(np.float32)
    q5 /= np.linalg.norm(q5, axis=1, keepdims=True)
    d5 /= np.linalg.norm(d5, axis=1, keepdims=True)
    # pad 5 -> 8 by repeating row 0 (data/batching.py repeat-pad scheme)
    pad_idx = np.array([0, 1, 2, 3, 4, 0, 0, 0])
    q8, d8 = jnp.asarray(q5[pad_idx]), jnp.asarray(d5[pad_idx])
    w = jnp.asarray([1, 1, 1, 1, 1, 0, 0, 0], jnp.float32)
    ragged = in_batch_softmax_loss(jnp.asarray(q5), jnp.asarray(d5), 0.05)
    padded = in_batch_softmax_loss(q8, d8, 0.05, weights=w)
    assert abs(float(ragged) - float(padded)) < 1e-6


def test_in_batch_loss_prefers_diagonal():
    q = jnp.eye(4, dtype=jnp.float32)
    good = float(in_batch_softmax_loss(q, q, temperature=0.05))
    perm = q[jnp.asarray([1, 0, 3, 2])]
    bad = float(in_batch_softmax_loss(q, perm, temperature=0.05))
    assert good < bad


def test_combined_loss_types():
    rng = np.random.default_rng(10)
    q, p, n = (jnp.asarray(rng.normal(size=(4, 8)).astype(np.float32)) for _ in range(3))
    t = combined_loss(q, p, n, "triplet", 0.5, 0.05)
    ib = combined_loss(q, p, n, "in_batch", 0.5, 0.05)
    both = combined_loss(q, p, n, "triplet+in_batch", 0.5, 0.05)
    assert abs(float(both) - float(t) - float(ib)) < 1e-5


# ---------------------------------------------------------------------------
# transformer tower
# ---------------------------------------------------------------------------


def test_transformer_tower():
    from twotowermlretrieval_tpu.models.transformer import (
        TransformerSpec,
        init_transformer_encoder,
        transformer_encode,
    )

    spec = TransformerSpec(
        vocab_size=50, embed_dim=8, hidden_dim=16, num_layers=2, num_heads=2,
        ffn_dim=32, compute_dtype="float32", max_len=16,
    )
    params = init_transformer_encoder(jax.random.key(0), spec)
    tokens, lengths = _batch(np.random.default_rng(11))
    out = np.asarray(transformer_encode(params, tokens, lengths, spec))
    assert out.shape == (4, 16)
    np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, rtol=1e-5)

    # padding invariance
    t1 = jnp.asarray([[3, 7, 9, 0, 0, 0, 0, 0, 0, 0]], jnp.int32)
    l1 = jnp.asarray([3], jnp.int32)
    a = transformer_encode(params, t1[:, :4], l1, spec)
    b = transformer_encode(params, t1, l1, spec)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)

    # zero length -> zero vector
    z = transformer_encode(params, jnp.zeros((1, 10), jnp.int32), jnp.asarray([0], jnp.int32), spec)
    np.testing.assert_array_equal(np.asarray(z), 0.0)


# ---------------------------------------------------------------------------
# custom VJP of the direction-stacked scan
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("n_dir", [1, 2])
@pytest.mark.parametrize("rnn_type", ["GRU", "LSTM", "RNN"])
def test_scan_custom_vjp_matches_autodiff(rnn_type, n_dir):
    """The hand-written backward (weight-grad hoisting, gate recompute) must
    agree with plain autodiff through the forward scan."""
    from twotowermlretrieval_tpu.models.rnn import _scan_layer, _scan_layer_fwd_impl

    G = {"GRU": 3, "LSTM": 4, "RNN": 1}[rnn_type]
    T, B, H = 9, 4, 8
    D = n_dir
    ks = jax.random.split(jax.random.key(0), 6)
    xps = tuple(jax.random.normal(k, (T, B, G * H)) for k in ks[:D])
    lengths = jnp.array([9, 5, 1, 0])  # includes full, partial, 1, and empty rows
    t_idx = jax.lax.broadcasted_iota(jnp.int32, (T, B), 0)
    mask2 = (t_idx < lengths[None, :]).astype(jnp.float32)
    w_hh = jax.random.normal(ks[2], (D, H, G * H)) * 0.3
    b_hh = jax.random.normal(ks[3], (D, G * H)) * 0.1
    cts = tuple(jax.random.normal(k, (T, B, H)) for k in jax.random.split(ks[4], D))
    ct_fin = jax.random.normal(ks[5], (D, B, H))

    def loss_custom(xps, w, b):
        outs, fin = _scan_layer(rnn_type, "float32", xps, mask2, w, b)
        return sum(jnp.sum(o * c) for o, c in zip(outs, cts)) + jnp.sum(fin * ct_fin)

    def loss_autodiff(xps, w, b):
        outs, _, fin = _scan_layer_fwd_impl(rnn_type, "float32", xps, mask2, w, b)
        return sum(jnp.sum(o * c) for o, c in zip(outs, cts)) + jnp.sum(fin * ct_fin)

    g1 = jax.grad(loss_custom, argnums=(0, 1, 2))(xps, w_hh, b_hh)
    g2 = jax.grad(loss_autodiff, argnums=(0, 1, 2))(xps, w_hh, b_hh)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-6)


@pytest.mark.parametrize("num_layers", [1, 3, 6])
def test_transformer_init_any_depth(num_layers):
    """Regression: init crashed with StopIteration at >= 3 layers (PRNG key
    over-consumption)."""
    from twotowermlretrieval_tpu.models.transformer import (
        TransformerSpec,
        init_transformer_encoder,
        transformer_encode,
    )

    spec = TransformerSpec(
        vocab_size=50, embed_dim=16, hidden_dim=16, num_heads=2,
        num_layers=num_layers, max_len=10, compute_dtype="float32",
    )
    params = init_transformer_encoder(jax.random.key(0), spec)
    assert len(params["blocks"]) == num_layers
    tokens, lengths = _batch(np.random.default_rng(0))
    out = transformer_encode(params, tokens, lengths, spec)
    assert out.shape == (4, 16) and bool(jnp.all(jnp.isfinite(out)))


def test_transformer_legacy_qkv_layout_still_loads():
    """Round-1 checkpoints store qkv as [H, 3H]/[3H]; the encoder migrates
    them on the fly and produces identical embeddings (r2 review)."""
    from twotowermlretrieval_tpu.models.transformer import (
        TransformerSpec,
        init_transformer_encoder,
        transformer_encode,
    )

    spec = TransformerSpec(
        vocab_size=50, embed_dim=8, hidden_dim=16, num_layers=2, num_heads=2,
        ffn_dim=32, compute_dtype="float32", max_len=16,
    )
    params = init_transformer_encoder(jax.random.key(3), spec)
    legacy = jax.tree.map(lambda x: x, params)  # shallow copy of the tree
    legacy["blocks"] = tuple(
        {**b, "qkv": {"w": b["qkv"]["w"].reshape(16, 48), "b": b["qkv"]["b"].reshape(48)}}
        for b in params["blocks"]
    )
    tokens, lengths = _batch(np.random.default_rng(16))
    new = transformer_encode(params, tokens, lengths, spec)
    old = transformer_encode(legacy, tokens, lengths, spec)
    np.testing.assert_array_equal(np.asarray(new), np.asarray(old))


def test_transformer_remat_matches_no_remat():
    """remat_blocks must be a pure scheduling change: encode outputs and
    gradients — including the dropout rng threading through the
    jax.checkpoint boundary — are identical with it on and off (ADVICE r3)."""
    import dataclasses

    from twotowermlretrieval_tpu.models.transformer import (
        TransformerSpec,
        init_transformer_encoder,
        transformer_encode,
    )

    spec = TransformerSpec(
        vocab_size=50, embed_dim=8, hidden_dim=16, num_layers=2, num_heads=2,
        ffn_dim=32, compute_dtype="float32", max_len=16, dropout=0.3,
    )
    spec_remat = dataclasses.replace(spec, remat_blocks=True)
    params = init_transformer_encoder(jax.random.key(0), spec)
    tokens, lengths = _batch(np.random.default_rng(7))
    drop_key = jax.random.key(5)
    ct = jnp.cos(jnp.arange(4.0 * 16).reshape(4, 16))

    def loss(p, s):
        out = transformer_encode(
            p, tokens, lengths, s, train=True, dropout_rng=drop_key
        )
        return jnp.sum(out * ct)

    l0, g0 = jax.value_and_grad(loss)(params, spec)
    l1, g1 = jax.value_and_grad(loss)(params, spec_remat)
    assert float(l0) == pytest.approx(float(l1), rel=1e-6)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
        )


def test_transformer_bf16_residual_tracks_f32():
    """residual_dtype='bfloat16' halves residual-stream traffic but must
    stay a numerics knob, not a correctness one: unit-norm outputs within
    bf16 tolerance of the f32-residual run, and gelu still computed at
    compute precision (not downgraded by the residual cast — ADVICE r3)."""
    import dataclasses

    from twotowermlretrieval_tpu.models.transformer import (
        TransformerSpec,
        init_transformer_encoder,
        transformer_encode,
    )

    spec = TransformerSpec(
        vocab_size=50, embed_dim=8, hidden_dim=16, num_layers=2, num_heads=2,
        ffn_dim=32, compute_dtype="float32", max_len=16,
    )
    spec_bf = dataclasses.replace(spec, residual_dtype="bfloat16")
    params = init_transformer_encoder(jax.random.key(1), spec)
    tokens, lengths = _batch(np.random.default_rng(9))
    ref = np.asarray(transformer_encode(params, tokens, lengths, spec))
    out = np.asarray(transformer_encode(params, tokens, lengths, spec_bf))
    assert out.dtype == np.float32  # final LN casts the stream back up
    valid = lengths[:, None] > 0
    np.testing.assert_allclose(
        np.linalg.norm(out, axis=1), np.where(lengths > 0, 1.0, 0.0), atol=1e-5
    )
    # bf16 has ~3 significant decimal digits; a 2-block stream stays well
    # inside 3e-2 of the f32 run unless precision is being dropped twice
    np.testing.assert_allclose(out, ref, atol=3e-2)
    assert np.abs(out - ref)[np.broadcast_to(valid, out.shape)].max() > 0  # it IS a different dtype path


# ---------------------------------------------------------------------------
# fused attention kernel (ops/attention.py)
# ---------------------------------------------------------------------------


def test_fused_attention_matches_xla_fwd_and_grads():
    """The VMEM-resident attention kernel must match the XLA einsum path
    bit-for-tolerance in forward AND all three gradients, including fully
    masked (length 0) rows."""
    from twotowermlretrieval_tpu.ops.attention import fused_attention

    rng = np.random.default_rng(3)
    R, T, hd = 8, 16, 8
    q, k, v = (
        jnp.asarray(rng.standard_normal((R, T, hd)).astype(np.float32))
        for _ in range(3)
    )
    lens = np.array([16, 9, 1, 0, 5, 16, 2, 7])
    bias = jnp.asarray(
        np.where(np.arange(T)[None, :] < lens[:, None], 0.0, -1e9).astype(np.float32)
    )
    scale = float(1.0 / np.sqrt(hd))

    def ref(q, k, v):
        s = jnp.einsum("rqd,rkd->rqk", q, k) * scale + bias[:, None, :]
        return jnp.einsum("rqk,rkd->rqd", jax.nn.softmax(s, axis=-1), v)

    def fused(q, k, v):
        return fused_attention(q, k, v, bias, scale, "float32", True)

    np.testing.assert_allclose(
        np.asarray(fused(q, k, v)), np.asarray(ref(q, k, v)),
        rtol=1e-5, atol=1e-6,
    )
    ct = jnp.asarray(rng.standard_normal((R, T, hd)).astype(np.float32))
    g1 = jax.grad(lambda *a: jnp.sum(fused(*a) * ct), argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(lambda *a: jnp.sum(ref(*a) * ct), argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_transformer_fused_attention_matches_xla_path():
    """transformer_encode with spec.fused_attention=True equals the XLA
    einsum path — outputs and grads (kernel run in interpret mode on
    CPU via a temporarily patched VJP)."""
    import dataclasses

    from twotowermlretrieval_tpu.models.transformer import (
        TransformerSpec,
        init_transformer_encoder,
        transformer_encode,
    )
    from twotowermlretrieval_tpu.ops import attention as attn_mod

    spec = TransformerSpec(
        vocab_size=50, embed_dim=8, hidden_dim=16, num_layers=2, num_heads=2,
        ffn_dim=32, compute_dtype="float32", max_len=16,
    )
    spec_fused = dataclasses.replace(spec, fused_attention=True)
    params = init_transformer_encoder(jax.random.key(4), spec)
    tokens, lengths = _batch(np.random.default_rng(21))
    ct = jnp.asarray(
        np.random.default_rng(22).standard_normal((4, 16)).astype(np.float32)
    )

    # CPU runs the kernel in interpret mode
    orig_fwd = attn_mod._fused_attention_fwd
    orig_bwd = attn_mod._fused_attention_bwd
    attn_mod.fused_attention.defvjp(
        lambda q, k, v, b, s, c, i: orig_fwd(q, k, v, b, s, c, True),
        lambda s, c, i, res, do: orig_bwd(s, c, True, res, do),
    )
    try:
        def loss(p, sp):
            return jnp.sum(transformer_encode(p, tokens, lengths, sp) * ct)

        l_ref, g_ref = jax.value_and_grad(loss)(params, spec)
        l_fused, g_fused = jax.value_and_grad(loss)(params, spec_fused)
    finally:
        attn_mod.fused_attention.defvjp(orig_fwd, orig_bwd)
    assert float(l_ref) == pytest.approx(float(l_fused), rel=1e-5)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_fused)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)
