"""Tokenizer unit tests (protocol anchors: ref backend/tokenizer.py)."""

import numpy as np
import pytest

from twotowermlretrieval_tpu.tokenizer import (
    PAD_ID,
    Tokenizer,
    lengths_to_mask,
    tokenize_text,
)


@pytest.fixture
def tok():
    return Tokenizer({"the": 0, "cat": 1, "sat": 2, ".": 3, "mat": 4})


def test_regex_semantics():
    # lowercase + \w+|[.,!?;] exactly as ref tokenizer.py:41
    assert tokenize_text("The CAT, sat!") == ["the", "cat", ",", "sat", "!"]
    assert tokenize_text("it's a-b c_d 42") == ["it", "s", "a", "b", "c_d", "42"]
    assert tokenize_text("") == []


def test_unk_appended_at_end(tok):
    # <UNK> gets the next free index (ref tokenizer.py:20-26)
    assert tok.unk_token_id == 5
    assert tok.vocab_size() == 6


def test_encode_oov_maps_to_unk(tok):
    assert tok.encode("the cat flew") == [0, 1, tok.unk_token_id]


def test_decode_roundtrip(tok):
    ids = tok.encode("the cat sat .")
    assert tok.decode(ids) == "the cat sat ."
    assert tok.decode([99]) == "<UNK>"


def test_word_lookup_api(tok):
    assert tok.get_word_index("cat") == 1
    assert tok.get_word_index("dog") == -1
    assert tok.contains_word("mat") and not tok.contains_word("dog")
    assert tok.get_index_word(2) == "sat"


def test_encode_batch_static_shape_and_lengths(tok):
    tokens, lengths = tok.encode_batch(["the cat", "", "the cat sat . mat the cat"], max_len=4)
    assert tokens.shape == (3, 4) and tokens.dtype == np.int32
    assert lengths.tolist() == [2, 0, 4]  # 3rd is truncated to max_len
    assert tokens[0].tolist() == [0, 1, PAD_ID, PAD_ID]
    assert tokens[1].tolist() == [PAD_ID] * 4
    assert tokens[2].tolist() == [0, 1, 2, 3]


def test_lengths_to_mask():
    mask = lengths_to_mask(np.array([0, 2]), 3)
    assert mask.tolist() == [[False, False, False], [True, True, False]]


def test_pickle_roundtrip(tok, tmp_path):
    tok.save(tmp_path / "word_to_idx.pkl")
    tok2 = Tokenizer.from_pickle(tmp_path / "word_to_idx.pkl")
    assert tok2.word2idx == tok.word2idx
    assert tok2.encode("the cat zzz") == tok.encode("the cat zzz")


def test_from_corpus_frequency_order():
    tok = Tokenizer.from_corpus(["b b b a a c", "a b"], max_vocab=2)
    # b (4) then a (3); c dropped; UNK appended
    assert tok.get_word_index("b") == 0
    assert tok.get_word_index("a") == 1
    assert tok.encode("c") == [tok.unk_token_id]
