"""Native C++ tokenizer: parity vs the Python path (the oracle) and speed."""

import time

import numpy as np
import pytest

from twotowermlretrieval_tpu.tokenizer import Tokenizer

native = pytest.importorskip("twotowermlretrieval_tpu.native")
if not native.native_available():
    pytest.skip(f"native tokenizer unavailable: {native.native_error()}", allow_module_level=True)


@pytest.fixture(scope="module")
def tok():
    words = {f"word{i}": i for i in range(1000)}
    words.update({"the": 1000, "cat": 1001, ".": 1002, ",": 1003, "c_d": 1004, "42": 1005})
    return Tokenizer(words)


TEXTS = [
    "The CAT, sat! on word1 word999 unknownzzz.",
    "",
    "c_d 42 ... ,,, ;;; ???",
    "word1 " * 500,  # truncation
    "punctuation-only: !?.,;",
    "naïve café résumé",  # non-ASCII -> Python fallback rows
    "mixed ascii and ünïcode words",
    "word2\tword3\nword4\r\nword5",
]


def test_native_matches_python(tok):
    for max_len in (4, 16, 128):
        nat_tokens, nat_lengths = tok.encode_batch(TEXTS, max_len, native=True)
        py_tokens, py_lengths = tok.encode_batch(TEXTS, max_len, native=False)
        np.testing.assert_array_equal(nat_tokens, py_tokens)
        np.testing.assert_array_equal(nat_lengths, py_lengths)


def test_native_matches_python_random_ascii(tok):
    rng = np.random.default_rng(0)
    words = list(tok.word2idx)
    texts = [
        " ".join(rng.choice(words, size=rng.integers(0, 40)))
        for _ in range(200)
    ]
    nat = tok.encode_batch(texts, 32, native=True)
    py = tok.encode_batch(texts, 32, native=False)
    np.testing.assert_array_equal(nat[0], py[0])
    np.testing.assert_array_equal(nat[1], py[1])


def test_native_vocab_size(tok):
    vocab = tok._get_native_vocab()
    assert vocab is not None
    assert vocab.size() == tok.vocab_size()


def test_native_faster_than_python(tok):
    rng = np.random.default_rng(1)
    words = list(tok.word2idx)
    texts = [" ".join(rng.choice(words, size=60)) for _ in range(2000)]
    tok.encode_batch(texts[:10], 64)  # warm both paths

    def best_of(native):
        times = []
        for _ in range(3):  # min-of-3: robust to transient machine load
            t0 = time.time()
            tok.encode_batch(texts, 64, native=native)
            times.append(time.time() - t0)
        return min(times)

    t_nat, t_py = best_of(True), best_of(False)
    assert t_nat < t_py, f"native {t_nat:.3f}s not faster than python {t_py:.3f}s"
