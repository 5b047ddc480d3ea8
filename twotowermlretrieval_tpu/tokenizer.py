"""Word-level tokenizer over a pretrained (GloVe) vocabulary.

Semantics match the reference tokenizer exactly (ref: backend/tokenizer.py):
lowercase, regex ``\\w+|[.,!?;]`` (tokenizer.py:41), dict lookup with
OOV -> ``<UNK>``, where ``<UNK>`` is appended at the end of the vocab if
missing (tokenizer.py:20-26). ``decode``/``vocab_size``/``get_word_index``/
``contains_word`` are preserved (tokenizer.py:45-72).

TPU-first departures from the reference:

- **Explicit padding.** The reference implicitly uses token id 0 as padding
  (``padding_idx=0`` model.py:24; lengths via ``(x != 0)`` model.py:52) even
  though id 0 is a real GloVe word — a latent correctness bug. Here batches
  carry an explicit *length/mask channel* produced by :meth:`encode_batch`;
  the pad id only fills dead slots and is never used to infer lengths.
- **Static shapes.** ``encode_batch`` pads/truncates to a caller-supplied
  ``max_len`` so every batch has the same jit-stable shape (XLA traces once).
"""

from __future__ import annotations

import pickle
import re
from pathlib import Path
from typing import Dict, Iterable, List, Sequence, Tuple

import numpy as np

_TOKEN_RE = re.compile(r"\w+|[.,!?;]")

UNK_TOKEN = "<UNK>"
PAD_ID = 0  # fills dead slots only; masks carry the truth


def tokenize_text(text: str) -> List[str]:
    """Lowercase + regex split, identical to ref tokenizer.py:41."""
    return _TOKEN_RE.findall(str(text).lower())


class Tokenizer:
    """Vocabulary-backed word tokenizer (ref: backend/tokenizer.py:6-72)."""

    def __init__(self, word_to_idx: Dict[str, int]):
        self.word2idx = dict(word_to_idx)
        self.unk_token = UNK_TOKEN
        if self.unk_token not in self.word2idx:
            self.word2idx[self.unk_token] = len(self.word2idx)
        self.unk_token_id = self.word2idx[self.unk_token]
        self.idx2word = {idx: word for word, idx in self.word2idx.items()}

    # --- constructors ---------------------------------------------------
    @classmethod
    def from_pickle(cls, word_to_idx_path: str | Path) -> "Tokenizer":
        """Load the reference's pickled word->index map (tokenizer.py:16-17)."""
        with open(word_to_idx_path, "rb") as f:
            return cls(pickle.load(f))

    @classmethod
    def from_corpus(cls, texts: Iterable[str], max_vocab: int | None = None) -> "Tokenizer":
        """Build a vocab from raw text (frequency-ordered). Not in the
        reference (it only consumes a prebuilt GloVe vocab) — used for
        self-contained tests and synthetic runs."""
        from collections import Counter

        counts: Counter = Counter()
        for t in texts:
            counts.update(tokenize_text(t))
        words = [w for w, _ in counts.most_common(max_vocab)]
        return cls({w: i for i, w in enumerate(words)})

    def save(self, path: str | Path) -> None:
        """Persist as the reference's pickle format (artifact contract,
        ref: backend/main.py:109)."""
        with open(path, "wb") as f:
            pickle.dump(self.word2idx, f)

    # --- reference API ----------------------------------------------------
    def encode(self, sentence: str) -> List[int]:
        """Token ids with OOV -> UNK (ref: tokenizer.py:30-43)."""
        return [self.word2idx.get(w, self.unk_token_id) for w in tokenize_text(sentence)]

    def decode(self, token_ids: Sequence[int]) -> str:
        """Ids back to space-joined words (ref: tokenizer.py:45-56)."""
        return " ".join(self.idx2word.get(int(i), self.unk_token) for i in token_ids)

    def vocab_size(self) -> int:
        return len(self.word2idx)

    def get_word_index(self, word: str) -> int:
        return self.word2idx.get(word, -1)

    def get_index_word(self, index: int) -> str:
        return self.idx2word.get(int(index), self.unk_token)

    def contains_word(self, word: str) -> bool:
        return word in self.word2idx

    # --- TPU batch API ------------------------------------------------------
    def _get_native_vocab(self):
        """Lazily build the C++ vocabulary (None if the toolchain/library is
        unavailable — the Python path is always correct)."""
        if not hasattr(self, "_native_vocab"):
            self._native_vocab = None
            try:
                from twotowermlretrieval_tpu.native import native_available
                from twotowermlretrieval_tpu.native.batch_tokenizer import NativeVocab

                if native_available():
                    self._native_vocab = NativeVocab(self.word2idx, self.unk_token_id)
            except Exception:  # noqa: BLE001 — native path is best-effort
                self._native_vocab = None
        return self._native_vocab

    def encode_batch(
        self,
        texts: Sequence[str],
        max_len: int,
        pad_id: int = PAD_ID,
        native: bool = True,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Encode to a static-shape ``[B, max_len]`` int32 array + lengths.

        Replaces the reference's dynamic per-batch ``pad_sequence`` collation
        (ref: backend/main.py:50-56) with fixed-width padding so the jitted
        towers compile once. Sequences longer than ``max_len`` are truncated
        (the reference never truncates — a pathological passage sets the
        batch width and forces a recompile-equivalent; we bound it).

        Returns:
            tokens: int32 [B, max_len]
            lengths: int32 [B] true (pre-padding, post-truncation) lengths.
                     Empty texts get length 0; downstream encoders return a
                     zero vector for them (matching the zero-vector guard in
                     ref: query_inferencer.py:65-69).
        """
        if native:
            vocab = self._get_native_vocab()
            if vocab is not None:
                tokens, lengths, ok = vocab.encode_batch(texts, max_len, pad_id)
                if not ok.all():  # non-ASCII rows: exact unicode semantics
                    for row in np.nonzero(ok == 0)[0]:
                        ids = self.encode(texts[row])[:max_len]
                        tokens[row, :] = pad_id
                        if ids:
                            tokens[row, : len(ids)] = ids
                        lengths[row] = len(ids)
                return tokens, lengths

        batch = np.full((len(texts), max_len), pad_id, dtype=np.int32)
        lengths = np.zeros((len(texts),), dtype=np.int32)
        for row, text in enumerate(texts):
            ids = self.encode(text)[:max_len]
            lengths[row] = len(ids)
            if ids:
                batch[row, : len(ids)] = ids
        return batch, lengths


# Alias matching the reference class name (ref: backend/tokenizer.py:6) so
# reference users find the familiar entry point.
class PretrainedTokenizer(Tokenizer):
    def __init__(self, word_to_idx_path: str | Path):
        with open(word_to_idx_path, "rb") as f:
            super().__init__(pickle.load(f))


def lengths_to_mask(lengths: np.ndarray, max_len: int) -> np.ndarray:
    """Boolean [B, max_len] validity mask from lengths (host-side helper)."""
    return np.arange(max_len)[None, :] < np.asarray(lengths)[:, None]
