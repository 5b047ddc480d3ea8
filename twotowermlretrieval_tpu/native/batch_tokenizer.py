"""ctypes wrapper: numpy-in / numpy-out native batch tokenization."""

from __future__ import annotations

import ctypes
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from twotowermlretrieval_tpu.native import get_lib


class NativeVocab:
    """A C++ hash-map vocabulary bound to the native encode_batch."""

    def __init__(self, word_to_idx: Dict[str, int], unk_id: int):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native tokenizer library unavailable")
        self._lib = lib
        words: List[bytes] = []
        ids: List[int] = []
        for word, idx in word_to_idx.items():
            encoded = word.encode("utf-8")
            words.append(encoded)
            ids.append(idx)
        blob = b"".join(words)
        offsets = np.zeros(len(words) + 1, np.int64)
        np.cumsum([len(w) for w in words], out=offsets[1:])
        ids_arr = np.asarray(ids, np.int32)
        self._handle = lib.vocab_create(
            blob,
            offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            ids_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            len(words),
            unk_id,
        )
        if not self._handle:
            raise RuntimeError("vocab_create failed")

    def __del__(self):
        if getattr(self, "_handle", None):
            self._lib.vocab_free(self._handle)
            self._handle = None

    def size(self) -> int:
        return int(self._lib.vocab_size(self._handle))

    def encode_batch(
        self, texts: Sequence[str], max_len: int, pad_id: int
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Returns (tokens [B, max_len] int32 pad-filled, lengths [B] int32,
        ok [B] uint8 — rows with ok=0 must be re-encoded in Python)."""
        encoded = [str(t).encode("utf-8", errors="surrogatepass") for t in texts]
        blob = b"".join(encoded)
        offsets = np.zeros(len(encoded) + 1, np.int64)
        np.cumsum([len(t) for t in encoded], out=offsets[1:])
        tokens = np.full((len(encoded), max_len), pad_id, np.int32)
        lengths = np.zeros(len(encoded), np.int32)
        ok = np.zeros(len(encoded), np.uint8)
        self._lib.encode_batch(
            self._handle,
            blob,
            offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(encoded),
            max_len,
            pad_id,
            tokens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            ok.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
        return tokens, lengths, ok
