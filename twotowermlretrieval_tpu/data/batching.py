"""Static-shape batching + host->device prefetch for triplet training.

Replaces the reference's torch ``TripletDataset``/``collate_fn``/``DataLoader``
stack (ref: backend/main.py:33-56, 203-219) with a jit-friendly design:

- The whole split is tokenized **once** into fixed-width int32 arrays
  (the reference re-tokenizes lazily per epoch in ``__getitem__``,
  backend/main.py:42-48 — wasted host work every epoch).
- Every batch has identical shapes ``[B, max_len]`` — no per-batch dynamic
  padding (backend/main.py:50-56), so XLA compiles the train step exactly
  once. The final partial batch is padded with repeated rows and an explicit
  ``example_mask`` so weighted losses/metrics stay exact (torch keeps a
  ragged final batch instead).
- Explicit ``lengths`` channel instead of the pad-id-0 sentinel
  (see tokenizer.py docstring; ref bug: model.py:52 treats GloVe word id 0
  as padding).
- A small lookahead prefetcher overlaps host slicing + H2D transfer with
  device compute (the torch analogue is ``num_workers=2``,
  backend/main.py:206-212).
"""

from __future__ import annotations

from typing import Iterator, List, NamedTuple, Optional, Sequence, Tuple

import numpy as np

from twotowermlretrieval_tpu.tokenizer import Tokenizer

Triplet = Tuple[str, str, str]


class Batch(NamedTuple):
    """One static-shape training batch (numpy on host, jax on device)."""

    q_tokens: np.ndarray  # int32 [B, Lq]
    q_len: np.ndarray  # int32 [B]
    pos_tokens: np.ndarray  # int32 [B, Ld]
    pos_len: np.ndarray  # int32 [B]
    neg_tokens: np.ndarray  # int32 [B, Ld]
    neg_len: np.ndarray  # int32 [B]
    example_mask: np.ndarray  # float32 [B] — 0 for repeated padding rows


class TripletBatcher:
    """Pre-tokenized, shuffled, fixed-shape batch source.

    With ``length_buckets`` (ascending doc-width edges, e.g. [32, 64, 128]),
    each triplet is assigned to the smallest bucket that fits
    ``max(pos_len, neg_len)`` and batches are formed within buckets, so a
    short-passage batch runs a short scan. One jit compilation per bucket
    width (a handful), instead of the reference's per-batch dynamic widths
    (backend/main.py:50-56) which would recompile constantly under XLA.
    Bucket order is deterministically shuffled with the same seed.
    """

    def __init__(
        self,
        triplets: Sequence[Triplet],
        tokenizer: Tokenizer,
        batch_size: int,
        max_query_len: int = 32,
        max_doc_len: int = 128,
        drop_remainder: bool = False,
        length_buckets: Optional[Sequence[int]] = None,
    ):
        self.batch_size = int(batch_size)
        self.drop_remainder = drop_remainder
        self.num_examples = len(triplets)

        queries = [t[0] for t in triplets]
        positives = [t[1] for t in triplets]
        negatives = [t[2] for t in triplets]
        self.q_tokens, self.q_len = tokenizer.encode_batch(queries, max_query_len)
        self.pos_tokens, self.pos_len = tokenizer.encode_batch(positives, max_doc_len)
        self.neg_tokens, self.neg_len = tokenizer.encode_batch(negatives, max_doc_len)

        if length_buckets:
            # user edges strictly inside (0, max_doc_len); the terminal
            # bucket is ALWAYS max_doc_len, so oversized/duplicate edges
            # can neither drop the full-width bucket nor truncate docs
            edges = sorted({int(e) for e in length_buckets if 0 < int(e) < max_doc_len})
            self.bucket_edges = edges + [max_doc_len]
        else:
            self.bucket_edges = [max_doc_len]
        eff_len = np.maximum(self.pos_len, self.neg_len)
        # smallest edge >= effective doc length
        self._bucket_of = np.searchsorted(np.asarray(self.bucket_edges), eff_len, side="left")
        self._bucket_of = np.minimum(self._bucket_of, len(self.bucket_edges) - 1)

    def _num_batches_in(self, count: int) -> int:
        if self.drop_remainder:
            return count // self.batch_size
        return -(-count // self.batch_size)

    def __len__(self) -> int:
        if len(self.bucket_edges) == 1:
            return self._num_batches_in(self.num_examples)
        return sum(
            self._num_batches_in(int((self._bucket_of == b).sum()))
            for b in range(len(self.bucket_edges))
        )

    def batches(self, seed: Optional[int] = None) -> Iterator[Batch]:
        """Yield batches; ``seed`` given -> shuffled (train), None -> in
        order (eval), mirroring the reference's shuffle=True/False loaders
        (backend/main.py:206-219)."""
        rng = np.random.default_rng(seed) if seed is not None else None

        plans = []  # (bucket, index array, mask) per batch
        for b in range(len(self.bucket_edges)):
            members = np.nonzero(self._bucket_of == b)[0]
            if rng is not None:
                rng.shuffle(members)
            B = self.batch_size
            num_full = len(members) // B
            for i in range(num_full):
                plans.append((b, members[i * B : (i + 1) * B], np.ones(B, np.float32)))
            rem = len(members) - num_full * B
            if rem and not self.drop_remainder:
                idx = members[num_full * B :]
                # Pad to full width with repeats of the first remainder row;
                # example_mask zeroes their loss/metric contribution.
                pad = np.full(B - rem, idx[0], dtype=idx.dtype)
                mask = np.concatenate([np.ones(rem, np.float32), np.zeros(B - rem, np.float32)])
                plans.append((b, np.concatenate([idx, pad]), mask))

        if rng is not None:
            rng.shuffle(plans)
        for bucket, idx, mask in plans:
            yield self._gather(idx, mask, self.bucket_edges[bucket])

    def _gather(self, idx: np.ndarray, mask: np.ndarray, doc_width: int) -> Batch:
        return Batch(
            q_tokens=self.q_tokens[idx],
            q_len=self.q_len[idx],
            pos_tokens=self.pos_tokens[idx, :doc_width],
            pos_len=self.pos_len[idx],
            neg_tokens=self.neg_tokens[idx, :doc_width],
            neg_len=self.neg_len[idx],
            example_mask=mask,
        )


def pack_batch(batch: Batch) -> np.ndarray:
    """Flatten a host Batch into ONE int32 array [B, Lq + 2*Ld + 4].

    On remote-attached TPUs every ``device_put`` is a round-trip; shipping
    the seven batch leaves as one buffer makes the hot loop one transfer per
    step. Layout: q_tokens | pos_tokens | neg_tokens | q_len | pos_len |
    neg_len | example_mask (0/1 as int32). Unpacked on device inside the
    jitted step by :func:`unpack_batch`.
    """
    cols = [
        batch.q_tokens,
        batch.pos_tokens,
        batch.neg_tokens,
        batch.q_len[:, None],
        batch.pos_len[:, None],
        batch.neg_len[:, None],
        batch.example_mask.astype(np.int32)[:, None],
    ]
    return np.concatenate([np.asarray(c, np.int32) for c in cols], axis=1)


def unpack_batch(packed, max_query_len: int) -> Batch:
    """Inverse of :func:`pack_batch`; traceable (runs inside jit)."""
    W = packed.shape[1]
    Lq = max_query_len
    Ld = (W - Lq - 4) // 2
    q = packed[:, :Lq]
    pos = packed[:, Lq : Lq + Ld]
    neg = packed[:, Lq + Ld : Lq + 2 * Ld]
    tail = packed[:, Lq + 2 * Ld :]
    return Batch(
        q_tokens=q,
        q_len=tail[:, 0],
        pos_tokens=pos,
        pos_len=tail[:, 1],
        neg_tokens=neg,
        neg_len=tail[:, 2],
        example_mask=tail[:, 3].astype(np.float32),
    )


def prefetch_packed_to_device(iterator: Iterator[Batch], size: int = 2, sharding=None):
    """Like :func:`prefetch_to_device` but ships each batch as ONE packed
    int32 buffer (see :func:`pack_batch`) — one transfer per step instead of
    seven."""
    import collections

    import jax

    queue: collections.deque = collections.deque()

    def put(batch: Batch):
        from twotowermlretrieval_tpu.parallel.mesh import put_global

        # multi-process safe: on a pod each host materializes only its
        # addressable rows of the sharded batch
        return put_global(pack_batch(batch), sharding)

    for batch in iterator:
        queue.append(put(batch))
        if len(queue) >= size:
            yield queue.popleft()
    while queue:
        yield queue.popleft()


def tokenize_corpus(
    documents: Sequence[str], tokenizer: Tokenizer, max_len: int, batch_size: int = 256
) -> Iterator[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Fixed-shape document batches for corpus encoding (artifact export /
    evaluators). Yields (tokens [B, L], lengths [B], mask [B]) with the final
    batch repeat-padded, mirroring the export loop at ref backend/main.py:125-133
    but with static shapes."""
    n = len(documents)
    for start in range(0, n, batch_size):
        chunk = list(documents[start : start + batch_size])
        real = len(chunk)
        while len(chunk) < batch_size:
            chunk.append(chunk[0])
        tokens, lengths = tokenizer.encode_batch(chunk, max_len)
        mask = (np.arange(batch_size) < real).astype(np.float32)
        yield tokens, lengths, mask
