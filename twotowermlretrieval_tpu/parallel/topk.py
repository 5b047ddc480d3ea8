"""Distributed top-k retrieval over a corpus sharded across the mesh.

Each device holds a corpus shard [N/D, H]; a query batch is replicated,
every device runs the local exact top-k (the fused Pallas kernel on TPU,
the segmented XLA path elsewhere), and per-shard (values, global ids) are
all-gathered and merged with one small ``lax.top_k`` — the cross-shard
merge is O(D * k) per query, wire traffic ``D * B * k * 8`` bytes over ICI.

Replaces (and scales past) the reference's single-host ChromaDB collection
(ref: frontend/main.py:74-76, 153-156); this is BASELINE.json config 4.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from twotowermlretrieval_tpu.ops.topk import (
    fused_topk_int8,
    fused_topk_segmax,
    quantize_rows,
    topk_segmented,
    topk_segmented_int8,
    use_streaming_kernel,
)
from twotowermlretrieval_tpu.parallel.mesh import DATA_AXIS


def _merge_across_shards(local_fn, queries, k, n_valid, shard_rows):
    """Run a per-shard local top-k and merge candidates across the 'data'
    axis. ``local_fn(queries, local_valid) -> (vals, ids)`` must mask its
    shard's zero-padding rows DURING the scan (via the kernels' n_valid),
    not after — a padding row scoring 0.0 would otherwise displace a real
    negative-scoring doc from the local k and lose it from the merge."""
    shard = jax.lax.axis_index(DATA_AXIS)
    # rows valid in THIS shard (the tail shard holds the zero padding)
    local_valid = jnp.clip(n_valid - shard * shard_rows, 0, shard_rows)
    vals, ids = local_fn(queries, local_valid)
    ids = jnp.where(ids >= 0, ids + shard * shard_rows, ids)  # global ids
    # gather per-shard candidates: [D*k] per row
    all_vals = jax.lax.all_gather(vals, DATA_AXIS, axis=1, tiled=True)  # [B, D*k]
    all_ids = jax.lax.all_gather(ids, DATA_AXIS, axis=1, tiled=True)
    merged_vals, pos = jax.lax.top_k(all_vals, k)
    merged_ids = jnp.take_along_axis(all_ids, pos, axis=1)
    return merged_vals, merged_ids


def mapped_topk(mesh: Mesh, k: int, use_pallas: bool, interpret: bool,
                quantized: bool, phase2: str = "rescore",
                sort_candidates: bool = False):
    """The UNJITTED shard_map callable behind :func:`distributed_topk` —
    traceable inside an enclosing jit, which is what lets the serving
    engine fuse query encode + sharded search + cross-shard merge into ONE
    executable on a mesh (serve/index.traced_search, VERDICT r3 #1).
    ``n_valid`` is a traced int32 argument, not a baked-in constant, so a
    corpus refresh with the same shapes reuses the executable."""

    # Per-shard candidate count: a shard can hold fewer than k rows (small
    # corpus over many devices); D * min(k, shard_rows) >= k candidates
    # always survive the merge, so the global result stays exact.
    if quantized:

        def body(queries, values_shard, scales_shard, n_valid):
            shard_rows = values_shard.shape[0]  # local (per-shard) rows
            k_local = min(k, shard_rows)

            def local_fn(q, local_valid):
                if use_pallas:
                    return fused_topk_int8(
                        q, values_shard, scales_shard, k=k_local,
                        interpret=interpret, n_valid=local_valid,
                    )
                return topk_segmented_int8(
                    q, values_shard, scales_shard, k=k_local, n_valid=local_valid
                )

            return _merge_across_shards(local_fn, queries, k, n_valid, shard_rows)

        in_specs = (P(), P(DATA_AXIS, None), P(DATA_AXIS), P())
    else:

        def body(queries, docs_shard, n_valid):
            shard_rows = docs_shard.shape[0]
            k_local = min(k, shard_rows)

            def local_fn(q, local_valid):
                if use_pallas:
                    return fused_topk_segmax(
                        q, docs_shard, k=k_local, interpret=interpret,
                        n_valid=local_valid, phase2=phase2,
                        sort_candidates=sort_candidates,
                    )
                return topk_segmented(q, docs_shard, k=k_local, n_valid=local_valid)

            return _merge_across_shards(local_fn, queries, k, n_valid, shard_rows)

        in_specs = (P(), P(DATA_AXIS, None), P())

    return jax.shard_map(
        body, mesh=mesh, in_specs=in_specs, out_specs=(P(), P()), check_vma=False
    )


@functools.lru_cache(maxsize=32)  # bounded: long-lived servers with varying
# k/fanout would otherwise accumulate executables + Mesh refs forever
def _compiled_topk(mesh: Mesh, k: int, use_pallas: bool, interpret: bool,
                   quantized: bool, phase2: str = "rescore",
                   sort_candidates: bool = False):
    """One shard_map+jit callable per (mesh, k, backend, storage) combo.

    Built ONCE and cached: a fresh shard_map closure wrapped in a fresh
    jax.jit per call would retrace (and likely recompile) on every
    mesh-backed search — the serving hot path (VERDICT r1 weak #1)."""
    return jax.jit(mapped_topk(mesh, k, use_pallas, interpret, quantized,
                               phase2=phase2, sort_candidates=sort_candidates))


def distributed_topk(
    queries: jax.Array,  # [B, H] (replicated)
    docs_sharded: jax.Array,  # [N, H] sharded on dim 0 over 'data'
    k: int,
    mesh: Mesh,
    n_valid: int | None = None,
    use_pallas: bool | None = None,
    interpret: bool = False,
    phase2: str = "rescore",
    sort_candidates: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Exact top-k over the sharded corpus. Returns replicated
    ([B, k] values, [B, k] global ids). ``n_valid`` is the true corpus size
    when the sharded array carries zero-padding rows (shard_corpus).
    ``phase2``/``sort_candidates`` select the shard-local segmax phase-2
    strategy (ops.topk.fused_topk_segmax; ignored on the XLA path)."""
    shard_rows = docs_sharded.shape[0] // mesh.shape[DATA_AXIS]
    use_pallas = use_streaming_kernel(queries.shape[0], shard_rows, use_pallas)
    if n_valid is None:
        n_valid = docs_sharded.shape[0]
    fn = _compiled_topk(mesh, k, use_pallas, interpret, quantized=False,
                        phase2=phase2, sort_candidates=sort_candidates)
    return fn(queries, docs_sharded, jnp.int32(n_valid))


def distributed_topk_int8(
    queries: jax.Array,  # [B, H] f32 (replicated)
    doc_values: jax.Array,  # [N, H] int8 sharded on dim 0 over 'data'
    doc_scales: jax.Array,  # [N] f32 sharded over 'data'
    k: int,
    mesh: Mesh,
    n_valid: int | None = None,
    use_pallas: bool | None = None,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """int8 row-quantized variant of :func:`distributed_topk`: each shard
    scans its quantized rows (half the HBM traffic of bf16), then the same
    O(D*k) cross-shard merge."""
    shard_rows = doc_values.shape[0] // mesh.shape[DATA_AXIS]
    use_pallas = use_streaming_kernel(queries.shape[0], shard_rows, use_pallas, quantized=True)
    if n_valid is None:
        n_valid = doc_values.shape[0]
    fn = _compiled_topk(mesh, k, use_pallas, interpret, quantized=True)
    return fn(queries, doc_values, doc_scales, jnp.int32(n_valid))


def _shard_pad(N: int, num_shards: int) -> int:
    """Rows to append so each shard is a multiple of the streaming tile
    (large corpora — the kernel would otherwise re-copy its shard per
    call to pad) or at least of the sublane width (small corpora)."""
    row_tile = 8192 if N >= num_shards * 8192 else 8
    return (-N) % (num_shards * row_tile)


def shard_corpus(doc_embeddings, mesh: Mesh):
    """Place [N, H] corpus row-sharded over 'data', zero-padding N to a
    multiple of the shard count. Returns (sharded array, true N) — pass the
    true N to distributed_topk(n_valid=...) so padding rows are masked."""
    import numpy as np

    num = mesh.shape[DATA_AXIS]
    N, H = doc_embeddings.shape
    pad = _shard_pad(N, num)
    if pad:
        doc_embeddings = np.concatenate(
            [doc_embeddings, np.zeros((pad, H), doc_embeddings.dtype)], axis=0
        )
    return jax.device_put(
        jnp.asarray(doc_embeddings), NamedSharding(mesh, P(DATA_AXIS, None))
    ), N


def shard_corpus_int8(doc_embeddings, mesh: Mesh):
    """Quantize [N, H] f32 rows to int8 + scales and place both row-sharded
    over 'data' (zero-padded to the shard count). Returns
    (values sharded, scales sharded, true N)."""
    import numpy as np

    values, scales = quantize_rows(np.asarray(doc_embeddings, np.float32))
    num = mesh.shape[DATA_AXIS]
    N, H = values.shape
    pad = _shard_pad(N, num)
    if pad:
        values = np.concatenate([values, np.zeros((pad, H), np.int8)], axis=0)
        scales = np.concatenate([scales, np.zeros((pad,), np.float32)])
    return (
        jax.device_put(jnp.asarray(values), NamedSharding(mesh, P(DATA_AXIS, None))),
        jax.device_put(jnp.asarray(scales), NamedSharding(mesh, P(DATA_AXIS))),
        N,
    )


# ---------------------------------------------------------------------------
# per-segment s8 index (the serving int8 default on TPU)
# ---------------------------------------------------------------------------


def mapped_topk_s8(mesh: Mesh, k: int, use_pallas: bool, interpret: bool,
                   phase2: str = "rescore", sort_candidates: bool = False):
    """UNJITTED shard_map callable over the per-SEGMENT quantized int8
    corpus (ops.topk.quantize_segments): each shard runs the s8xs8 segmax
    kernel (or its exact XLA twin off-TPU), then the same O(D*k) merge.
    Traceable inside an enclosing jit (the engine's fused serving path)."""
    from twotowermlretrieval_tpu.ops.topk import (
        fused_topk_segmax_s8,
        topk_segmented_s8,
    )

    def body(queries, values_shard, segscales_shard, n_valid):
        shard_rows = values_shard.shape[0]
        k_local = min(k, shard_rows)

        def local_fn(q, local_valid):
            if use_pallas:
                return fused_topk_segmax_s8(
                    q, values_shard, segscales_shard, k=k_local,
                    interpret=interpret, n_valid=local_valid, phase2=phase2,
                    sort_candidates=sort_candidates,
                )
            return topk_segmented_s8(
                q, values_shard, segscales_shard, k=k_local, n_valid=local_valid
            )

        return _merge_across_shards(local_fn, queries, k, n_valid, shard_rows)

    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(DATA_AXIS, None), P(DATA_AXIS), P()),
        out_specs=(P(), P()), check_vma=False,
    )


@functools.lru_cache(maxsize=32)
def _compiled_topk_s8(mesh: Mesh, k: int, use_pallas: bool, interpret: bool,
                      phase2: str = "rescore", sort_candidates: bool = False):
    """jit-wrapped :func:`mapped_topk_s8`, built once per combo (see
    _compiled_topk)."""
    return jax.jit(mapped_topk_s8(mesh, k, use_pallas, interpret,
                                  phase2=phase2, sort_candidates=sort_candidates))


def distributed_topk_s8(
    queries: jax.Array,  # [B, H] f32 (replicated)
    doc_values: jax.Array,  # [N, H] int8 sharded on dim 0 over 'data'
    seg_scales: jax.Array,  # [N / 128] f32 sharded over 'data'
    k: int,
    mesh: Mesh,
    n_valid: int | None = None,
    use_pallas: bool | None = None,
    interpret: bool = False,
    phase2: str = "rescore",
    sort_candidates: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Per-segment-quantized variant of :func:`distributed_topk_int8`
    (half the HBM traffic of bf16 AND a scan that runs at the s8 matmul
    floor — the per-row format's dequant stalls are gone).
    ``phase2``/``sort_candidates`` select the shard-local segmax phase-2
    strategy (ops.topk.fused_topk_segmax_s8; ignored on the XLA path)."""
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if n_valid is None:
        n_valid = doc_values.shape[0]
    fn = _compiled_topk_s8(mesh, k, bool(use_pallas), interpret,
                           phase2=phase2, sort_candidates=sort_candidates)
    return fn(queries, doc_values, seg_scales, jnp.int32(n_valid))


def shard_corpus_s8(doc_embeddings, mesh: Mesh):
    """Quantize [N, H] f32 per 128-row segment and place values + segment
    scales row-sharded over 'data'. Every shard's row count is a multiple
    of the segment width (128) — large corpora pad to the 8192-row
    streaming tile per shard. Returns (values, seg_scales, true N)."""
    import numpy as np

    from twotowermlretrieval_tpu.ops.topk import quantize_segments

    from twotowermlretrieval_tpu.ops.topk import _MIN_TILE_N

    num = mesh.shape[DATA_AXIS]
    N, H = doc_embeddings.shape
    # each shard must be a multiple of the kernel's MINIMUM tile (not just
    # the 128-row segment): a smaller shard would re-pad itself inside
    # every compiled search (review r3)
    row_tile = 8192 if N >= num * 8192 else _MIN_TILE_N
    pad = (-N) % (num * row_tile)
    x = np.asarray(doc_embeddings, np.float32)
    if pad:
        x = np.concatenate([x, np.zeros((pad, H), np.float32)], axis=0)
    values, seg_scales = quantize_segments(x)
    return (
        jax.device_put(jnp.asarray(values), NamedSharding(mesh, P(DATA_AXIS, None))),
        jax.device_put(jnp.asarray(seg_scales), NamedSharding(mesh, P(DATA_AXIS))),
        N,
    )
