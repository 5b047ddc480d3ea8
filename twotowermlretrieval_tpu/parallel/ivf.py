"""Distributed IVF search: block-sharded index over the 'data' mesh axis.

Composes the on-device IVF index (ops/ivf.py) with the mesh, for corpora
whose packed [C, cap, H] block tensor outgrows one chip's HBM. Layout:

- **centroids replicated** — [C, H] is a few MB; every shard computes the
  SAME global top-``nprobe`` probe list, so the search semantics are
  identical to the single-device :func:`ops.ivf.ivf_search`.
- **blocks sharded** — docs/ids (and int8 scales) split contiguously over
  'data': shard ``s`` owns blocks ``[s*Bl, (s+1)*Bl)``. Each shard gathers
  only the probed blocks it owns (a clamped gather with an ownership mask;
  non-owned probe slots score NEG_INF), takes a local top-k over its probed
  candidates, and the per-shard results merge with the same O(D*k)
  all-gather + ``lax.top_k`` the exact distributed scan uses
  (parallel/topk.py).

Replaces the reference's single-host ChromaDB at scales where even a
sharded exact scan is too slow (ref: frontend/main.py:74-76).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from twotowermlretrieval_tpu.ops.ivf import IVFIndex
from twotowermlretrieval_tpu.ops.topk import NEG_INF
from twotowermlretrieval_tpu.parallel.mesh import DATA_AXIS


class ShardedIVF(NamedTuple):
    centroids: jax.Array  # [C_pad, H] f32, replicated
    docs: jax.Array  # [C_pad, cap, H] sharded on dim 0 over 'data'
    ids: jax.Array  # [C_pad, cap] int32 sharded, -1 padding
    scales: jax.Array | None  # [C_pad, cap] f32 sharded (int8 storage only)
    n_blocks: int  # true (pre-padding) block count
    cap: int


def shard_ivf(index: IVFIndex, mesh: Mesh) -> ShardedIVF:
    """Place an IVFIndex on the mesh: centroids replicated, blocks padded
    to a multiple of the 'data' axis and row-sharded. Padding blocks get
    NEG_INF centroids (never probed), zero docs and -1 ids."""
    num = mesh.shape[DATA_AXIS]
    centroids = np.asarray(index.centroids)
    docs = np.asarray(index.docs)
    ids = np.asarray(index.ids)
    scales = None if index.scales is None else np.asarray(index.scales)
    C, cap = ids.shape
    pad = (-C) % num
    if pad:
        centroids = np.concatenate(
            [centroids, np.full((pad, centroids.shape[1]), NEG_INF, centroids.dtype)]
        )
        docs = np.concatenate([docs, np.zeros((pad, cap, docs.shape[2]), docs.dtype)])
        ids = np.concatenate([ids, np.full((pad, cap), -1, np.int32)])
        if scales is not None:
            scales = np.concatenate([scales, np.zeros((pad, cap), scales.dtype)])
    rep = NamedSharding(mesh, P())
    sh = NamedSharding(mesh, P(DATA_AXIS))
    return ShardedIVF(
        centroids=jax.device_put(jnp.asarray(centroids), rep),
        docs=jax.device_put(jnp.asarray(docs), sh),
        ids=jax.device_put(jnp.asarray(ids), sh),
        scales=None if scales is None else jax.device_put(jnp.asarray(scales), sh),
        n_blocks=C,
        cap=cap,
    )


@functools.lru_cache(maxsize=32)  # bounded, same reason as _compiled_topk
def _compiled_ivf_search(mesh: Mesh, k: int, nprobe: int, n_blocks: int, quantized: bool):
    """One shard_map+jit callable per (mesh, k, nprobe, n_blocks, storage)
    — cached for the same no-per-request-retrace reason as the exact
    distributed scan (parallel/topk.py)."""

    def body(queries, centroids, docs_shard, ids_shard, *scales_shard):
        B = queries.shape[0]
        Bl = docs_shard.shape[0]  # local blocks per shard
        q = queries.astype(jnp.float32)

        # replicated probe: identical global top-nprobe on every shard
        c_scores = jnp.dot(q, centroids.T, preferred_element_type=jnp.float32)
        cols = jax.lax.broadcasted_iota(jnp.int32, c_scores.shape, 1)
        c_scores = jnp.where(cols < n_blocks, c_scores, NEG_INF)
        _, probe = jax.lax.top_k(c_scores, nprobe)  # [B, nprobe] global block ids

        shard = jax.lax.axis_index(DATA_AXIS)
        local = probe - shard * Bl
        own = (local >= 0) & (local < Bl)  # [B, nprobe]
        safe = jnp.clip(local, 0, Bl - 1)

        blocks = docs_shard[safe]  # [B, nprobe, cap, H]
        block_ids = jnp.where(own[..., None], ids_shard[safe], -1)  # [B, nprobe, cap]
        if quantized:
            scores = jnp.einsum(
                "bh,bpch->bpc", q, blocks.astype(jnp.float32),
                preferred_element_type=jnp.float32,
            ) * scales_shard[0][safe]
        else:
            scores = jnp.einsum(
                "bh,bpch->bpc", q.astype(blocks.dtype), blocks,
                preferred_element_type=jnp.float32,
            )
        scores = scores.reshape(B, -1)
        flat_ids = block_ids.reshape(B, -1)
        scores = jnp.where(flat_ids >= 0, scores, NEG_INF)

        k_local = min(k, scores.shape[1])
        vals, pos = jax.lax.top_k(scores, k_local)
        ids = jnp.take_along_axis(flat_ids, pos, axis=1)  # ORIGINAL doc ids

        # O(D * k) cross-shard merge, identical to the exact scan's;
        # fewer than k probed candidates pad out to the promised [B, k]
        # (the single-device ivf_search contract, ops/ivf.py)
        all_vals = jax.lax.all_gather(vals, DATA_AXIS, axis=1, tiled=True)
        all_ids = jax.lax.all_gather(ids, DATA_AXIS, axis=1, tiled=True)
        k_merge = min(k, all_vals.shape[1])
        merged_vals, mpos = jax.lax.top_k(all_vals, k_merge)
        merged_ids = jnp.take_along_axis(all_ids, mpos, axis=1)
        if k_merge < k:
            merged_vals = jnp.pad(
                merged_vals, ((0, 0), (0, k - k_merge)), constant_values=NEG_INF
            )
            merged_ids = jnp.pad(
                merged_ids, ((0, 0), (0, k - k_merge)), constant_values=-1
            )
        merged_ids = jnp.where(merged_vals <= NEG_INF, -1, merged_ids)
        return merged_vals, merged_ids

    in_specs = [P(), P(), P(DATA_AXIS), P(DATA_AXIS)]
    if quantized:
        in_specs.append(P(DATA_AXIS))
    mapped = jax.shard_map(
        body, mesh=mesh, in_specs=tuple(in_specs), out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(mapped)


def distributed_ivf_search(
    queries: jax.Array,  # [B, H] (replicated)
    index: ShardedIVF,
    k: int = 50,
    nprobe: int = 32,
    mesh: Mesh | None = None,
) -> Tuple[jax.Array, jax.Array]:
    """Approximate top-k over the block-sharded IVF index. Same semantics
    as ops.ivf.ivf_search with the same nprobe (the probe list is computed
    globally); returns replicated ([B, k] scores, [B, k] original doc ids,
    -1 where fewer than k real docs were probed)."""
    assert mesh is not None, "distributed_ivf_search needs the mesh"
    nprobe = min(nprobe, index.n_blocks)
    fn = _compiled_ivf_search(
        mesh, k, nprobe, index.n_blocks, quantized=index.scales is not None
    )
    args = (queries, index.centroids, index.docs, index.ids)
    if index.scales is not None:
        args = args + (index.scales,)
    return fn(*args)
