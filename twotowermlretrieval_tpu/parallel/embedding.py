"""Row-sharded embedding-table lookup (the project's "EP" axis).

The reference replicates a frozen [400k x 100] GloVe table per device
(ref: model.py:24-27). At pod scale the learned-table configuration
(BASELINE.json config 3) row-shards the table across the 'model' mesh axis:
each device holds rows ``[shard * V/D, (shard+1) * V/D)`` and a lookup is a
local masked gather + ``psum`` over the axis — the DLRM-style sharded
embedding pattern (PAPERS.md). The backward pass transposes automatically
under jax.grad: psum -> identity, masked gather -> local scatter-add, so
each shard accumulates gradients only for its own rows.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


import functools


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def sharded_embedding_lookup(
    table_shard: jax.Array,  # [V/D, E] — this device's rows
    tokens: jax.Array,  # int32 [...]
    axis_name: str,
) -> jax.Array:
    """Lookup through a row-sharded table inside shard_map/pmap.

    Returns [..., E] f32, identical to ``jnp.take(full_table, tokens, 0)``.

    Carries a custom VJP: the mechanical transpose of the forward ``psum``
    would sum the (replicated, identical) output cotangents from every chip
    on the axis, inflating the table gradient by the axis size. The correct
    backward is purely local — scatter-add the cotangent into this shard's
    own rows, no collective.
    """
    out, _ = _lookup_fwd(table_shard, tokens, axis_name)
    return out


def _local_offsets(table_shard, tokens, axis_name):
    shard_rows = table_shard.shape[0]
    shard_index = jax.lax.axis_index(axis_name)
    local = tokens - shard_index * shard_rows
    in_range = (local >= 0) & (local < shard_rows)
    return jnp.clip(local, 0, shard_rows - 1), in_range


def _lookup_fwd(table_shard, tokens, axis_name):
    local, in_range = _local_offsets(table_shard, tokens, axis_name)
    rows = jnp.take(table_shard, local, axis=0)
    rows = jnp.where(in_range[..., None], rows, 0.0)
    out = jax.lax.psum(rows, axis_name)
    # zeros_like template carries the shard's shape/dtype into bwd
    return out, (local, in_range, jnp.zeros_like(table_shard))


def _lookup_bwd(axis_name, residuals, g):
    local, in_range, zeros_template = residuals
    E = zeros_template.shape[-1]
    g_masked = jnp.where(in_range[..., None], g, 0.0).astype(zeros_template.dtype)
    d_table = zeros_template.at[local.reshape(-1)].add(g_masked.reshape(-1, E))
    return d_table, None


sharded_embedding_lookup.defvjp(
    lambda t, tok, axis: _lookup_fwd(t, tok, axis),
    _lookup_bwd,
)

