"""Device mesh construction and common shardings.

The reference is strictly single-device (device autodetect only,
ref: backend/main.py:60-66; no torch.distributed anywhere — SURVEY.md §2b).
The TPU build's distribution story is a 2-D ``('data', 'model')`` mesh:

- ``data``  — batch-sharded SPMD training (gradient psum over ICI) and
  corpus-sharded retrieval;
- ``model`` — row-sharded embedding tables (the project's "EP" axis) and,
  for transformer towers, head/FFN sharding headroom.

Multi-host bootstrap is ``jax.distributed.initialize`` + the same code: the
mesh spans all global devices and GSPMD/shard_map place collectives on ICI
within a slice and DCN across slices.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    data: int = -1,
    model: int = 1,
    devices=None,
) -> Mesh:
    """('data', 'model') mesh. data=-1 -> all remaining devices.

    When the mesh spans every visible device, placement goes through
    ``mesh_utils.create_device_mesh``, which orders devices by the physical
    ICI topology (rings/tori) so the 'model' axis — the one carrying
    per-step psums — lands on nearest-neighbor links instead of whatever
    order ``jax.devices()`` happens to return. An explicit device subset
    falls back to a plain reshape."""
    explicit = devices is not None
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if data == -1:
        if n % model:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    if not explicit and n > 1:
        try:
            from jax.experimental import mesh_utils

            grid = mesh_utils.create_device_mesh((data, model))
            return Mesh(grid, (DATA_AXIS, MODEL_AXIS))
        except (ValueError, NotImplementedError, AssertionError):
            pass  # unusual topologies: plain order is still correct, just slower
    return Mesh(devices.reshape(data, model), (DATA_AXIS, MODEL_AXIS))


def resolve_mesh(data: int, model: int) -> Optional[Mesh]:
    """Resolve (data, model) axis requests against the visible devices:
    data=-1 claims all devices not on 'model'; a 1x1 request returns None
    (single-device path). Shared by the training driver and the serving
    CLI so the two cannot drift. When the mesh spans every device the
    topology-aware make_mesh placement is used."""
    n = len(jax.devices())
    data = data if data != -1 else max(n // model, 1)
    if data * model <= 1:
        return None
    if data * model > n:
        raise ValueError(
            f"mesh {data}x{model} needs {data * model} devices but only "
            f"{n} are visible"
        )
    if data * model == n:
        return make_mesh(data, model)  # topology-aware placement
    return make_mesh(data, model, devices=jax.devices()[: data * model])


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-dim batch split across 'data' (replicated over 'model')."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def embedding_row_sharding(mesh: Mesh) -> NamedSharding:
    """Row-shard a [V, E] table across the 'model' axis (BASELINE config 3)."""
    return NamedSharding(mesh, P(MODEL_AXIS, None))


def put_global(array, sharding: Optional[NamedSharding]):
    """Place a host array onto the mesh under ``sharding``, multi-process
    safe. Single-process: a plain ``device_put``. Multi-process (pod): a
    bare ``device_put`` onto a sharding that spans non-addressable devices
    is invalid — ``make_array_from_callback`` builds the global array from
    each process's ADDRESSABLE shards only, so every host materializes just
    its local rows of the (process-identical) global batch."""
    import jax.numpy as jnp

    if sharding is None:
        return jax.device_put(array)
    if jax.process_count() == 1:
        return jax.device_put(array, sharding)
    if hasattr(array, "dtype") and jax.dtypes.issubdtype(array.dtype, jax.dtypes.prng_key):
        # typed PRNG keys have no numpy representation: place the raw key
        # data (one trailing lane; P() prefix specs broadcast over it) and
        # re-wrap. Keys are replicated in every TrainState spec.
        data = put_global(np.asarray(jax.random.key_data(array)), sharding)
        return jax.random.wrap_key_data(data, impl=jax.random.key_impl(array))
    array = np.asarray(array)
    return jax.make_array_from_callback(
        array.shape, sharding, lambda idx: jnp.asarray(array[idx])
    )


def replicate_to_host(tree, mesh: Mesh):
    """Fetch a (possibly mesh-sharded) pytree to host numpy. Multi-process:
    leaves sharded over non-addressable devices cannot be read directly, so
    a jitted identity with replicated out-shardings inserts the all-gather
    first; every process then reads its local replicated copy."""
    if jax.process_count() > 1:
        gather = jax.jit(lambda t: t, out_shardings=NamedSharding(mesh, P()))
        tree = gather(tree)
    return jax.tree.map(lambda x: np.asarray(x), tree)


def initialize_multihost(coordinator_address: Optional[str] = None, **kwargs) -> None:
    """Multi-host process bootstrap (no-op if already initialized). In a real
    pod deployment each host calls this before building the mesh.

    Only two failure classes are swallowed: 'already initialized' and the
    auto-detection errors of an argument-less single-process call. A real
    bootstrap failure with an explicit coordinator (bad address, timeout)
    re-raises — silently degrading to independent single-host runs would
    train D different wrong models."""
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address, **kwargs)
    except (RuntimeError, ValueError) as e:
        already = "already" in str(e).lower()
        if already or (coordinator_address is None and not kwargs):
            print(f"jax.distributed.initialize skipped: {e}")
        else:
            raise
