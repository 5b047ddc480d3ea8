"""dtype / precision policy helpers.

On TPU the MXU multiplies f32 operands in bf16 by default (3 passes needed
for full f32). When the configured ``compute_dtype`` is float32 the user is
asking for true f32 numerics, so we must request ``Precision.HIGHEST``
explicitly; for bfloat16 compute the default single-pass path is exactly
what we want.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def matmul_precision(compute_dtype) -> jax.lax.Precision:
    if jnp.dtype(compute_dtype) == jnp.float32:
        return jax.lax.Precision.HIGHEST
    return jax.lax.Precision.DEFAULT


def fast_bernoulli(rng: "jax.Array", p: float, shape) -> "jax.Array":
    """Bernoulli(p) mask using the TPU-native ``rbg`` generator.

    ``threefry`` (JAX's default PRNG) costs real VPU time for the large
    dropout masks in the hot train step; ``rbg`` maps to the hardware RNG.
    The incoming (threefry) key only seeds the rbg key — one tiny draw —
    so determinism-given-key is preserved.
    """
    import jax
    import jax.numpy as jnp

    data = jax.random.bits(rng, (4,), jnp.uint32)
    fast = jax.random.wrap_key_data(data, impl="rbg")
    return jax.random.bernoulli(fast, p, shape)
