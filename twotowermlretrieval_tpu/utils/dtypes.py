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
