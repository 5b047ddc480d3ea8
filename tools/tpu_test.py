#!/usr/bin/env python3
"""Hardware smoke check (the reference's misc/gpu_test.py, TPU edition):
prints the backend, device list, and times one MXU matmul."""

import time

import jax
import jax.numpy as jnp

print(f"backend: {jax.default_backend()}")
print(f"devices: {jax.devices()}")
import numpy as np

x = jnp.ones((1024, 1024), jnp.bfloat16)
f = jax.jit(lambda a: jnp.sum(jnp.dot(a, a, preferred_element_type=jnp.float32)))
t0 = time.time()
np.asarray(f(x))  # includes compilation
print(f"compile + first matmul: {(time.time() - t0) * 1000:.0f} ms")
t0 = time.time()
np.asarray(f(x))
print(f"warm matmul + fetch round-trip: {(time.time() - t0) * 1000:.1f} ms")
