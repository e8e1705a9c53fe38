#!/usr/bin/env python
"""Sanity-check timing modes against a known-peak XLA matmul on axon."""
from __future__ import annotations
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

M = K = N = 8192
a = jax.random.normal(jax.random.key(0), (M, K), jnp.bfloat16)
b = jax.random.normal(jax.random.key(1), (K, N), jnp.bfloat16)
fl = 2 * M * K * N

f = jax.jit(lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32))

# mode 1: block_until_ready on independent calls
for _ in range(3):
    out = f(a, b)
jax.block_until_ready(out)
t0 = time.perf_counter()
for _ in range(20):
    out = f(a, b)
jax.block_until_ready(out)
dt = (time.perf_counter() - t0) / 20
print(f"block_until_ready:   {dt*1e3:8.3f} ms  {fl/dt/1e12:8.1f} TF/s")

# mode 2: host fetch after loop
t0 = time.perf_counter()
for _ in range(20):
    out = f(a, b)
_ = np.asarray(out[0, 0])
dt = (time.perf_counter() - t0) / 20
print(f"fetch-after-loop:    {dt*1e3:8.3f} ms  {fl/dt/1e12:8.1f} TF/s")

# mode 3: chained dependency + final fetch
g = jax.jit(lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32)
            .astype(jnp.bfloat16))
x = a
for _ in range(3):
    x = g(x, b)
_ = np.asarray(x[0, 0])
x = a
t0 = time.perf_counter()
for _ in range(20):
    x = g(x, b)
_ = np.asarray(x[0, 0])
dt = (time.perf_counter() - t0) / 20
print(f"chained+fetch:       {dt*1e3:8.3f} ms  {fl/dt/1e12:8.1f} TF/s")
