#!/usr/bin/env python
"""Measure per-dispatch overhead and scan-batched matmul throughput."""
from __future__ import annotations
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

# dispatch overhead: trivial chained op
x = jnp.zeros((8, 128))
f = jax.jit(lambda x: x + 1)
for _ in range(3):
    x = f(x)
_ = np.asarray(x[0, 0])
t0 = time.perf_counter()
for _ in range(50):
    x = f(x)
_ = np.asarray(x[0, 0])
print(f"tiny chained dispatch: {(time.perf_counter()-t0)/50*1e3:.3f} ms/call")

# scan-batched matmul: K matmuls inside one jit
M = K_ = N = 8192
a = jax.random.normal(jax.random.key(0), (M, K_), jnp.bfloat16)
b = jax.random.normal(jax.random.key(1), (K_, N), jnp.bfloat16)
STEPS = 30

@jax.jit
def many(a, b):
    def body(x, _):
        y = jnp.dot(x, b, preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        return y * (1.0 / 96.0), None
    out, _ = jax.lax.scan(body, a, None, length=STEPS)
    return out

out = many(a, b)
_ = np.asarray(out[0, 0])
t0 = time.perf_counter()
reps = 3
for _ in range(reps):
    out = many(a, b)
_ = np.asarray(out[0, 0])
dt = (time.perf_counter() - t0) / (reps * STEPS)
print(f"scan-batched matmul: {dt*1e3:.3f} ms/matmul  {2*M*K_*N/dt/1e12:.1f} TF/s")
