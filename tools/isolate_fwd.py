#!/usr/bin/env python
"""Isolate what limits the fused forward kernel: chained matmuls only,
matmuls+relu, matmuls+encode, full forward."""
from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(fn, *args, iters=30, warmup=5):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


N = 262144
H = 256
L = 11  # matmul chain length


def run(tile, mode, acts_f32):
    ws = [jax.random.normal(jax.random.key(i), (H, H), jnp.bfloat16) * 0.05
          for i in range(L)]
    x0 = jax.random.normal(jax.random.key(99), (N, H),
                           jnp.float32 if acts_f32 else jnp.bfloat16)

    def kernel(x_ref, *refs):
        w_refs, out_ref = refs[:-1], refs[-1]
        h = x_ref[:]
        for i in range(L):
            z = jnp.dot(h.astype(jnp.bfloat16), w_refs[i][:],
                        preferred_element_type=jnp.float32)
            if mode == "relu":
                z = jax.nn.relu(z)
            elif mode == "sin":
                z = jnp.sin(z)
            h = z if acts_f32 else z.astype(jnp.bfloat16)
        out_ref[:] = h.astype(out_ref.dtype)

    spec_x = pl.BlockSpec((tile, H), lambda i: (i, 0), memory_space=pltpu.VMEM)
    spec_w = pl.BlockSpec((H, H), lambda i: (0, 0), memory_space=pltpu.VMEM)

    f = jax.jit(lambda x, *w: pl.pallas_call(
        kernel,
        grid=(N // tile,),
        in_specs=[spec_x] + [spec_w] * L,
        out_specs=spec_x,
        out_shape=jax.ShapeDtypeStruct((N, H), x0.dtype),
    )(x, *w))
    dt = timeit(f, x0, *ws)
    fl = 2 * N * H * H * L
    print(f"tile={tile:5d} mode={mode:5s} f32acts={acts_f32}  "
          f"{dt*1e3:7.3f} ms  {fl/dt/1e12:6.1f} TF/s", flush=True)


for tile in (512, 1024, 2048):
    for mode in ("none", "relu", "sin"):
        run(tile, mode, True)
run(1024, "relu", False)
