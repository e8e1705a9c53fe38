#!/usr/bin/env python
"""Microbenchmark the fused field kernels vs the pure-JAX path.

Times (a) fused forward, (b) fused forward+backward (jax.grad), and
(c) the full train step, reporting ms/iter and achieved TFLOP/s against
the analytic matmul FLOP count, so kernel tuning has a denominator.

Usage: python tools/microbench_kernels.py [N_POINTS]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from nerf_tpu.models import NeRFModel
from nerf_tpu.ops.pallas.fused_nerf import make_fused_nerf_apply


def timeit(fn, *args, iters=30, warmup=5):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024 * 256
    model = NeRFModel(compute_dtype="bfloat16")
    params = model.init(jax.random.key(0))
    pts = jax.random.uniform(jax.random.key(1), (n, 3), minval=-1, maxval=1)
    dirs = jax.random.normal(jax.random.key(2), (n, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)

    h, p_pad, d_pad = 256, 64, 32
    mm_cols = (p_pad * h + 4 * h * h) + ((h + p_pad) * h + 3 * h * h) \
        + (h * h + h) + ((h + d_pad) * (h // 2) + (h // 2) * 8)
    fwd_flops = 2 * n * mm_cols

    for label, apply_fn in [
        ("pallas", make_fused_nerf_apply(model)),
        ("pure", lambda p, x, d: model.apply(p, x, d)),
    ]:
        f = jax.jit(lambda p, x, d: apply_fn(p, x, d)[0].sum() + apply_fn(p, x, d)[1].sum())
        fwd_only = jax.jit(lambda p, x, d: apply_fn(p, x, d))
        g = jax.jit(jax.grad(lambda p, x, d: sum(
            jnp.sum(o) for o in apply_fn(p, x, d))))

        dt_f = timeit(fwd_only, params, pts, dirs)
        dt_g = timeit(g, params, pts, dirs)
        print(f"[{label}] fwd : {dt_f*1e3:8.3f} ms  {fwd_flops/dt_f/1e12:6.2f} TF/s")
        print(f"[{label}] f+b : {dt_g*1e3:8.3f} ms  {4*fwd_flops/dt_g/1e12:6.2f} TF/s (4x fwd flops: fwd+recompute+2x bwd)")


if __name__ == "__main__":
    main()
