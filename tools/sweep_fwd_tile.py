#!/usr/bin/env python
"""Sweep fused-NeRF forward/backward tile sizes on the current device."""
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

    for tile_fwd in (512, 1024, 2048, 4096, 8192):
        for tile_bwd in (256, 512):
            if tile_fwd % tile_bwd:
                continue
            apply_fn = make_fused_nerf_apply(model, tile_fwd=tile_fwd, tile_bwd=tile_bwd)
            fwd_only = jax.jit(lambda p, x, d: apply_fn(p, x, d))
            g = jax.jit(jax.grad(lambda p, x, d: sum(jnp.sum(o) for o in apply_fn(p, x, d))))
            dt_f = timeit(fwd_only, params, pts, dirs)
            dt_g = timeit(g, params, pts, dirs)
            dt_b = dt_g - dt_f
            print(
                f"tf={tile_fwd:5d} tb={tile_bwd:4d}  fwd {dt_f*1e3:7.3f} ms "
                f"{fwd_flops/dt_f/1e12:6.1f} TF/s | f+b {dt_g*1e3:7.3f} ms | "
                f"bwd-only {dt_b*1e3:7.3f} ms {3*fwd_flops/dt_b/1e12:6.1f} TF/s",
                flush=True,
            )


if __name__ == "__main__":
    main()
