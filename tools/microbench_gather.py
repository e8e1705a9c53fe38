#!/usr/bin/env python
"""What is the fastest way to read a trilinear stencil from a voxel grid
on this TPU?

The measured grid-family render wall (docs/STATUS.md) is XLA row-gathers
at ~51 ns/row from a 2.1M-row table. This bench compares, at render scale:

  flat8       - current ops/interp.py::trilinear: 8 independent flat
                row-gathers (N rows of C floats each)
  slice222    - ONE lax.gather fetching the whole (2,2,2,C) stencil per
                sample (8x fewer gather rows, 8x bigger each)
  slice_z2    - 4 gathers of (1,1,2,C) z-pairs (contiguous 2C-float rows)
  row1        - single flat gather (N rows) = per-row cost floor
  row1_small  - same from a 16k-row table (does table size matter?)

All timings chain iterations (axon tunnel elides unchained dispatches)
and are amortized over REPS in-jit repeats to kill dispatch overhead.
"""
from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

R = 128          # grid resolution
C = 28           # channels (plenoxels: 1 + 27 SH)
N = 262144       # samples per call (1024 rays x 256 samples)
REPS = 8         # in-jit chained repeats


def _coords(p, r):
    x = jnp.clip((p + 1.0) * 0.5 * (r - 1), 0.0, r - 1.0)
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, r - 2)
    return x0, x - x0


def flat8(grid, p):
    from nerf_tpu.ops.interp import trilinear
    return trilinear(grid, p)


def slice222(grid, p):
    """One gather op returning the full 2x2x2xC stencil per sample."""
    r = grid.shape[0]
    x0, f = _coords(p, r)
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3, 4),
        collapsed_slice_dims=(),
        start_index_map=(0, 1, 2),
    )
    corners = jax.lax.gather(
        grid, x0, dnums, slice_sizes=(2, 2, 2, grid.shape[-1]),
        mode=jax.lax.GatherScatterMode.CLIP,
    )  # (N, 2, 2, 2, C)
    wx = jnp.stack([1 - f[:, 0], f[:, 0]], -1)
    wy = jnp.stack([1 - f[:, 1], f[:, 1]], -1)
    wz = jnp.stack([1 - f[:, 2], f[:, 2]], -1)
    w = wx[:, :, None, None] * wy[:, None, :, None] * wz[:, None, None, :]
    return jnp.einsum("nxyz,nxyzc->nc", w, corners)


def slice_z2(grid, p):
    """4 gathers of contiguous z-pairs (rows of 2C floats)."""
    r = grid.shape[0]
    x0, f = _coords(p, r)
    flat = grid.reshape(-1, 2 * grid.shape[-1])  # pair z cells per row? no:
    # reshape (R,R,R,C) -> (R*R*R//2? ) not aligned; use gather with slice
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3, 4),
        collapsed_slice_dims=(),
        start_index_map=(0, 1, 2),
    )
    out = 0.0
    for dx in (0, 1):
        for dy in (0, 1):
            idx = x0 + jnp.array([dx, dy, 0], jnp.int32)
            pair = jax.lax.gather(
                grid, idx, dnums, slice_sizes=(1, 1, 2, grid.shape[-1]),
                mode=jax.lax.GatherScatterMode.CLIP,
            )[:, 0, 0]  # (N, 2, C)
            wz = jnp.stack([1 - f[:, 2], f[:, 2]], -1)
            v = jnp.einsum("nz,nzc->nc", wz, pair)
            w = ((f[:, 0] if dx else 1 - f[:, 0])
                 * (f[:, 1] if dy else 1 - f[:, 1]))
            out = out + w[:, None] * v
    return out


def row1(grid, p):
    r = grid.shape[0]
    x0, _ = _coords(p, r)
    flat = grid.reshape(-1, grid.shape[-1])
    idx = (x0[:, 0] * r + x0[:, 1]) * r + x0[:, 2]
    return flat[idx]


def bench(name, fn, grid, p, n_gather_rows):
    f = jax.jit(fn)
    out = f(grid, p)
    float(np.asarray(out).reshape(-1)[0])
    t0 = time.perf_counter()
    q = p
    for _ in range(6):
        o = f(grid, q)
        q = q + 1e-12 * o[:1, :3].reshape(1, 3)   # chain
    float(np.asarray(o).reshape(-1)[0])
    dt = (time.perf_counter() - t0) / 6
    ns_row = dt / n_gather_rows * 1e9
    print(f"{name:12s}: {dt*1e3:8.2f} ms/call   {ns_row:7.2f} ns/gather-row   "
          f"({N/dt/1e6:6.1f} Msamples/s)")
    return dt


def main():
    rng = np.random.default_rng(0)
    grid = jnp.asarray(rng.normal(size=(R, R, R, C)).astype(np.float32))
    p = jnp.asarray(rng.uniform(-1, 1, (N, 3)).astype(np.float32))

    # correctness of slice222 vs flat8
    a = np.asarray(jax.jit(flat8)(grid, p))
    b = np.asarray(jax.jit(slice222)(grid, p))
    print("slice222 max abs err vs flat8:", np.max(np.abs(a - b)))

    def rep(fn):
        def run(grid, p):
            def body(q, _):
                o = fn(grid, q)
                return q + 1e-12 * o[:1, :3].reshape(1, 3), o[0, 0]
            q, outs = jax.lax.scan(body, p, None, length=REPS)
            return q[:1] + outs.sum()
        return run

    for name, fn, rows in (
        ("row1", row1, N),
        ("flat8", flat8, 8 * N),
        ("slice222", slice222, N),
        ("slice_z2", slice_z2, 4 * N),
    ):
        f = jax.jit(rep(fn))
        o = f(grid, p)
        float(np.asarray(o).reshape(-1)[0])
        t0 = time.perf_counter()
        o = f(grid, p + 1e-9)
        float(np.asarray(o).reshape(-1)[0])
        dt = (time.perf_counter() - t0) / REPS
        print(f"{name:12s}: {dt*1e3:8.2f} ms/call  "
              f"{dt/rows*1e9:7.2f} ns/gather-row  ({N/dt/1e6:6.1f} Msamp/s)")

    # small table: does source size matter?
    small = jnp.asarray(rng.normal(size=(16384, C)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, 16384, N).astype(np.int32))

    def small_gather(tbl, i):
        def body(q, _):
            o = tbl[q]
            return (q + o[:1, 0].astype(jnp.int32) * 0) % 16384, o[0, 0]
        q, outs = jax.lax.scan(body, i, None, length=REPS)
        return outs.sum()

    f = jax.jit(small_gather)
    o = f(small, idx); float(np.asarray(o))
    t0 = time.perf_counter()
    o = f(small, idx); float(np.asarray(o))
    dt = (time.perf_counter() - t0) / REPS
    print(f"{'row1_small':12s}: {dt*1e3:8.2f} ms/call  "
          f"{dt/N*1e9:7.2f} ns/gather-row")


if __name__ == "__main__":
    main()


def slice_yz(grid, p):
    """2 gathers of (1,2,2,C) yz-quads (z contiguous, y one stride)."""
    r = grid.shape[0]
    x0, f = _coords(p, r)
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3, 4),
        collapsed_slice_dims=(),
        start_index_map=(0, 1, 2),
    )
    out = 0.0
    for dx in (0, 1):
        idx = x0 + jnp.array([dx, 0, 0], jnp.int32)
        quad = jax.lax.gather(
            grid, idx, dnums, slice_sizes=(1, 2, 2, grid.shape[-1]),
            mode=jax.lax.GatherScatterMode.CLIP,
        )[:, 0]  # (N, 2, 2, C)
        wy = jnp.stack([1 - f[:, 1], f[:, 1]], -1)
        wz = jnp.stack([1 - f[:, 2], f[:, 2]], -1)
        v = jnp.einsum("ny,nz,nyzc->nc", wy, wz, quad)
        w = f[:, 0] if dx else 1 - f[:, 0]
        out = out + w[:, None] * v
    return out


def extra():
    rng = np.random.default_rng(0)
    grid = jnp.asarray(rng.normal(size=(R, R, R, C)).astype(np.float32))
    p = jnp.asarray(rng.uniform(-1, 1, (N, 3)).astype(np.float32))
    a = np.asarray(jax.jit(flat8)(grid, p))
    b = np.asarray(jax.jit(slice_yz)(grid, p))
    print("slice_yz max abs err:", np.max(np.abs(a - b)))

    def rep(fn):
        def run(grid, p):
            def body(q, _):
                o = fn(grid, q)
                return q + 1e-12 * o[:1, :3].reshape(1, 3), o[0, 0]
            q, outs = jax.lax.scan(body, p, None, length=REPS)
            return q[:1] + outs.sum()
        return run

    for name, fn, rows in (("slice_yz", slice_yz, 2 * N),
                           ("slice_z2", slice_z2, 4 * N)):
        f = jax.jit(rep(fn))
        o = f(grid, p); float(np.asarray(o).reshape(-1)[0])
        t0 = time.perf_counter()
        o = f(grid, p + 1e-9); float(np.asarray(o).reshape(-1)[0])
        dt = (time.perf_counter() - t0) / REPS
        print(f"{name:12s}: {dt*1e3:8.2f} ms/call  "
              f"{dt/rows*1e9:7.2f} ns/gather-row  ({N/dt/1e6:6.1f} Msamp/s)")
