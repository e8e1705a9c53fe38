#!/usr/bin/env python
"""Benchmark trilinear_rays (the coherent grid kernel) against the pure
z-pair gather path at render scale: a realistic 400x400 camera orbiting a
128^3 x 28 grid, rays in 8x8 pixel blocks, hierarchical-scale sample
counts. Prints fits-fraction, per-call times and rays/s for both paths.

Timings follow the axon rules: chained calls, scalar fetched at stop.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from nerf_tpu.ops.interp import trilinear
from nerf_tpu.ops.pallas.fused_grid import (
    _coherent_channels, tile_ray_order, trilinear_rays,
)

H = W = int(os.environ.get("GK_RES", 400))
S = int(os.environ.get("GK_SAMPLES", 192))
R = 128
C = 28
CHUNK = int(os.environ.get("GK_CHUNK", 8192))
NEAR, FAR = 2.0, 6.0


def camera_rays(h, w, focal_px, radius=4.0):
    i, j = np.meshgrid(np.arange(w), np.arange(h), indexing="xy")
    dirs = np.stack(
        [(i - w * 0.5) / focal_px, -(j - h * 0.5) / focal_px, -np.ones_like(i)],
        axis=-1,
    ).astype(np.float32)
    # camera at +z looking at origin (c2w = identity rotation, origin z=radius)
    o = np.array([0.0, 0.0, radius], np.float32)
    d = dirs.reshape(-1, 3)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return np.broadcast_to(o, d.shape).copy(), d


def main():
    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)
    grid = jnp.asarray(rng.normal(size=(R, R, R, C)).astype(np.float32))

    focal = 0.5 * W / np.tan(0.5 * 0.6911)   # lego-ish fov
    rays_o, rays_d = camera_rays(H, W, focal)
    perm = tile_ray_order(H, W, 8)
    rays_o, rays_d = rays_o[perm], rays_d[perm]

    t = np.linspace(NEAR, FAR, S, dtype=np.float32)
    pts = rays_o[:, None, :] + t[None, :, None] * rays_d[:, None, :]
    # the renderer's componentwise [near,far] -> [-1,1] normalization
    pts = 2.0 * (pts - NEAR) / (FAR - NEAR) - 1.0
    pts = np.clip(pts, -1.0, 1.0).astype(np.float32)

    n_rays = pts.shape[0]
    n_chunks = n_rays // CHUNK
    pts_j = jnp.asarray(pts[: n_chunks * CHUNK].reshape(n_chunks, CHUNK, S, 3))
    print(f"{n_rays} rays, S={S}, {n_chunks} chunks of {CHUNK}", flush=True)

    # fits fraction across chunks (diagnostic, not in the timed path)
    @jax.jit
    def all_fits(grid, pts_all):
        def one(p):
            _, f = _coherent_channels(grid, p, 64, 8, jnp.bfloat16,
                                      jax.lax.Precision.DEFAULT, False)
            return f
        return jax.lax.map(one, pts_all)

    fits = np.asarray(all_fits(grid, pts_j))
    print(f"fits: {fits.sum()}/{n_chunks} chunks", flush=True)

    def run_kernel(grid, pts_all):
        def body(c, p):
            o = trilinear_rays(grid, p + c, dtype="bfloat16")
            return 1e-12 * o[0, 0, :3], o[0, 0, 0]
        c, outs = jax.lax.scan(body, jnp.zeros((3,), jnp.float32), pts_all)
        return c[0] + outs.sum()

    def run_pure(grid, pts_all):
        def body(c, p):
            o = trilinear(grid, (p + c).reshape(-1, 3))
            return 1e-12 * o[0, :3], o[0, 0]
        c, outs = jax.lax.scan(body, jnp.zeros((3,), jnp.float32), pts_all)
        return c[0] + outs.sum()

    for name, fn in (("kernel", run_kernel), ("pure", run_pure)):
        if name == "pure" and os.environ.get("GK_SKIP_PURE"):
            continue
        f = jax.jit(fn)
        t0 = time.perf_counter()
        o = f(grid, pts_j)
        float(np.asarray(o))
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        o = f(grid, pts_j)
        float(np.asarray(o))
        dt = time.perf_counter() - t0
        rays_s = n_chunks * CHUNK / dt
        print(f"{name:8s}: {dt*1e3:9.2f} ms/image-eq  "
              f"{rays_s/1e3:8.1f}k rays/s  (compile {compile_s:.0f}s)",
              flush=True)

    # numerical check on one chunk
    a = np.asarray(jax.jit(
        lambda g, p: trilinear_rays(g, p, dtype="bfloat16"))(grid, pts_j[0]))
    b = np.asarray(jax.jit(
        lambda g, p: trilinear(g, p.reshape(-1, 3)))(grid, pts_j[0])
    ).reshape(CHUNK, S, C)
    rel = np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-9)
    print(f"bf16 kernel vs pure: max rel err {rel:.2e}", flush=True)


if __name__ == "__main__":
    main()
