#!/usr/bin/env python
"""Decide the in-VMEM gather strategy for the grid-family render kernel.

The XLA render path for grid families is gather-rate-bound (~46k rays/s,
docs/STATUS.md). The planned kernel DMAs a brick of grid cells per
(ray-tile, depth-segment) and interpolates in VMEM. This script probes the
three candidate in-VMEM gather mechanisms plus the brick DMA itself:

  taa_lane_W    jnp.take_along_axis(src (32, W), idx (32, S), axis=1)
                inside a kernel — lane-dynamic gather at width W.
                If this works at W=4096 and runs near VPU speed, the
                brick can live transposed (C sublanes x cells lanes).
  taa_sublane   axis=0 variant (gather across sublanes).
  tent_matmul   trilinear-as-matmul: dense (S, cells) tent-weight matrix
                (built elementwise in ONE pass) x brick (cells, C) on the
                MXU. Always available; cost scales with brick size.
  brick_dma     dynamic-origin (B, B, B*C) copy out of an HBM-resident
                (128, 128, 128*C) grid — sustained GB/s over many bricks.

Timings are chained + amortized (axon tunnel rules, see
[tools/microbench_gather.py] and the axon memory notes).
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

REPS = 64


def report(name, ok, detail=""):
    print(f"{name:16s}: {'OK  ' if ok else 'FAIL'} {detail}", flush=True)


def probe(name, build):
    try:
        return build()
    except Exception as e:  # noqa: BLE001
        msg = str(e).split("\n")[0][:150]
        report(name, False, f"{type(e).__name__}: {msg}")
        return None


def time_kernel(fn, *args):
    """Chained in-jit REPS timing; returns seconds per rep."""
    f = jax.jit(fn)
    o = f(*args)
    float(np.asarray(o).reshape(-1)[0])
    t0 = time.perf_counter()
    o = f(*args)
    float(np.asarray(o).reshape(-1)[0])
    return (time.perf_counter() - t0) / REPS


def probe_taa_lane(width, s_out):
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.normal(size=(32, width)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, width, (32, s_out)).astype(np.int32))

    def kernel(s_ref, i_ref, o_ref):
        def body(k, acc):
            g = jnp.take_along_axis(s_ref[:], i_ref[:] + k - k, axis=1)
            return acc + g
        o_ref[:] = jax.lax.fori_loop(0, REPS, body,
                                     jnp.zeros((32, s_out), jnp.float32))

    def build():
        out = pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((32, s_out), jnp.float32),
        )(src, idx)
        want = REPS * np.take_along_axis(np.asarray(src), np.asarray(idx), 1)
        err = np.max(np.abs(np.asarray(out) - want))
        assert err == 0.0, f"wrong values, err={err}"
        dt = time_kernel(
            lambda a, b: pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((32, s_out), jnp.float32))(a, b),
            src, idx)
        el = 32 * s_out
        report(f"taa_lane_{width}", True,
               f"{dt*1e6:8.2f} us/gather of ({32},{s_out}) "
               f"= {el/dt/1e9:6.2f} Gelem/s")
        return dt
    return probe(f"taa_lane_{width}", build)


def probe_taa_sublane():
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.normal(size=(512, 128)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, 512, (256, 128)).astype(np.int32))

    def kernel(s_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(s_ref[:], i_ref[:], axis=0)

    def build():
        out = pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((256, 128), jnp.float32),
        )(src, idx)
        want = np.take_along_axis(np.asarray(src), np.asarray(idx), 0)
        err = np.max(np.abs(np.asarray(out) - want))
        assert err == 0.0, f"wrong values, err={err}"
        report("taa_sublane", True, "(512,128) src -> (256,128)")
        return True
    return probe("taa_sublane", build)


def probe_tent_matmul(s=512, cells=4096, c_pad=32):
    """One elementwise pass builds the (S, cells) trilinear weight matrix
    (separable tent product over iota-derived cell coords), then MXU
    contracts it with the brick. Reports us per (S=512, 16^3) block."""
    rng = np.random.default_rng(0)
    b = 16
    brick = jnp.asarray(rng.normal(size=(cells, c_pad)).astype(np.float32))
    # local continuous coords in [0, 15]
    pts = jnp.asarray(rng.uniform(0, b - 1, (s, 3)).astype(np.float32))

    def kernel(b_ref, p_ref, o_ref):
        jz = jax.lax.broadcasted_iota(jnp.float32, (s, cells), 1) % b
        jy = (jax.lax.broadcasted_iota(jnp.float32, (s, cells), 1) // b) % b
        jx = jax.lax.broadcasted_iota(jnp.float32, (s, cells), 1) // (b * b)
        px = p_ref[:, 0][:, None]
        py = p_ref[:, 1][:, None]
        pz = p_ref[:, 2][:, None]
        w = (jnp.maximum(0.0, 1.0 - jnp.abs(px - jx))
             * jnp.maximum(0.0, 1.0 - jnp.abs(py - jy))
             * jnp.maximum(0.0, 1.0 - jnp.abs(pz - jz)))

        def body(k, acc):
            return acc + jax.lax.dot(
                w, b_ref[:], precision=jax.lax.Precision.DEFAULT)
        o_ref[:] = jax.lax.fori_loop(0, REPS, body,
                                     jnp.zeros((s, c_pad), jnp.float32))

    def build():
        out = pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((s, c_pad), jnp.float32),
        )(brick, pts)
        # reference trilinear
        g = np.asarray(brick).reshape(b, b, b, c_pad)
        p = np.asarray(pts)
        x0 = np.clip(np.floor(p).astype(int), 0, b - 2)
        f = p - x0
        want = 0.0
        for dx in (0, 1):
            for dy in (0, 1):
                for dz in (0, 1):
                    wgt = ((f[:, 0] if dx else 1 - f[:, 0])
                           * (f[:, 1] if dy else 1 - f[:, 1])
                           * (f[:, 2] if dz else 1 - f[:, 2]))
                    want = want + wgt[:, None] * g[x0[:, 0] + dx,
                                                   x0[:, 1] + dy,
                                                   x0[:, 2] + dz]
        err = np.max(np.abs(np.asarray(out) / REPS - want))
        assert err < 2e-2, f"tent interp wrong, err={err}"
        dt = time_kernel(
            lambda a, b_: pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((s, c_pad), jnp.float32))(a, b_),
            brick, pts)
        report("tent_matmul", True,
               f"{dt*1e6:8.2f} us/block (S={s}, {cells} cells) "
               f"err={err:.1e} -> {s/dt/1e6:6.1f} Msamples/s/core")
        return dt
    return probe("tent_matmul", build)


def probe_brick_dma(b=16, c=32, n_bricks=64):
    """Stream n_bricks random-origin (b, b, b*c) bricks from an HBM grid,
    reduce each to keep it live. Reports sustained GB/s."""
    rng = np.random.default_rng(0)
    r = 128
    grid = jnp.asarray(rng.normal(size=(r, r, r * c)).astype(np.float32))
    orgs = jnp.asarray(
        np.stack([rng.integers(0, r - b, n_bricks),
                  rng.integers(0, r - b, n_bricks),
                  rng.integers(0, r - b, n_bricks)], axis=-1).astype(np.int32))

    def kernel(org_ref, g_ref, o_ref, scratch, sem):
        i = pl.program_id(0)
        x0 = org_ref[i, 0]
        y0 = org_ref[i, 1]
        z0 = org_ref[i, 2]
        dma = pltpu.make_async_copy(
            g_ref.at[pl.ds(x0, b), pl.ds(y0, b), pl.ds(z0 * c, b * c)],
            scratch, sem)
        dma.start()
        dma.wait()
        o_ref[:] = jnp.sum(scratch[:], axis=(1,)).reshape(b, b * c)[:8, :128]

    def build():
        fn = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(n_bricks,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
                out_specs=pl.BlockSpec((8, 128), lambda i, s: (0, 0),
                                       memory_space=pltpu.VMEM),
                scratch_shapes=[
                    pltpu.VMEM((b, b, b * c), jnp.float32),
                    pltpu.SemaphoreType.DMA(()),
                ],
            ),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        )
        out = jax.jit(fn)(orgs, grid)
        g = np.asarray(grid)
        o = np.asarray(orgs[-1])
        want = g[o[0]:o[0] + b, o[1]:o[1] + b,
                 o[2] * c:(o[2] + b) * c].sum(axis=1)[:8, :128]
        err = np.max(np.abs(np.asarray(out) - want))
        assert err < 1e-3, f"brick values wrong, err={err}"

        f = jax.jit(fn)
        t0 = time.perf_counter()
        o2 = f(orgs, grid)
        float(np.asarray(o2).reshape(-1)[0])
        dt = (time.perf_counter() - t0)
        byts = n_bricks * b * b * b * c * 4
        report(f"brick_dma_{b}", True,
               f"{dt*1e3:8.3f} ms for {n_bricks} bricks "
               f"({byts/1e6:.1f} MB) = {byts/dt/1e9:6.1f} GB/s")
        return dt
    return probe(f"brick_dma_{b}", build)


def main():
    print(f"devices: {jax.devices()}", flush=True)
    probe_taa_sublane()
    for w in (128, 512, 4096):
        probe_taa_lane(w, 512)
    probe_tent_matmul()
    probe_brick_dma(16, 32)
    probe_brick_dma(8, 32, n_bricks=256)


if __name__ == "__main__":
    main()
