#!/usr/bin/env python
"""Probe the EXACT building blocks of the planned fused grid-render kernel.

Design under test (docs/STATUS.md round-3 lever #3): grid repacked to
(n_blocks * 512, 32) rows where an aligned 8^3 sub-brick of a (128^3, C<=31)
voxel grid is 512 CONSECUTIVE rows; kernel = 1D pallas grid over ray tiles;
in-kernel loop over depth segments; per segment DMA the 2x2x2 sub-brick
window (8 dynamic sublane-origin copies of (512, 32)) and contract a
separable tent-weight matrix (S, 512) x (512, 32) per sub-brick on the MXU.

  dyn_row_dma    dynamic 512-row-aligned sublane-origin DMA (HBM->VMEM)
  tent_expand    pltpu.repeat + 0/1-matmul expansions building (S,512)
                 tent weights from per-axis (S,8) tents; checks exact
                 trilinear vs numpy
  seg_loop_*     the whole per-tile segment loop at realistic shape:
                 TR=64 rays x G=32 segments x S_seg=6 samples, 8 sub-brick
                 DMAs + 8 matmuls per segment; reports us/segment and
                 projected rays/s
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


def report(name, ok, detail=""):
    print(f"{name:14s}: {'OK  ' if ok else 'FAIL'} {detail}", flush=True)


def probe(name, build):
    try:
        return build()
    except Exception as e:  # noqa: BLE001
        msg = str(e).split("\n")[0][:150]
        report(name, False, f"{type(e).__name__}: {msg}")
        return None


def _col(p8, lane):
    """Lane-mask reduce a (S, 8) pad block to the (S, 1) column ``lane``."""
    l8 = jax.lax.broadcasted_iota(jnp.int32, p8.shape, 1)
    return jnp.sum(jnp.where(l8 == lane, p8, 0.0), axis=1, keepdims=True)


# ---------------------------------------------------------------- dyn DMA

def probe_dyn_row_dma():
    rng = np.random.default_rng(0)
    nblk = 256
    table = jnp.asarray(rng.normal(size=(nblk * 512, 32)).astype(np.float32))
    blks = jnp.asarray(rng.integers(0, nblk, (64,)).astype(np.int32))

    def kernel(blk_ref, tbl_ref, o_ref, scratch, sem):
        acc = jnp.zeros((8, 32), jnp.float32)

        def body(i, acc):
            b = blk_ref[i]
            dma = pltpu.make_async_copy(
                tbl_ref.at[pl.ds(b * 512, 512), :], scratch, sem)
            dma.start()
            dma.wait()
            return acc + scratch[:8, :]

        o_ref[:] = jax.lax.fori_loop(0, 64, body, acc)

    def build():
        fn = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(1,),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
                out_specs=pl.BlockSpec((8, 32), lambda i, s: (0, 0),
                                       memory_space=pltpu.VMEM),
                scratch_shapes=[
                    pltpu.VMEM((512, 32), jnp.float32),
                    pltpu.SemaphoreType.DMA(()),
                ],
            ),
            out_shape=jax.ShapeDtypeStruct((8, 32), jnp.float32),
        )
        out = jax.jit(fn)(blks, table)
        t = np.asarray(table)
        want = sum(t[int(b) * 512:int(b) * 512 + 8, :] for b in np.asarray(blks))
        err = np.max(np.abs(np.asarray(out) - want))
        assert err < 1e-4, f"values wrong, err={err}"
        report("dyn_row_dma", True, f"err={err:.1e} (64 serial 64KB copies)")
        return True
    return probe("dyn_row_dma", build)


# ------------------------------------------------------------ tent expand

def _expand_consts():
    """0/1 expansion matrices: local cell l = lx*64 + ly*8 + lz."""
    ex = np.zeros((8, 512), np.float32)
    for x in range(8):
        ex[x, x * 64:(x + 1) * 64] = 1.0
    ey = np.zeros((8, 64), np.float32)
    for y in range(8):
        ey[y, y * 8:(y + 1) * 8] = 1.0
    return jnp.asarray(ex), jnp.asarray(ey)


def _tent_weights(px, py, pz, ex, ey, s):
    """(S,512) trilinear weights of (S,1) local coords against the 8^3
    sub-brick at the origin. Tent = max(0, 1-|p - cell|) per axis; the
    product over axes is exact trilinear for cells inside the brick."""
    hp = jax.lax.Precision.HIGHEST
    l8 = jax.lax.broadcasted_iota(jnp.float32, (s, 8), 1)
    wx = jnp.maximum(0.0, 1.0 - jnp.abs(px - l8))     # (S,8)
    wy = jnp.maximum(0.0, 1.0 - jnp.abs(py - l8))
    wz = jnp.maximum(0.0, 1.0 - jnp.abs(pz - l8))
    wx_e = jax.lax.dot(wx, ex, precision=hp)          # (S,512)
    wy_e = pltpu.repeat(jax.lax.dot(wy, ey, precision=hp), 8, axis=1)
    wz_e = pltpu.repeat(wz, 64, axis=1)
    return wx_e * wy_e * wz_e


def _np_trilinear(brick, p):
    g = brick.reshape(8, 8, 8, 32)
    x0 = np.clip(np.floor(p).astype(int), 0, 6)
    f = p - x0
    want = 0.0
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                wgt = ((f[:, 0] if dx else 1 - f[:, 0])
                       * (f[:, 1] if dy else 1 - f[:, 1])
                       * (f[:, 2] if dz else 1 - f[:, 2]))
                want = want + wgt[:, None] * g[x0[:, 0] + dx, x0[:, 1] + dy,
                                               x0[:, 2] + dz]
    return want


def probe_tent_expand():
    rng = np.random.default_rng(1)
    s = 384
    brick = jnp.asarray(rng.normal(size=(512, 32)).astype(np.float32))
    pts = np.zeros((s, 8), np.float32)
    pts[:, :3] = rng.uniform(0.5, 6.5, (s, 3))
    pts_j = jnp.asarray(pts)
    ex, ey = _expand_consts()

    def kernel(b_ref, p_ref, o_ref):
        p8 = p_ref[:]
        w = _tent_weights(_col(p8, 0), _col(p8, 1), _col(p8, 2), ex, ey, s)
        o_ref[:] = jax.lax.dot(w, b_ref[:],
                               precision=jax.lax.Precision.HIGHEST)

    def build():
        out = pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((s, 32), jnp.float32),
        )(brick, pts_j)
        want = _np_trilinear(np.asarray(brick), pts[:, :3])
        err = np.max(np.abs(np.asarray(out) - want))
        assert err < 1e-4, f"tent interp wrong, err={err}"
        report("tent_expand", True, f"max err vs numpy trilinear = {err:.2e}")
        return True
    return probe("tent_expand", build)


# --------------------------------------------------------- seg loop perf

def probe_seg_loop(tr=64, g_segs=32, s_seg=6, n_tiles=40, use_bf16=True):
    """Realistic inner loop: per pallas-grid step (one ray tile), loop over
    g_segs segments; each segment DMAs 8 sub-bricks and runs 8 tent matmuls
    for its tr*s_seg samples. Origins/blocks are random (worst locality)."""
    rng = np.random.default_rng(2)
    nblk = 4096
    sdim = tr * s_seg
    table = jnp.asarray(rng.normal(size=(nblk * 512, 32)).astype(np.float32))
    blks = jnp.asarray(
        rng.integers(0, nblk, (n_tiles, g_segs * 8)).astype(np.int32))
    pts = np.zeros((n_tiles * sdim, 8), np.float32)
    pts[:, :3] = rng.uniform(0.5, 6.5, (n_tiles * sdim, 3))
    pts_j = jnp.asarray(pts)
    ex, ey = _expand_consts()
    cdt = jnp.bfloat16 if use_bf16 else jnp.float32
    name = f"seg_loop_{'bf16' if use_bf16 else 'f32'}"

    def kernel(blk_ref, p_ref, tbl_ref, o_ref, scr, sems):
        i = pl.program_id(0)
        p8 = p_ref[:]
        acc = jnp.zeros((sdim, 32), jnp.float32)

        def seg(j, acc):
            # fresh tent weights per segment (origins differ per segment in
            # the real kernel; here same coords re-used, same cost)
            w = _tent_weights(_col(p8, 0), _col(p8, 1), _col(p8, 2),
                              ex, ey, sdim).astype(cdt)

            def sub(k, acc):
                b = blk_ref[i, j * 8 + k]
                dma = pltpu.make_async_copy(
                    tbl_ref.at[pl.ds(b * 512, 512), :], scr, sems)
                dma.start()
                dma.wait()
                return acc + jax.lax.dot(
                    w, scr[:].astype(cdt),
                    preferred_element_type=jnp.float32)
            return jax.lax.fori_loop(0, 8, sub, acc)

        o_ref[:] = jax.lax.fori_loop(0, g_segs, seg, acc)

    def build():
        fn = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(n_tiles,),
                in_specs=[
                    pl.BlockSpec((sdim, 8), lambda i, s: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pl.ANY),
                ],
                out_specs=pl.BlockSpec((sdim, 32), lambda i, s: (i, 0),
                                       memory_space=pltpu.VMEM),
                scratch_shapes=[
                    pltpu.VMEM((512, 32), jnp.float32),
                    pltpu.SemaphoreType.DMA(()),
                ],
            ),
            out_shape=jax.ShapeDtypeStruct((n_tiles * sdim, 32), jnp.float32),
        )

        def run(blks, pts, table):
            def body(p, _):
                o = fn(blks, p, table)
                return p + 1e-12 * o[:1, :8], o[0, 0]
            q, outs = jax.lax.scan(body, pts, None, length=4)
            return q[0, 0] + outs.sum()

        f = jax.jit(run)
        o = f(blks, pts_j, table)
        float(np.asarray(o))
        t0 = time.perf_counter()
        o = f(blks, pts_j, table)
        float(np.asarray(o))
        dt = (time.perf_counter() - t0) / 4
        n_steps = n_tiles * g_segs
        us_seg = dt / n_steps * 1e6
        rays_s = n_tiles * tr / dt
        report(name, True,
               f"{dt*1e3:7.2f} ms/call  {us_seg:6.2f} us/segment  "
               f"-> {rays_s/1e3:8.0f}k rays/s (S={g_segs*s_seg}/ray)")
        return dt
    return probe(name, build)


def main():
    print(f"devices: {jax.devices()}", flush=True)
    probe_dyn_row_dma()
    probe_tent_expand()
    probe_seg_loop(use_bf16=True)
    probe_seg_loop(use_bf16=False)


if __name__ == "__main__":
    main()
