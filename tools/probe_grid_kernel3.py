#!/usr/bin/env python
"""Variants of the dynamic sublane-origin row DMA (HBM -> VMEM scratch),
isolating what makes probe_grid_kernel2's dyn_row_dma hit an internal
Mosaic compile error. One variant per run stage; each prints OK/FAIL.

  v1_single     one DMA, origin from a prefetched scalar, no loop
  v2_loop       64 DMAs in a fori_loop (the failing shape)
  v3_any        v1 with pl.ANY instead of pltpu.HBM memory space
  v4_noprefetch v1 with the block id coming from an SMEM input instead of
                scalar prefetch
  v5_static     control: STATIC origin DMA (no dynamic index at all)
"""
from __future__ import annotations

import os
import sys

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
        msg = str(e).split("\n")[0][:140]
        report(name, False, f"{type(e).__name__}: {msg}")
        return None


rng = np.random.default_rng(0)
NBLK = 64
TABLE = jnp.asarray(rng.normal(size=(NBLK * 512, 32)).astype(np.float32))
TNP = np.asarray(TABLE)


def run_one(name, mem_space, use_loop):
    blks = jnp.asarray(rng.integers(0, NBLK, (64,)).astype(np.int32))

    def kernel(blk_ref, tbl_ref, o_ref, scratch, sem):
        if use_loop:
            def body(i, acc):
                dma = pltpu.make_async_copy(
                    tbl_ref.at[pl.ds(blk_ref[i] * 512, 512), :], scratch, sem)
                dma.start()
                dma.wait()
                return acc + scratch[:8, :]
            o_ref[:] = jax.lax.fori_loop(
                0, 64, body, jnp.zeros((8, 32), jnp.float32))
        else:
            dma = pltpu.make_async_copy(
                tbl_ref.at[pl.ds(blk_ref[0] * 512, 512), :], scratch, sem)
            dma.start()
            dma.wait()
            o_ref[:] = scratch[:8, :]

    def build():
        fn = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(1,),
                in_specs=[pl.BlockSpec(memory_space=mem_space)],
                out_specs=pl.BlockSpec((8, 32), lambda i, s: (0, 0),
                                       memory_space=pltpu.VMEM),
                scratch_shapes=[
                    pltpu.VMEM((512, 32), jnp.float32),
                    pltpu.SemaphoreType.DMA(()),
                ],
            ),
            out_shape=jax.ShapeDtypeStruct((8, 32), jnp.float32),
        )
        out = jax.jit(fn)(blks, TABLE)
        if use_loop:
            want = sum(TNP[int(b) * 512:int(b) * 512 + 8] for b in np.asarray(blks))
        else:
            b = int(np.asarray(blks)[0])
            want = TNP[b * 512:b * 512 + 8]
        err = np.max(np.abs(np.asarray(out) - want))
        assert err < 1e-4, f"values wrong, err={err}"
        report(name, True, f"err={err:.1e}")
        return True
    return probe(name, build)


def run_noprefetch():
    blks = jnp.asarray(rng.integers(0, NBLK, (8,)).astype(np.int32))

    def kernel(blk_ref, tbl_ref, o_ref, scratch, sem):
        dma = pltpu.make_async_copy(
            tbl_ref.at[pl.ds(blk_ref[0] * 512, 512), :], scratch, sem)
        dma.start()
        dma.wait()
        o_ref[:] = scratch[:8, :]

    def build():
        fn = pl.pallas_call(
            kernel,
            grid=(1,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((8, 32), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((512, 32), jnp.float32),
                pltpu.SemaphoreType.DMA(()),
            ],
            out_shape=jax.ShapeDtypeStruct((8, 32), jnp.float32),
        )
        out = jax.jit(fn)(blks, TABLE)
        b = int(np.asarray(blks)[0])
        err = np.max(np.abs(np.asarray(out) - TNP[b * 512:b * 512 + 8]))
        assert err < 1e-4, f"values wrong, err={err}"
        report("v4_noprefetch", True, f"err={err:.1e}")
        return True
    return probe("v4_noprefetch", build)


def run_static():
    def kernel(tbl_ref, o_ref, scratch, sem):
        dma = pltpu.make_async_copy(
            tbl_ref.at[pl.ds(3 * 512, 512), :], scratch, sem)
        dma.start()
        dma.wait()
        o_ref[:] = scratch[:8, :]

    def build():
        fn = pl.pallas_call(
            kernel,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((8, 32), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((512, 32), jnp.float32),
                pltpu.SemaphoreType.DMA(()),
            ],
            out_shape=jax.ShapeDtypeStruct((8, 32), jnp.float32),
        )
        out = jax.jit(fn)(TABLE)
        err = np.max(np.abs(np.asarray(out) - TNP[3 * 512:3 * 512 + 8]))
        assert err < 1e-4, f"values wrong, err={err}"
        report("v5_static", True, f"err={err:.1e}")
        return True
    return probe("v5_static", build)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "v5"):
        run_static()
    if which in ("all", "v4"):
        run_noprefetch()
    if which in ("all", "v3"):
        run_one("v3_any", pl.ANY, use_loop=False)
    if which in ("all", "v1"):
        run_one("v1_single", pltpu.HBM, use_loop=False)
    if which in ("all", "v2"):
        run_one("v2_loop", pltpu.HBM, use_loop=True)


if __name__ == "__main__":
    main()
