#!/usr/bin/env python
"""Round 2 of Mosaic gather probes: what the fused grid-render kernel
needs. Each probe compiles+runs a tiny kernel and prints OK/FAIL.

  taa_wide      take_along_axis axis=1, src (32,4096), idx (32,128)
  taa_512       take_along_axis axis=1, src (8,512), idx (8,128)
  reshape_cll   (32,16,16,16) -> (32,4096) trailing collapse in-kernel
  reshape_split (32,4096) -> (1024,128) lane->sublane split in-kernel
  dyn_dma       dynamic-origin rectangular DMA HBM->VMEM scratch
"""
from __future__ import annotations

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def probe(name, build):
    try:
        out = build()
        out = np.asarray(out)
        print(f"{name:14s}: OK   sample={out.reshape(-1)[:3]}")
        return True
    except Exception as e:  # noqa: BLE001
        msg = str(e).split("\n")[0][:160]
        print(f"{name:14s}: FAIL {type(e).__name__}: {msg}")
        return False


def main():
    rng = np.random.default_rng(0)

    # --- taa_wide
    src = jnp.asarray(rng.normal(size=(32, 4096)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, 4096, (32, 128)).astype(np.int32))

    def k_wide(s_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(s_ref[:], i_ref[:], axis=1)

    probe("taa_wide", lambda: jax.jit(pl.pallas_call(
        k_wide, out_shape=jax.ShapeDtypeStruct((32, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)))(src, idx))

    # --- taa_512
    s2 = jnp.asarray(rng.normal(size=(8, 512)).astype(np.float32))
    i2 = jnp.asarray(rng.integers(0, 512, (8, 128)).astype(np.int32))
    probe("taa_512", lambda: jax.jit(pl.pallas_call(
        k_wide, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32)))(
            s2, i2))

    # --- reshape trailing collapse
    g = jnp.asarray(rng.normal(size=(32, 16, 16, 16)).astype(np.float32))

    def k_cll(g_ref, o_ref):
        o_ref[:] = g_ref[:].reshape(32, 4096) * 2.0

    probe("reshape_cll", lambda: jax.jit(pl.pallas_call(
        k_cll, out_shape=jax.ShapeDtypeStruct((32, 4096), jnp.float32)))(g))

    # --- reshape lane->sublane split
    w = jnp.asarray(rng.normal(size=(32, 4096)).astype(np.float32))

    def k_split(w_ref, o_ref):
        o_ref[:] = w_ref[:].reshape(1024, 128) * 2.0

    probe("reshape_split", lambda: jax.jit(pl.pallas_call(
        k_split, out_shape=jax.ShapeDtypeStruct((1024, 128), jnp.float32)))(w))

    # --- dynamic-origin DMA from HBM (ANY memory space) into VMEM scratch
    big = jnp.asarray(rng.normal(size=(64, 64, 64, 8)).astype(np.float32))
    org = jnp.asarray([3, 17, 9], np.int32)

    def k_dma(org_ref, big_ref, o_ref, scratch, sem):
        x0 = org_ref[0]
        y0 = org_ref[1]
        z0 = org_ref[2]
        dma = pltpu.make_async_copy(
            big_ref.at[pl.ds(x0, 16), pl.ds(y0, 16), pl.ds(z0, 16)],
            scratch, sem)
        dma.start()
        dma.wait()
        o_ref[:] = scratch[:].reshape(16, 16 * 16 * 8)[:, :128]

    def build_dma():
        fn = pl.pallas_call(
            k_dma,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(1,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
                out_specs=pl.BlockSpec((16, 128), lambda i, s: (0, 0),
                                       memory_space=pltpu.VMEM),
                scratch_shapes=[
                    pltpu.VMEM((16, 16, 16, 8), jnp.float32),
                    pltpu.SemaphoreType.DMA(()),
                ],
            ),
            out_shape=jax.ShapeDtypeStruct((16, 128), jnp.float32),
        )
        out = jax.jit(fn)(org, big)
        want = np.asarray(big[3:19, 17:33, 9:25]).reshape(16, -1)[:, :128]
        err = np.max(np.abs(np.asarray(out) - want))
        assert err < 1e-6, f"dma values wrong, err={err}"
        return out

    probe("dyn_dma", build_dma)


if __name__ == "__main__":
    main()
