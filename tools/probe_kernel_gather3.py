#!/usr/bin/env python
"""Round 3 Mosaic probes for the grid-render kernel design.

  taa_same_1024   taa axis=1 src (1024,128) idx (1024,128)  [the gather]
  lead_collapse   (16,16,512) -> (256,512) leading collapse
  dyn_dma3        dynamic-origin DMA (16,16,512) from (64,64,64*8) view,
                  lane origin z0*C (non-128-aligned), NO reshape after
  dyn_dma_rows    16 per-x DMAs of (16,512) rows from (64*64, 64*8) view
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


def probe(name, build):
    try:
        out = build()
        print(f"{name:14s}: OK   {np.asarray(out).reshape(-1)[:3]}")
        return True
    except Exception as e:  # noqa: BLE001
        msg = str(e).split("\n")[0][:160]
        print(f"{name:14s}: FAIL {type(e).__name__}: {msg}")
        return False


def main():
    rng = np.random.default_rng(0)

    src = jnp.asarray(rng.normal(size=(1024, 128)).astype(np.float32))
    idx1 = jnp.asarray(rng.integers(0, 128, (1, 128)).astype(np.int32))

    def k_taa(s_ref, i_ref, o_ref):
        idx = jnp.broadcast_to(i_ref[:], (1024, 128))
        o_ref[:] = jnp.take_along_axis(s_ref[:], idx, axis=1)

    def build_taa():
        out = jax.jit(pl.pallas_call(
            k_taa, out_shape=jax.ShapeDtypeStruct((1024, 128), jnp.float32)))(
                src, idx1)
        want = np.asarray(src)[:, np.asarray(idx1)[0]]
        assert np.allclose(np.asarray(out), want), "taa values wrong"
        return out

    probe("taa_same_1024", build_taa)

    g3 = jnp.asarray(rng.normal(size=(16, 16, 512)).astype(np.float32))

    def k_lead(g_ref, o_ref):
        o_ref[:] = g_ref[:].reshape(256, 512) * 2.0

    probe("lead_collapse", lambda: jax.jit(pl.pallas_call(
        k_lead, out_shape=jax.ShapeDtypeStruct((256, 512), jnp.float32)))(g3))

    C = 8
    big = jnp.asarray(rng.normal(size=(64, 64, 64 * C)).astype(np.float32))
    org = jnp.asarray([3, 17, 9], np.int32)   # x0, y0, z0 (cells)

    def k_dma3(org_ref, big_ref, o_ref, scratch, sem):
        x0, y0, z0 = org_ref[0], org_ref[1], org_ref[2]
        dma = pltpu.make_async_copy(
            big_ref.at[pl.ds(x0, 16), pl.ds(y0, 16), pl.ds(z0 * C, 64 * C)],
            scratch, sem)
        dma.start()
        dma.wait()
        o_ref[:] = scratch[:, 0, :128]

    def build_dma3():
        fn = pl.pallas_call(
            k_dma3,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(1,),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
                out_specs=pl.BlockSpec((16, 128), lambda i, s: (0, 0),
                                       memory_space=pltpu.VMEM),
                scratch_shapes=[
                    pltpu.VMEM((16, 16, 64 * C), jnp.float32),
                    pltpu.SemaphoreType.DMA(()),
                ],
            ),
            out_shape=jax.ShapeDtypeStruct((16, 128), jnp.float32),
        )
        out = jax.jit(fn)(org, big)
        want = np.asarray(big)[3:19, 17, 9 * C:9 * C + 128]
        err = np.max(np.abs(np.asarray(out) - want))
        assert err == 0.0, f"dma3 wrong, err={err}"
        return out

    probe("dyn_dma3", build_dma3)

    big2 = big.reshape(64 * 64, 64 * C)

    def k_dmarows(org_ref, big_ref, o_ref, scratch, sem):
        x0, y0, z0 = org_ref[0], org_ref[1], org_ref[2]
        for i in range(16):
            dma = pltpu.make_async_copy(
                big_ref.at[pl.ds((x0 + i) * 64 + y0, 16),
                           pl.ds(z0 * C, 64 * C)],
                scratch.at[i], sem)
            dma.start()
            dma.wait()
        o_ref[:] = scratch[:, 0, :128]

    def build_dmarows():
        fn = pl.pallas_call(
            k_dmarows,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(1,),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
                out_specs=pl.BlockSpec((16, 128), lambda i, s: (0, 0),
                                       memory_space=pltpu.VMEM),
                scratch_shapes=[
                    pltpu.VMEM((16, 16, 64 * C), jnp.float32),
                    pltpu.SemaphoreType.DMA(()),
                ],
            ),
            out_shape=jax.ShapeDtypeStruct((16, 128), jnp.float32),
        )
        out = jax.jit(fn)(org, big2)
        want = np.asarray(big)[3:19, 17, 9 * C:9 * C + 128]
        err = np.max(np.abs(np.asarray(out) - want))
        assert err == 0.0, f"dmarows wrong, err={err}"
        return out

    probe("dyn_dma_rows", build_dmarows)


if __name__ == "__main__":
    main()
