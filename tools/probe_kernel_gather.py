#!/usr/bin/env python
"""Which dynamic-gather forms does Mosaic lower inside a Pallas kernel?

Probes (each compiled independently; prints OK/FAIL + first error line):
  take_ax0      jnp.take(tbl(1024,128), idx(256,), axis=0)
  index_ax0     tbl[idx] same thing via advanced indexing
  take_ax0_big  jnp.take(tbl(8192,128), idx(2048,), axis=0)
  taa_lane      jnp.take_along_axis(tbl(8,128), idx(8,128), axis=1)
  taa_sublane   jnp.take_along_axis(tbl(1024,128), idx(1024,128), axis=0)
  onehot_mm     one-hot(HIGHEST) matmul gather (control: should work)
"""
from __future__ import annotations

import functools
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def probe(name, kernel, out_shape, args):
    try:
        fn = pl.pallas_call(
            kernel,
            out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )
        out = jax.jit(fn)(*args)
        out = np.asarray(out)
        print(f"{name:14s}: OK   out[0,:3]={out.reshape(out.shape[0],-1)[0,:3]}")
        return True
    except Exception as e:  # noqa: BLE001
        msg = str(e).split("\n")[0][:140]
        print(f"{name:14s}: FAIL {type(e).__name__}: {msg}")
        return False


def main():
    rng = np.random.default_rng(0)

    tbl = jnp.asarray(rng.normal(size=(1024, 128)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, 1024, 256).astype(np.int32))

    def k_take(tbl_ref, idx_ref, o_ref):
        o_ref[:] = jnp.take(tbl_ref[:], idx_ref[:], axis=0)

    probe("take_ax0", k_take,
          jax.ShapeDtypeStruct((256, 128), jnp.float32), (tbl, idx))

    def k_index(tbl_ref, idx_ref, o_ref):
        o_ref[:] = tbl_ref[:][idx_ref[:]]

    probe("index_ax0", k_index,
          jax.ShapeDtypeStruct((256, 128), jnp.float32), (tbl, idx))

    tbl_big = jnp.asarray(rng.normal(size=(8192, 128)).astype(np.float32))
    idx_big = jnp.asarray(rng.integers(0, 8192, 2048).astype(np.int32))
    probe("take_ax0_big", k_take,
          jax.ShapeDtypeStruct((2048, 128), jnp.float32), (tbl_big, idx_big))

    t8 = jnp.asarray(rng.normal(size=(8, 128)).astype(np.float32))
    i8 = jnp.asarray(rng.integers(0, 128, (8, 128)).astype(np.int32))

    def k_taa_lane(tbl_ref, idx_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(tbl_ref[:], idx_ref[:], axis=1)

    probe("taa_lane", k_taa_lane,
          jax.ShapeDtypeStruct((8, 128), jnp.float32), (t8, i8))

    i_sub = jnp.asarray(rng.integers(0, 1024, (1024, 128)).astype(np.int32))

    def k_taa_sub(tbl_ref, idx_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(tbl_ref[:], idx_ref[:], axis=0)

    probe("taa_sublane", k_taa_sub,
          jax.ShapeDtypeStruct((1024, 128), jnp.float32), (tbl, i_sub))

    def k_onehot(tbl_ref, idx_ref, o_ref):
        oh = (idx_ref[:][:, None] ==
              jax.lax.broadcasted_iota(jnp.int32, (1, 1024), 1)).astype(
                  jnp.float32)
        o_ref[:] = jax.lax.dot_general(
            oh, tbl_ref[:], (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST)

    probe("onehot_mm", k_onehot,
          jax.ShapeDtypeStruct((256, 128), jnp.float32), (tbl, idx))


if __name__ == "__main__":
    main()
