#!/usr/bin/env python
"""Scatter-add strategy microbench at the grid-training shape.

The plenoxels train step spends ~63 of its 80 ms in the backward's
8N-row scatter-add (524k rows x 28ch into a 2.1M x 28 grid). Candidate
reformulations, all timed scan-chained (axon-safe):

  scatter        zeros.at[idx].add(val)                  — current
  scatter8       8 separate N-row scatters (one per corner)
  sort+scatter   lax.sort_key_val -> permute val -> scatter(sorted=True)
  sort+segsum    sorted -> boundary cumsum-diff -> unique-row scatter
  bf16 scatter   value dtype effect

Env: N (65536 samples -> 8N rows), R (128), C (28), K (10).
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

N = int(os.environ.get("N", 65536))
R = int(os.environ.get("R", 128))
C = int(os.environ.get("C", 28))
K = int(os.environ.get("K", 10))
M = 8 * N

key = jax.random.key(0)
# realistic indices: ray-structured cells + the 8 corner strides
flat0 = jax.random.randint(key, (N,), 0, (R - 1) ** 3)
x0 = flat0 // ((R - 1) * (R - 1))
y0 = (flat0 // (R - 1)) % (R - 1)
z0 = flat0 % (R - 1)
base = (x0 * R + y0) * R + z0
strides = jnp.array([(dx * R + dy) * R + dz
                     for dx in (0, 1) for dy in (0, 1) for dz in (0, 1)],
                    jnp.int32)
idx = (base[None, :] + strides[:, None]).reshape(M)
val = jax.random.normal(jax.random.key(1), (M, C), jnp.float32)


def timed(name, fn, *args):
    @jax.jit
    def run(c0, *a):
        def body(c, i):
            out = fn(*jax.tree.map(lambda x: x, a))
            # chain: fold a scalar of the output into the carry
            return c + jax.tree.leaves(out)[0].ravel()[0], ()
        c, _ = jax.lax.scan(body, c0, jnp.arange(K))
        return c

    c = run(jnp.zeros(()), *args)
    float(np.asarray(c))
    t0 = time.perf_counter()
    c = run(jnp.zeros(()), *args)
    float(np.asarray(c))
    dt = (time.perf_counter() - t0) / K
    print(f"{name:26s} {dt*1e3:9.2f} ms")
    return dt


def scatter_one(idx, val):
    return jnp.zeros((R * R * R, C), val.dtype).at[idx].add(val)


def scatter_eight(idx, val):
    out = jnp.zeros((R * R * R, C), val.dtype)
    for k in range(8):
        out = out.at[idx[k * N:(k + 1) * N]].add(val[k * N:(k + 1) * N])
    return out


def sort_scatter(idx, val):
    sidx, perm = jax.lax.sort_key_val(idx, jnp.arange(M, dtype=jnp.int32))
    sval = jnp.take(val, perm, axis=0)
    return jnp.zeros((R * R * R, C), val.dtype).at[sidx].add(
        sval, indices_are_sorted=True)


def sort_segsum(idx, val):
    sidx, perm = jax.lax.sort_key_val(idx, jnp.arange(M, dtype=jnp.int32))
    sval = jnp.take(val, perm, axis=0)
    csum = jnp.cumsum(sval, axis=0)
    # segment end = last position of each run; its cumsum minus the
    # previous segment's end cumsum = the run's sum
    is_end = jnp.concatenate([sidx[1:] != sidx[:-1],
                              jnp.ones((1,), bool)])
    # rows: every position, but only ends carry a nonzero delta
    prev = jnp.where(jnp.arange(M) == 0, 0.0,
                     jnp.where(is_end, 0.0, 1.0))[:, None] * 0.0
    del prev
    ends_csum = jnp.where(is_end[:, None], csum, 0.0)
    # previous end's cumsum for each end: cummax of masked positions
    pos = jnp.where(is_end, jnp.arange(M, dtype=jnp.int32), -1)
    # simpler: delta at end e = csum[e] - csum[prev_end(e)]; compute via
    # subtracting the cumsum at the previous end using a shifted gather of
    # end positions is itself gather-bound — instead scatter ALL rows with
    # sorted flag but zero out non-ends (same row count; measures whether
    # sparsity of nonzeros helps a sorted scatter)
    return jnp.zeros((R * R * R, C), val.dtype).at[sidx].add(
        ends_csum, indices_are_sorted=True)


def sort_only(idx, val):
    sidx, perm = jax.lax.sort_key_val(idx, jnp.arange(M, dtype=jnp.int32))
    return sidx * 0 + perm


def permute_only(idx, val):
    return jnp.take(val, idx % M, axis=0)


def main():
    print(f"scatter microbench: {M} rows x {C}ch into {R}^3 grid, K={K}, "
          f"platform={jax.devices()[0].platform}")
    timed("scatter (current)", scatter_one, idx, val)
    timed("scatter x8 corners", scatter_eight, idx, val)
    timed("sort_key_val only", sort_only, idx, val)
    timed("permute (row gather) only", permute_only, idx, val)
    timed("sort + sorted scatter", sort_scatter, idx, val)
    timed("bf16 scatter", scatter_one, idx, val.astype(jnp.bfloat16))


if __name__ == "__main__":
    main()
