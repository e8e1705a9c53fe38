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
    def run(c0, idx_a, val_a, *rest):
        def body(c, i):
            # the values MUST depend on the loop carry: with loop-invariant
            # inputs XLA hoists the entire op out of the scan and the
            # harness reads true_time/K (this bug produced round-4's bogus
            # "chunked scatter is 7.5x faster" reading — in-program
            # chunking measured no faster than one call)
            out = fn(idx_a, val_a * (1.0 + c * 1e-30).astype(val_a.dtype),
                     *rest)
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


# --- round-4 variants: the unique+sorted lowering question ----------------
# If XLA's TPU scatter with unique_indices=True AND indices_are_sorted=True
# runs near gather speed (~6-10 ns/row) instead of the 135 ns/row collision
# -safe path, then sort -> segment-sum -> unique-row scatter beats the
# direct scatter for every grid family. These measure that hypothesis.

# irregular unique sorted rows, precomputed (static shape): strides 1..4
_uidx = jnp.cumsum(
    jax.random.randint(jax.random.key(7), (M,), 1, 5, jnp.int32)
) - 1


def unique_sorted_scatter(idx, val):
    """Upper-bound probe: M rows, indices unique AND sorted, both flags."""
    rows = int(4 * M + 8)
    return jnp.zeros((rows, C), val.dtype).at[_uidx].add(
        val, unique_indices=True, indices_are_sorted=True)


def unique_unsorted_scatter(idx, val):
    """unique_indices alone (original corner order is NOT collision-free,
    so this uses the precomputed unique rows shuffled)."""
    rows = int(4 * M + 8)
    return jnp.zeros((rows, C), val.dtype).at[
        jnp.flip(_uidx)].add(val, unique_indices=True)


def sort_dedup_unique_scatter(idx, val):
    """The real pipeline: sort entries by row, segment-sum runs via
    cumsum-at-ends, compact the ends with a second sort, then ONE scatter
    whose indices are provably unique and sorted (padding entries target
    distinct rows past the real table, sliced off afterwards)."""
    sidx, perm = jax.lax.sort_key_val(idx, jnp.arange(M, dtype=jnp.int32))
    sval = jnp.take(val, perm, axis=0)
    csum = jnp.cumsum(sval, axis=0)
    is_end = jnp.concatenate([sidx[1:] != sidx[:-1], jnp.ones((1,), bool)])
    # compact (row, end-cumsum) pairs to the front, in row order: one more
    # sort on a key that is the row id at ends and +inf elsewhere
    big = jnp.int32(R * R * R)
    key2 = jnp.where(is_end, sidx, big)
    # payload columns: end cumsum + the row id; sort_key_val carries f32
    perm2 = jax.lax.sort_key_val(key2, jnp.arange(M, dtype=jnp.int32))[1]
    c_rows = jnp.take(key2, perm2)
    c_csum = jnp.take(csum, perm2, axis=0)
    # delta against the previous end's cumsum = the segment sum
    seg = c_csum - jnp.concatenate(
        [jnp.zeros((1, C), c_csum.dtype), c_csum[:-1]], axis=0)
    # padding tail: route to distinct rows past the table (unique+sorted
    # stays TRUE), slice them off after
    tail = big + jnp.cumsum((c_rows == big).astype(jnp.int32)) - 1
    rows_final = jnp.where(c_rows == big, tail, c_rows)
    out = jnp.zeros((R * R * R + M, C), val.dtype).at[rows_final].add(
        seg, unique_indices=True, indices_are_sorted=True)
    return out[: R * R * R]


def scatter_chunked(idx, val, chunk):
    """Same M entries, issued as ceil(M/chunk) sub-scatters: probes whether
    XLA's TPU scatter has a fast path bounded by rows-per-call (the x8
    split measured 8.9 ms vs 67.5 for one call — 7.5x — in round 4)."""
    out = jnp.zeros((R * R * R, C), val.dtype)
    for k in range(0, M, chunk):
        out = out.at[idx[k:k + chunk]].add(val[k:k + chunk])
    return out


def sort_only(idx, val):
    sidx, perm = jax.lax.sort_key_val(idx, jnp.arange(M, dtype=jnp.int32))
    return sidx * 0 + perm


def permute_only(idx, val):
    return jnp.take(val, idx % M, axis=0)


def main():
    print(f"scatter microbench: {M} rows x {C}ch into {R}^3 grid, K={K}, "
          f"platform={jax.devices()[0].platform}")
    # correctness of the dedup pipeline before timing it
    ref = jax.jit(scatter_one)(idx, val)
    got = jax.jit(sort_dedup_unique_scatter)(idx, val)
    err = float(jnp.max(jnp.abs(ref - got)))
    rel = err / float(jnp.max(jnp.abs(ref)))
    print(f"sort_dedup_unique_scatter max|err| {err:.3e} (rel {rel:.1e})")
    assert rel < 1e-4, "dedup pipeline disagrees with direct scatter"

    timed("scatter (current)", scatter_one, idx, val)
    timed("scatter x8 corners", scatter_eight, idx, val)
    timed("sort_key_val only", sort_only, idx, val)
    timed("permute (row gather) only", permute_only, idx, val)
    timed("sort + sorted scatter", sort_scatter, idx, val)
    timed("bf16 scatter", scatter_one, idx, val.astype(jnp.bfloat16))
    timed("unique+sorted flags probe", unique_sorted_scatter, idx, val)
    timed("unique flag, unsorted", unique_unsorted_scatter, idx, val)
    timed("sort+dedup+unique scatter", sort_dedup_unique_scatter, idx, val)
    import functools

    for chunk in (16384, 32768, 65536, 131072, 262144):
        timed(f"scatter chunked {chunk//1024}k",
              functools.partial(scatter_chunked, chunk=chunk), idx, val)


if __name__ == "__main__":
    main()
