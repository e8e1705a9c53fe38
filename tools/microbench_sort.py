"""Microbench: KiloNeRF dispatch-plan sort alternatives.

The grouped dispatch (models/kilonerf.py::build_dispatch) stable-sorts
262k points by voxel id every step; tools/dissect_kilonerf.py measured
that argsort at ~5.6 ms on the v5e — a large slice of the 30 ms grouped
step. STATUS round-2 asked: does a counting sort built from scatter +
blocked one-hot cumsum beat lax.sort before we commit to building it
into the dispatch path?

Candidates (all produce the same stable grouping):
  A. jnp.argsort(vid)                      -- current path
  B. lax.sort_key_val(vid, iota)           -- same sort, fused payload
  C. counting sort:
       counts  = scatter-add ones           (N -> G3)
       starts  = exclusive cumsum           (G3)
       rank    = blocked one-hot cumsum     (B, C, G3) int32
       dest    = starts[vid] + rank         (N)
     then the two ways the plan consumes the permutation:
       C1. order = scatter iota into dest   (explicit inverse perm)
       C2. no order at all: scatter the point ROWS by dest and gather
           outputs back by dest (what the dispatch actually needs)

Run on the real chip:  python tools/microbench_sort.py
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp

N = 262144          # 1024 rays x 256 samples (the training shape)
G3 = 512            # 8^3 experts
BLOCK = 512         # rows per one-hot block in the rank cumsum


def _counting_dest(vid: jax.Array) -> jax.Array:
    """Stable destination slot per point via blocked one-hot cumsum."""
    n = vid.shape[0]
    counts = jnp.zeros((G3,), jnp.int32).at[vid].add(1)
    starts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)[:-1]]
    )
    b = n // BLOCK
    vblk = vid.reshape(b, BLOCK)
    onehot = jax.nn.one_hot(vblk, G3, dtype=jnp.int32)      # (B, C, G3)
    run = jnp.cumsum(onehot, axis=1)                        # intra-block
    rank_in_block = (
        jnp.take_along_axis(run, vblk[..., None], axis=2)[..., 0] - 1
    )
    per_block = run[:, -1, :]                               # (B, G3)
    block_off = jnp.concatenate(
        [jnp.zeros((1, G3), jnp.int32), jnp.cumsum(per_block, axis=0)[:-1]]
    )
    rank = rank_in_block + jnp.take_along_axis(
        block_off, vblk, axis=1
    )
    return (starts[vid.reshape(b, BLOCK)] + rank).reshape(n)


@functools.partial(jax.jit, static_argnames=("variant",))
def run(vid, pts, variant):
    if variant == "argsort":
        order = jnp.argsort(vid)
        return pts[order].sum() + order[0]
    if variant == "sort_key_val":
        _, order = jax.lax.sort_key_val(vid, jnp.arange(N, dtype=jnp.int32))
        return pts[order].sum() + order[0]
    if variant == "count_order":
        dest = _counting_dest(vid)
        order = jnp.zeros((N,), jnp.int32).at[dest].set(
            jnp.arange(N, dtype=jnp.int32)
        )
        return pts[order].sum() + order[0]
    if variant == "count_scatter_rows":
        dest = _counting_dest(vid)
        sorted_pts = jnp.zeros_like(pts).at[dest].set(pts)
        # the tail gather that restores ray order in the real path
        back = sorted_pts[dest]
        return sorted_pts.sum() + back[0, 0]
    if variant == "packed_single_sort":
        # grp in [0, G3) and index < N=2^18 pack into one int32 key; a
        # single-operand lax.sort may beat the two-operand sort_key_val
        key = vid * jnp.int32(N) + jnp.arange(N, dtype=jnp.int32)
        skey = jax.lax.sort(key)
        order = skey % jnp.int32(N)
        return pts[order].sum() + order[0]
    raise ValueError(variant)


def main() -> None:
    key = jax.random.PRNGKey(0)
    vid = jax.random.randint(key, (N,), 0, G3, dtype=jnp.int32)
    pts = jax.random.normal(jax.random.PRNGKey(1), (N, 3), jnp.float32)

    # correctness: counting dest is the exact inverse of stable argsort
    order_ref = jnp.argsort(vid)
    dest = _counting_dest(vid)
    order_cnt = jnp.zeros((N,), jnp.int32).at[dest].set(
        jnp.arange(N, dtype=jnp.int32)
    )
    assert bool(jnp.array_equal(order_ref, order_cnt)), "counting sort wrong"
    print("counting sort == stable argsort: OK")

    for variant in ("argsort", "sort_key_val", "count_order",
                    "count_scatter_rows", "packed_single_sort"):
        r = run(vid, pts, variant)
        r.block_until_ready()
        iters = 30
        t0 = time.perf_counter()
        for _ in range(iters):
            r = run(vid, pts, variant)
        float(r)  # host fetch fence (remote-runtime reliable)
        dt = (time.perf_counter() - t0) / iters * 1e3
        print(f"{variant:22s} {dt:7.3f} ms")


if __name__ == "__main__":
    main()
