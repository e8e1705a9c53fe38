#!/usr/bin/env python
"""Round-5 KiloNeRF glue probes: payload-carrying sort + cheaper pack.

Q1: does carrying the (N, 8) payload THROUGH the dispatch sort
    (multi-operand lax.sort, num_keys=1) beat today's argsort followed by
    a separate (num_tiles*t, 8) row gather?  [VERDICT r4 item 2]
Q2: is pack_params_multi's eye-broadcast block-diagonal construction the
    2.4 ms, and does a dynamic_update_slice construction beat it?

All timings scan-chained (carry feeds every iteration's inputs — the
round-4 harness rule) with a host fetch stopping the clock.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from nerf_tpu.config import Config
from nerf_tpu.models import KiloNeRFModel
from nerf_tpu.models.registry import grid_domain
from nerf_tpu.ops.pallas import fused_kilonerf as fk

N = int(os.environ.get("KN_POINTS", 262144))
T = int(os.environ.get("KN_TILE", 256))
NG = 128


def timeit(fn, carry, iters=12, warmup=3, k=4):
    @jax.jit
    def stepk(c):
        def body(c, _):
            return fn(c), ()
        c, _ = jax.lax.scan(body, c, None, length=k)
        return c

    for _ in range(warmup):
        carry = stepk(carry)
    jax.tree.map(lambda a: np.asarray(a).ravel()[0], carry)
    t0 = time.perf_counter()
    for _ in range(iters):
        carry = stepk(carry)
    jax.tree.map(lambda a: np.asarray(a).ravel()[0], carry)
    return (time.perf_counter() - t0) / (iters * k)


def q1_sorts():
    key = jax.random.PRNGKey(0)
    grp = jax.random.randint(key, (N,), 0, NG, jnp.int32)
    pay = jax.random.normal(jax.random.PRNGKey(1), (N, 8), jnp.float32)
    num_tiles = -(-N // T) + NG
    iota = jnp.arange(N, dtype=jnp.int32)

    def plan_src(svid_grp):
        starts = jnp.searchsorted(
            svid_grp, jnp.arange(NG, dtype=jnp.int32), side="left")
        ends = jnp.concatenate([starts[1:], jnp.full((1,), N, jnp.int32)])
        counts = ends - starts
        tpg = -(-counts // T)
        tile_end = jnp.cumsum(tpg)
        tiles = jnp.arange(num_tiles, dtype=jnp.int32)
        gid = jnp.minimum(
            jnp.searchsorted(tile_end, tiles, side="right"), NG - 1
        ).astype(jnp.int32)
        tile_rank = tiles - (tile_end[gid] - tpg[gid])
        slot = tile_rank[:, None] * T + jnp.arange(T, dtype=jnp.int32)[None, :]
        valid = slot < counts[gid][:, None]
        src = jnp.where(valid, starts[gid][:, None] + slot, N)
        return src, valid

    def today(c):
        # argsort + searchsorted plan + payload gather into tile slots
        g = grp + (c[0, 0] * 1e-30).astype(jnp.int32)
        order = jnp.argsort(g)
        src, valid = plan_src(g[order])
        orig_flat = jnp.where(
            valid.reshape(-1),
            jnp.concatenate([order, jnp.full((1,), N, jnp.int32)])[
                src.reshape(-1)],
            N,
        )
        pay_p = jnp.concatenate([pay + c[0, 0] * 1e-30,
                                 jnp.zeros((1, 8), jnp.float32)])
        tiles8 = pay_p[orig_flat]
        return tiles8[: N // T * T].reshape(N // T, T * 8)[:, :8] * 1e-30 \
            + c * 0.0 + tiles8[0, 0]

    def carried(c):
        # ONE multi-operand sort carries iota + all 8 payload columns;
        # tiles come from pay_sorted rows via the same src map (gather
        # from the SORTED array instead of original order)
        g = grp + (c[0, 0] * 1e-30).astype(jnp.int32)
        ops = (g, iota) + tuple(
            pay[:, j] + c[0, 0] * 1e-30 for j in range(8))
        out = jax.lax.sort(ops, num_keys=1)
        order = out[1]
        pay_sorted = jnp.stack(out[2:], axis=1)
        src, valid = plan_src(out[0])
        pay_p = jnp.concatenate([pay_sorted,
                                 jnp.zeros((1, 8), jnp.float32)])
        tiles8 = jnp.where(valid.reshape(-1)[:, None],
                           pay_p[src.reshape(-1)], 0.0)
        return tiles8[: N // T * T].reshape(N // T, T * 8)[:, :8] * 1e-30 \
            + c * 0.0 + tiles8[0, 0] + order[0].astype(jnp.float32) * 1e-30

    def sort_only(c):
        g = grp + (c[0, 0] * 1e-30).astype(jnp.int32)
        order = jnp.argsort(g)
        return c * 0.0 + order[0].astype(jnp.float32) * 1e-30

    c0 = jnp.zeros((N // T, 8), jnp.float32)
    for name, fn in (("sort_only", sort_only), ("today", today),
                     ("carried", carried)):
        dt = timeit(fn, c0)
        print(f"Q1 {name:10s} {dt*1e3:7.3f} ms", flush=True)


def q2_pack():
    model = KiloNeRFModel(compute_dtype="bfloat16", hidden_dim=32,
                          grid_res=8, domain=grid_domain(Config()))
    params = jax.jit(model.init)(jax.random.key(0))
    h, e = 32, 4
    p_pad, d_pad = 64, 32

    def pack_today(c):
        p2 = jax.tree.map(lambda a: a + c * 1e-30, params)
        return fk.pack_params_multi(p2, p_pad, d_pad, h, e)[0, 0, 0] * 1e-30

    def pack_dus(c):
        p2 = jax.tree.map(lambda a: a + c * 1e-30, params)
        w = _pack_dus(p2, p_pad, d_pad, h, e)
        return w[0, 0, 0] * 1e-30

    for name, fn in (("pack_today", pack_today), ("pack_dus", pack_dus)):
        dt = timeit(fn, jnp.zeros(()))
        print(f"Q2 {name:10s} {dt*1e3:7.3f} ms", flush=True)


def _pack_dus(params, p_pad, d_pad, h, e):
    """Block-diagonal group blocks via per-slot dynamic_update_slice
    instead of the (ng, e, rows, e, h) eye-broadcast."""
    g = params["l1"]["w"].shape[0]
    ng = g // e
    lanes = e * h
    offs, pack_rows = fk._layout_multi(h, p_pad, d_pad, e)
    out = jnp.zeros((ng, pack_rows, lanes), jnp.float32)

    def place(out, name, w, rows):
        r0, _ = offs[name]
        w = jnp.pad(w, ((0, 0), (0, rows - w.shape[1]),
                        (0, h - w.shape[2])))
        w = w.reshape(ng, e, rows, h)
        for ee in range(e):
            out = jax.lax.dynamic_update_slice(
                out, w[:, ee], (0, r0 + ee * rows, ee * h))
        return out

    wt = params["trunk"]["w"]
    wr1 = params["rgb1"]["w"]
    out = place(out, "w1", params["l1"]["w"], p_pad)
    out = place(out, "w2", params["l2"]["w"], h)
    out = place(out, "wtf", wt[:, :, :h], h)
    out = place(out, "wr1f", wr1[:, :h], h)
    out = place(out, "wr1d", wr1[:, h:], d_pad)
    out = place(out, "wr2", params["rgb2"]["w"], h)

    bts = jnp.zeros((g, h), jnp.float32).at[:, 0].set(
        params["trunk"]["b"][:, h])
    extras = [wt[:, :, h], params["l1"]["b"], params["l2"]["b"],
              params["trunk"]["b"][:, :h], params["rgb1"]["b"],
              params["rgb2"]["b"], bts]
    e0 = offs["extras"][0]
    for i, v in enumerate(extras):
        v = jnp.pad(v, ((0, 0), (0, h - v.shape[1])))
        out = jax.lax.dynamic_update_slice(
            out, v.reshape(ng, 1, lanes), (0, e0 + i, 0))
    return out


def main():
    import sys as _s
    which = _s.argv[1] if len(_s.argv) > 1 else "all"
    if which in ("q1", "all"):
        q1_sorts()
    if which in ("q2", "all"):
        # parity first (CPU-cheap shapes are fine on device too)
        model = KiloNeRFModel(compute_dtype="bfloat16", hidden_dim=32,
                              grid_res=8, domain=grid_domain(Config()))
        params = jax.jit(model.init)(jax.random.key(0))
        a = fk.pack_params_multi(params, 64, 32, 32, 4)
        b = _pack_dus(params, 64, 32, 32, 4)
        assert np.allclose(np.asarray(a), np.asarray(b)), "pack_dus mismatch"
        print("pack_dus == pack_params_multi: OK", flush=True)
        q2_pack()


if __name__ == "__main__":
    main()
