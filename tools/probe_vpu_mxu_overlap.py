#!/usr/bin/env python
"""Can Mosaic overlap independent VPU and MXU instruction chains?

The fused train kernel's forward runs at 79% of bf16 peak vs the
backward's 87% (docs/BENCH_NOTES.md "MXU utilization"); the named
hypothesis for the gap is the encode VPU chain (sin-poly + t-column
selects) serializing against the MXU matmul chain. Whether ANY kernel
restructure (split-tile interleave, encode-a-tile-ahead) can close it
rests on one question this probe answers directly:

  t(mxu_chain + INDEPENDENT vpu_chain in one kernel)  vs
  t(mxu_chain alone) + t(vpu_chain alone)

  ratio ~= max -> Mosaic list-schedules across units; restructuring pays.
  ratio ~= sum -> no overlap from kernel source; record the negative.

Variants:
  mxu     : 11 chained (T,256)@(256,256) bf16 matmuls + relu
  vpu     : K rounds of the degree-11 fast-sine poly on (T,64)
  indep   : both, on unrelated inputs, both outputs written
  dep     : vpu encode feeds the matmul chain (the real kernel's shape)
  dep2    : dep split into two half-tiles, emitted e1,e2,m1,m2 so the
            second half's encode is independent of the first's matmuls

Timing: chained (output feeds next call's input), clock stopped after a
host fetch — the repo-wide rules for the tunneled runtime.
"""
from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nerf_tpu.ops.pallas.fused_nerf import _fast_sin

N = int(os.environ.get("N", 262144))
H = 256
L = 11          # matmul chain length (the NeRF MLP has 11 matmuls)
E = 64          # encode width (p_pad)
K = int(os.environ.get("K", 10))  # sine rounds (~ the per-layer VPU load)
TILE = int(os.environ.get("TILE", 1536))


def _mxu_chain(h, ws):
    for w in ws:
        h = jax.nn.relu(jnp.dot(h.astype(jnp.bfloat16), w,
                                preferred_element_type=jnp.float32))
    return h


def _vpu_chain(y):
    for _ in range(K):
        y = _fast_sin(y * 1.0000001)
    return y


def build(variant):
    nw = L if variant != "dep" and variant != "dep2" else L - 1

    def kernel(x_ref, y_ref, *refs):
        w_refs = refs[:-2]
        ox_ref, oy_ref = refs[-2], refs[-1]
        ws = [r[:] for r in w_refs]
        if variant == "mxu":
            ox_ref[:] = _mxu_chain(x_ref[:], ws)
            oy_ref[:] = y_ref[:]
        elif variant == "vpu":
            ox_ref[:] = x_ref[:]
            oy_ref[:] = _vpu_chain(y_ref[:])
        elif variant == "indep":
            ox_ref[:] = _mxu_chain(x_ref[:], ws)
            oy_ref[:] = _vpu_chain(y_ref[:])
        elif variant == "dep":
            enc = _vpu_chain(y_ref[:])                      # (T, E)
            h = jnp.dot(enc.astype(jnp.bfloat16), ws[0][:E],
                        preferred_element_type=jnp.float32)
            ox_ref[:] = _mxu_chain(h, ws[1:])
            oy_ref[:] = enc
        elif variant == "dep2":
            t2 = TILE // 2
            e1 = _vpu_chain(y_ref[:t2])
            e2 = _vpu_chain(y_ref[t2:])
            def half(e):
                h = jnp.dot(e.astype(jnp.bfloat16), ws[0][:E],
                            preferred_element_type=jnp.float32)
                return _mxu_chain(h, ws[1:])
            ox_ref[:t2] = half(e1)
            ox_ref[t2:] = half(e2)
            oy_ref[:t2] = e1
            oy_ref[t2:] = e2

    def spec(width):
        return pl.BlockSpec((TILE, width), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    wspec = pl.BlockSpec((H, H), lambda i: (0, 0), memory_space=pltpu.VMEM)
    nwt = L
    f = lambda x, y, *w: pl.pallas_call(
        kernel,
        grid=(N // TILE,),
        in_specs=[spec(H), spec(E)] + [wspec] * nwt,
        out_specs=[spec(H), spec(E)],
        out_shape=[jax.ShapeDtypeStruct((N, H), jnp.float32),
                   jax.ShapeDtypeStruct((N, E), jnp.float32)],
    )(x, y, *w)
    return jax.jit(f)


def measure(variant, iters=20, warmup=3):
    ws = [jax.random.normal(jax.random.key(i), (H, H), jnp.bfloat16) * 0.05
          for i in range(L)]
    x0 = jax.random.normal(jax.random.key(90), (N, H), jnp.float32)
    y0 = jax.random.normal(jax.random.key(91), (N, E), jnp.float32)
    f = build(variant)

    # Chain through a SCALAR tap so iteration i+1 depends on i's outputs
    # without value drift (a relu matmul chain fed back to itself collapses
    # or blows up, and degenerate values corrupt the comparison).
    @jax.jit
    def step(x, y, xb, yb):
        ox, oy = f(x, y, *ws)
        tap = ox[0, 0] * 1e-30 + oy[0, 0] * 1e-30
        return xb + tap, yb + tap, tap

    x, y = x0, y0
    for _ in range(warmup):
        x, y, tap = step(x, y, x0, y0)
    float(np.asarray(tap))
    t0 = time.perf_counter()
    for _ in range(iters):
        x, y, tap = step(x, y, x0, y0)
    float(np.asarray(tap))
    dt = (time.perf_counter() - t0) / iters
    mm_fl = 2 * N * H * H * (L if variant in ("mxu", "indep") else
                             (L - 1 if variant in ("dep", "dep2") else 0))
    mm_fl += 2 * N * E * H * (1 if variant in ("dep", "dep2") else 0)
    print(f"{variant:6s} {dt*1e3:8.3f} ms"
          + (f"  {mm_fl/dt/1e12:6.1f} TF/s" if mm_fl else ""), flush=True)
    return dt


def main():
    times = {}
    for v in ("mxu", "vpu", "indep", "dep", "dep2"):
        times[v] = measure(v)
    s = times["mxu"] + times["vpu"]
    print(f"\nindep/(mxu+vpu) = {times['indep']/s:.3f}  "
          f"(1.0 = fully serialized, {times['mxu']/s:.3f} = perfect overlap)")
    print(f"dep2/dep        = {times['dep2']/times['dep']:.3f}  "
          "(<1 = split-tile interleave helps the dependent chain)")


if __name__ == "__main__":
    main()
