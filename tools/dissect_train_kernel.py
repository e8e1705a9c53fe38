#!/usr/bin/env python
"""Ablation attribution for the fused train kernel's non-MXU cost.

The headline step is ~6.5 ms with the kernel at ~76% of bf16 peak; the
probe (tools/probe_vpu_mxu_overlap.py) showed Mosaic DOES overlap
independent VPU/MXU chains and already pipelines a dependent encode
across grid steps, so the gap attribution needs measuring, not guessing.

Each variant patches ONE in-kernel component to a free stand-in (wrong
math, same shapes/dtypes — fine for timing) and re-times the real
``FusedNerfRender.train`` path at the bench shape. The delta vs ``full``
is that component's non-overlapped cost.

  full      the real kernel
  no_sin    fast-sine poly -> identity (encode oscillators)
  no_scan   segment cumprod/suffix-cumsum roll-scans -> identity
  no_tocol  _point_cols_from_t -> constant columns (the (TR,S)->(TB,1)
            one-hot selects for t/delta)
  no_prs    _per_ray_sum one-hot MXU contraction -> row slice
  no_comp   all three of the above compositing pieces

Timing: chained scalar tap (iteration i+1's input depends on i's loss),
clock stopped after a host fetch.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import nerf_tpu.ops.pallas.fused_nerf as fn
import nerf_tpu.ops.pallas.fused_render as fr

R = int(os.environ.get("R", 1024))
S = int(os.environ.get("S", 256))

_ORIG = {
    "fast_sin": fn._fast_sin,
    "cumprod": fr._seg_excl_cumprod_col,
    "cumsum": fr._seg_rev_excl_cumsum_col,
    "tocol": fr._point_cols_from_t,
    "prs": fr._per_ray_sum,
    "exp": fr._exp,
}


def _prs_hilo(g8, per_sample):
    """hi/lo split 2-pass one-hot contraction: exact 0/1 selector in bf16,
    per-sample values as bf16 hi + bf16 residual (~2^-16 rel error)."""
    hi = per_sample.astype(jnp.bfloat16)
    lo = (per_sample - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    g8b = g8.astype(jnp.bfloat16)
    dot = lambda b: jax.lax.dot_general(
        g8b, b, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return dot(hi) + dot(lo)


def _patch(variant):
    fn._fast_sin = _ORIG["fast_sin"]
    fr._seg_excl_cumprod_col = _ORIG["cumprod"]
    fr._seg_rev_excl_cumsum_col = _ORIG["cumsum"]
    fr._point_cols_from_t = _ORIG["tocol"]
    fr._per_ray_sum = _ORIG["prs"]
    fr._exp = _ORIG["exp"]
    if variant in ("no_sin",):
        fn._fast_sin = lambda x: x
    if variant in ("no_scan", "no_comp"):
        fr._seg_excl_cumprod_col = lambda col, s: col
        fr._seg_rev_excl_cumsum_col = lambda col, s: col
    if variant in ("no_tocol", "no_comp"):
        def cheap_cols(t_tile, s, inf_delta=1e10):
            tb = t_tile.shape[0] * s
            c = jnp.full((tb, 1), 3.0, jnp.float32)
            return c, c
        fr._point_cols_from_t = cheap_cols
    if variant in ("no_prs", "no_comp"):
        fr._per_ray_sum = lambda g8, ps: ps[: g8.shape[1]]
    if variant in ("no_exp", "mxu_only"):
        fr._exp = lambda x: x
    if variant == "prs_hilo":
        fr._per_ray_sum = _prs_hilo
    if variant == "mxu_only":
        fn._fast_sin = lambda x: x
        fr._seg_excl_cumprod_col = lambda col, s: col
        fr._seg_rev_excl_cumsum_col = lambda col, s: col

        def cheap_cols2(t_tile, s, inf_delta=1e10):
            tb = t_tile.shape[0] * s
            c = jnp.full((tb, 1), 3.0, jnp.float32)
            return c, c
        fr._point_cols_from_t = cheap_cols2
        fr._per_ray_sum = lambda g8, ps: ps[: g8.shape[1]]


def measure(variant, iters=15, warmup=3):
    _patch(variant)
    from nerf_tpu.models import NeRFModel

    model = NeRFModel(compute_dtype="bfloat16")
    params = jax.jit(model.init)(jax.random.key(0))
    fren = fr.FusedNerfRender(model, 2.0, 6.0, True)

    k = jax.random.key(1)
    rays_o = jax.random.normal(k, (R, 3)) * 0.1
    rays_d = jax.random.normal(jax.random.key(2), (R, 3))
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    target = jax.random.uniform(jax.random.key(3), (R, 3))
    t_base = jnp.linspace(2.0, 6.0, S)[None, :].repeat(R, 0)

    K = int(os.environ.get("SCAN", 20))

    @jax.jit
    def stepk(tap):
        def body(c, _):
            t = t_base + c
            loss, _ = fren.train(params, rays_o, rays_d, rays_d, t, target,
                                 True)
            return loss * 1e-20, ()

        tap, _ = jax.lax.scan(body, tap, None, length=K)
        return tap

    tap = jnp.zeros(())
    for _ in range(warmup):
        tap = stepk(tap)
    float(np.asarray(tap))
    t0 = time.perf_counter()
    for _ in range(iters):
        tap = stepk(tap)
    float(np.asarray(tap))
    dt = (time.perf_counter() - t0) / (iters * K)
    return dt


def main():
    order = ["full", "no_sin", "no_scan", "no_tocol", "no_prs", "no_exp",
             "prs_hilo", "no_comp"]
    times = {}
    for v in order:
        times[v] = measure(v)
        base = times.get("full", times[v])
        delta = base - times[v]
        print(f"{v:9s} {times[v]*1e3:8.3f} ms   delta vs full "
              f"{delta*1e3:+7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
