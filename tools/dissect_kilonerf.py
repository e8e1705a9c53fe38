#!/usr/bin/env python
"""Where does the KiloNeRF step spend its time? Times the pieces of the
grouped-dispatch path at the training shape (262144 points, 8^3 grid),
each as a scan-chained jitted program (10 reps inside ONE dispatch, output
fed forward) so tunnel dispatch/fetch overhead cannot pollute the numbers.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from nerf_tpu.models import KiloNeRFModel

N = int(os.environ.get("KN_POINTS", 262144))
REPS = 10
model = KiloNeRFModel(compute_dtype=os.environ.get("KN_DTYPE", "bfloat16"))
params = model.init(jax.random.key(0))

rng = np.random.default_rng(0)
pts0 = jnp.asarray(rng.uniform(-1, 1, (N, 3)), jnp.float32)
dirs = jnp.asarray(rng.normal(size=(N, 3)), jnp.float32)
dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)


def scan_time(name, body):
    """body(pts) -> scalar; chained: pts perturbed by the scalar each rep."""

    @jax.jit
    def run(p):
        def step(carry, _):
            s = body(carry)
            return carry + 1e-12 * s, s

        final, ss = jax.lax.scan(step, p, None, length=REPS)
        return ss[-1]

    out = run(pts0)
    _ = float(np.asarray(out))  # compile + warm
    t0 = time.perf_counter()
    out = run(pts0)
    _ = float(np.asarray(out))
    dt = (time.perf_counter() - t0) / REPS
    print(f"{name:28s}: {dt*1e3:8.2f} ms   ({N/dt/1e3:7.0f}k pts/s)")


def sort_only(p):
    vid, _ = model.voxel_of(p)
    order = jnp.argsort(vid)
    return jnp.sum(order[:8].astype(jnp.float32))


def fwd_grouped(p):
    rgb, sigma = model.apply(params, p, dirs)
    return jnp.sum(rgb[0]) + sigma[0]


def fwd_pointwise(p):
    rgb, sigma = model.apply_pointwise(params, p, dirs)
    return jnp.sum(rgb[0]) + sigma[0]


def bwd_grouped(p):
    g = jax.grad(
        lambda pr: jnp.sum(model.apply(pr, p, dirs)[0])
    )(params)
    return jnp.sum(g["l1"]["w"][0, 0])


def bwd_pointwise(p):
    g = jax.grad(
        lambda pr: jnp.sum(model.apply_pointwise(pr, p, dirs)[0])
    )(params)
    return jnp.sum(g["l1"]["w"][0, 0])


scan_time("sort (argsort vid)", sort_only)
scan_time("fwd (grouped)", fwd_grouped)
scan_time("fwd (pointwise gather)", fwd_pointwise)
scan_time("fwd+bwd (grouped)", bwd_grouped)
scan_time("fwd+bwd (pointwise)", bwd_pointwise)
