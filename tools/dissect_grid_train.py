#!/usr/bin/env python
"""Dissect the plenoxels TRAIN step cost (scan-chained timing, axon-safe).

The bench measured grid-family training at ~11.6k rays/s (88 ms/step at
1024 rays x 64 samples) — 13x below the NeRF MLP. This isolates where the
time goes: forward gathers, backward scatter-adds, compositing glue, or
the (58M-param) Adam update.

Env: GRID_RES (128), RAYS (1024), SAMPLES (64), K (20).
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
from nerf_tpu.models.registry import grid_domain
from nerf_tpu.models.plenoxels import PlenoxelsModel
from nerf_tpu.render.renderer import RenderSettings, render_rays
from nerf_tpu.train.optim import make_optimizer

K = int(os.environ.get("K", 20))
R = int(os.environ.get("RAYS", 1024))
S = int(os.environ.get("SAMPLES", 64))
GR = int(os.environ.get("GRID_RES", 128))

model = PlenoxelsModel(grid_res=GR, domain=grid_domain(Config()),
                       use_grid_kernel=False)
params = model.init(jax.random.key(0))
settings = RenderSettings(near=2.0, far=6.0, num_samples=S,
                          white_background=True)
tx = make_optimizer(Config(learning_rate=1e-2))
opt_state = tx.init((params, {}))

key = jax.random.key(1)
rays_d = jax.random.normal(key, (R, 3))
rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
rays_o = jax.random.normal(key, (R, 3)) * 0.1
target = jax.random.uniform(key, (R, 3))


def timed(name, body, carry0):
    """body(carry, i) -> carry (device work chained through the carry)."""
    @jax.jit
    def run(c0):
        def f(c, i):
            return body(c, i), ()
        c, _ = jax.lax.scan(f, c0, jnp.arange(K))
        return c

    c = run(carry0)  # compile+warm
    fetch = lambda c: float(np.asarray(jax.tree.leaves(c)[0]).ravel()[0])
    fetch(c)
    t0 = time.perf_counter()
    c = run(carry0)
    fetch(c)
    dt = (time.perf_counter() - t0) / K
    print(f"{name:34s} {dt*1e3:9.2f} ms/iter   "
          f"({R/dt/1e3:8.1f}k rays/s)")
    return dt


def loss_of(p, i):
    out = render_rays(model.apply, p, rays_o, rays_d,
                      jax.random.fold_in(key, i), settings)
    return jnp.mean((out.rgb - target) ** 2)


def main():
    print(f"plenoxels train dissection: grid {GR}^3 x {model.channels}ch, "
          f"{R} rays x {S} samples, K={K}, "
          f"platform={jax.devices()[0].platform}")

    # 1. forward only
    timed("forward loss", lambda c, i: c + loss_of(params, i) * 0,
          jnp.zeros(()))

    # 2. forward+backward (grads into a carried grid)
    def fb(c, i):
        g = jax.grad(loss_of)(params, i)
        return jax.tree.map(lambda a, b: a + 0.0 * b, c, g)
    timed("forward+backward", fb, jax.tree.map(jnp.zeros_like, params))

    # 3. full step (fwd+bwd+adam)
    def full(c, i):
        p, o = c
        g = jax.grad(loss_of)(p, i)
        up, o = tx.update((g, {}), o, (p, {}))
        p = jax.tree.map(lambda a, b: a + b, p, up[0])
        return (p, o)
    timed("full train step", full, (params, opt_state))

    # 4. adam update alone
    g0 = jax.tree.map(jnp.ones_like, params)
    def adam_only(c, i):
        p, o = c
        up, o = tx.update((g0, {}), o, (p, {}))
        p = jax.tree.map(lambda a, b: a + b, p, up[0])
        return (p, o)
    timed("adam update alone", adam_only, (params, opt_state))

    # 5. interp gathers alone (fwd)
    pts = jax.random.uniform(key, (R * S, 3), minval=-1.0, maxval=1.0)
    from nerf_tpu.ops.interp import trilinear
    def interp_fwd(c, i):
        v = trilinear(params["grid"], pts + 0.0 * c[:1, :3])
        return c + 0.0 * v[: c.shape[0]]
    timed("interp gathers fwd", interp_fwd,
          jnp.zeros((8, model.channels)))

    # 6. interp fwd+bwd (the scatter-add)
    def interp_fb(c, i):
        def f(g):
            v = trilinear(g, pts)
            return jnp.sum(v * v)
        gg = jax.grad(f)(params["grid"])
        return jax.tree.map(lambda a, b: a + 0.0 * b, c, gg)
    timed("interp fwd+bwd (scatter)", interp_fb,
          jnp.zeros_like(params["grid"]))


if __name__ == "__main__":
    main()
