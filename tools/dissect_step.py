#!/usr/bin/env python
"""Dissect the train step cost with scan-chained timing (reliable on axon).

Each variant runs K iterations inside one jit via lax.scan with a carried
dependency, and the clock stops after fetching a scalar derived from the
final carry.
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
from nerf_tpu.models import NeRFModel
from nerf_tpu.ops.pallas.fused_nerf import make_fused_nerf_apply
from nerf_tpu.render.renderer import RenderSettings, render_rays
from nerf_tpu.train.optim import make_optimizer
from nerf_tpu.data.pipeline import RayPool

K = 20
R = 1024
S = 256
N = R * S

model = NeRFModel(compute_dtype="bfloat16")
params = model.init(jax.random.key(0))
apply_fn = make_fused_nerf_apply(
    model,
    tile_fwd=int(os.environ.get("NERF_TPU_TILE_FWD", 2048)),
    tile_bwd=int(os.environ.get("NERF_TPU_TILE_BWD", 512)),
)
settings = RenderSettings(near=2.0, far=6.0, num_samples=S, white_background=True)

pool_size = 1 << 20
k = jax.random.key(1)
rays_d = jax.random.normal(k, (pool_size, 3))
rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
pool = RayPool(
    rays_o=jax.random.normal(k, (pool_size, 3)) * 0.1,
    rays_d=rays_d,
    rgb=jax.random.uniform(k, (pool_size, 3)),
    viewdirs=rays_d,
)
pts = jax.random.uniform(jax.random.key(2), (N, 3), minval=-1, maxval=1)
dirs0 = jax.random.normal(jax.random.key(3), (N, 3))
dirs0 = dirs0 / jnp.linalg.norm(dirs0, axis=-1, keepdims=True)


def _fetch(out):
    leaf = jax.tree.leaves(out)[0]
    if jnp.issubdtype(leaf.dtype, jax.dtypes.prng_key):
        leaf = jax.random.key_data(leaf)  # typed keys reject np.asarray
    return float(np.asarray(leaf).ravel()[0])


def timed(name, make_scan, *args, iters=3):
    f = jax.jit(make_scan)
    out = f(*args)
    _ = _fetch(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    _ = _fetch(out)
    dt = (time.perf_counter() - t0) / (iters * K)
    print(f"{name:28s} {dt*1e3:8.3f} ms/step", flush=True)
    return dt


# 1. fused kernel fwd only, carried perturbation
def scan_fwd(p, x, d):
    def body(c, _):
        rgb, sigma = apply_fn(p, c, d)
        return c + 1e-6 * rgb, None
    out, _ = jax.lax.scan(body, x, None, length=K)
    return out

timed("kernel fwd", scan_fwd, params, pts, dirs0)


# 2. fused kernel fwd+bwd (grad wrt params), carried via param update
def scan_fb(p, x, d):
    def body(c, _):
        g = jax.grad(lambda pp: sum(jnp.sum(o) for o in apply_fn(pp, x, d)))(c)
        return jax.tree.map(lambda a, b: a - 1e-12 * b, c, g), None
    out, _ = jax.lax.scan(body, p, None, length=K)
    return out

timed("kernel fwd+bwd", scan_fb, params, pts, dirs0)


# 3. full render fwd (sampling + kernel + compositing)
def scan_render(p, x_key):
    def body(c, i):
        out = render_rays(apply_fn, p, pool.rays_o[:R], pool.rays_d[:R],
                          jax.random.fold_in(c, i), settings)
        return jax.random.fold_in(c, jnp.int32(out.rgb[0, 0] > -1)), None
    out, _ = jax.lax.scan(body, x_key, jnp.arange(K))
    return out

timed("render fwd", scan_render, params, jax.random.key(5))


# 4. render fwd+bwd wrt params (no optimizer)
def scan_render_fb(p, key):
    def body(c, i):
        def loss(pp):
            out = render_rays(apply_fn, pp, pool.rays_o[:R], pool.rays_d[:R],
                              jax.random.fold_in(key, i), settings)
            return jnp.mean((out.rgb - pool.rgb[:R]) ** 2)
        g = jax.grad(loss)(c)
        return jax.tree.map(lambda a, b: a - 1e-12 * b, c, g), None
    out, _ = jax.lax.scan(body, p, None, length=K)
    return out

timed("render fwd+bwd", scan_render_fb, params, jax.random.key(6))


# 5. full train step (sampling from pool + adam)
from nerf_tpu.train.state import TrainState
from nerf_tpu.train.step import make_scan_train_step

cfg = Config()
tx = make_optimizer(cfg)
state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                   fine_params={}, opt_state=tx.init((params, {})))
step_fn = make_scan_train_step(model, tx, settings, R, jax.random.key(7),
                               num_steps=K, donate=False, apply_fn=apply_fn)
out = step_fn(state, pool)
_ = float(np.asarray(out[1]["loss"][-1]))
t0 = time.perf_counter()
iters = 3
st = state
for _ in range(iters):
    st, m = step_fn(st, pool)
_ = float(np.asarray(m["loss"][-1]))
dt = (time.perf_counter() - t0) / (iters * K)
print(f"{'full train step':28s} {dt*1e3:8.3f} ms/step")
