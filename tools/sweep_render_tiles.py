#!/usr/bin/env python
"""Sweep fused-render kernel tiles; measures the full scanned train step."""
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
from nerf_tpu.render.renderer import RenderSettings
from nerf_tpu.train.optim import make_optimizer
from nerf_tpu.train.state import TrainState
from nerf_tpu.train.step import make_scan_train_step
from nerf_tpu.ops.pallas.fused_render import make_fused_nerf_render
from nerf_tpu.data.pipeline import RayPool

R, S, K = 1024, 256, 20
model = NeRFModel(compute_dtype="bfloat16")
settings = RenderSettings(near=2.0, far=6.0, num_samples=S, white_background=True)
cfg = Config()
tx = make_optimizer(cfg)
pool_size = 1 << 20
k = jax.random.key(1)
rays_d = jax.random.normal(k, (pool_size, 3))
rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
pool = RayPool(rays_o=jax.random.normal(k, (pool_size, 3)) * 0.1, rays_d=rays_d,
               rgb=jax.random.uniform(k, (pool_size, 3)), viewdirs=rays_d)


def fresh_state():
    params = model.init(jax.random.key(0))
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      fine_params={}, opt_state=tx.init((params, {})))


for tf, tb in [(1024, 512), (1024, 256), (1536, 512), (2048, 512),
               (1024, 768), (2048, 1024)]:
    try:
        fr = make_fused_nerf_render(model, 2.0, 6.0, normalize=True,
                                    tile_points_fwd=tf, tile_points_bwd=tb)
        step_fn = make_scan_train_step(
            model, tx, settings, R, jax.random.key(7), num_steps=K,
            donate=True, apply_fn=model.apply, fused_render=fr)
        state = fresh_state()
        state, m = step_fn(state, pool)
        _ = float(np.asarray(m["loss"][-1]))
        t0 = time.perf_counter()
        iters = 3
        for _ in range(iters):
            state, m = step_fn(state, pool)
        _ = float(np.asarray(m["loss"][-1]))
        dt = (time.perf_counter() - t0) / (iters * K)
        print(f"tf={tf:5d} tb={tb:5d}  {dt*1e3:7.3f} ms/step  "
              f"{R/dt:9.0f} rays/s", flush=True)
    except Exception as e:
        msg = str(e)
        if "vmem" in msg.lower():
            msg = "VMEM OOM"
        print(f"tf={tf:5d} tb={tb:5d}  FAILED: {type(e).__name__} {msg[:80]}",
              flush=True)
# extra combos appended by sweep round 2 are driven via env instead
