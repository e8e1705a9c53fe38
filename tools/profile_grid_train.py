#!/usr/bin/env python
"""Profile the REAL plenoxels train step (the bench configuration) and
print the top device ops — the op-level truth for where the 88 ms/step
goes (gathers? scatter-add? optimizer?).

Env: TRACE_DIR (required for the op table), RAYS, SAMPLES, GRID_RES, K.
"""
from __future__ import annotations

import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from nerf_tpu.config import Config
from nerf_tpu.data.pipeline import RayPool
from nerf_tpu.models.registry import grid_domain
from nerf_tpu.models import create_model
from nerf_tpu.render.renderer import RenderSettings
from nerf_tpu.train.optim import make_optimizer
from nerf_tpu.train.state import TrainState
from nerf_tpu.train.step import make_train_step

K = int(os.environ.get("K", 10))
R = int(os.environ.get("RAYS", 1024))
S = int(os.environ.get("SAMPLES", 64))
GR = int(os.environ.get("GRID_RES", 128))
MODEL = os.environ.get("MODEL", "plenoxels")

cfg = Config(learning_rate=1e-2)
model = create_model(MODEL, domain=grid_domain(cfg), grid_res=GR,
                     compute_dtype="bfloat16")
settings = RenderSettings(near=2.0, far=6.0, num_samples=S,
                          white_background=True, jitter_mode="per_ray")
tx = make_optimizer(cfg)
params = model.init(jax.random.key(0))
state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                   fine_params={}, opt_state=tx.init((params, {})))

pool_size = 1 << 18
k = jax.random.key(1)
rays_d = jax.random.normal(k, (pool_size, 3))
rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
pool = RayPool(rays_o=jax.random.normal(k, (pool_size, 3)) * 0.1,
               rays_d=rays_d, rgb=jax.random.uniform(k, (pool_size, 3)),
               viewdirs=rays_d)

step_fn = make_train_step(model, tx, settings, R, jax.random.key(2),
                          use_pallas=False, donate=True)

state, m = step_fn(state, pool)
float(np.asarray(m["loss"]))  # compile + warm
t0 = time.perf_counter()
for _ in range(K):
    state, m = step_fn(state, pool)
float(np.asarray(m["loss"]))
dt = (time.perf_counter() - t0) / K
print(f"{MODEL} {GR}^3, {R}x{S}: {dt*1e3:.1f} ms/step "
      f"({R/dt/1e3:.1f}k rays/s)")

trace_dir = os.environ.get("TRACE_DIR", "")
if trace_dir:
    jax.profiler.start_trace(trace_dir)
    state, m = step_fn(state, pool)
    float(np.asarray(m["loss"]))
    jax.profiler.stop_trace()
    paths = sorted(glob.glob(os.path.join(trace_dir, "**",
                                          "*.trace.json.gz"),
                             recursive=True), key=os.path.getmtime)
    if not paths:
        sys.exit(f"no trace files under {trace_dir}")
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    agg = defaultdict(float)
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") == "X" and "dur" in ev:
            agg[ev.get("name", "?")] += ev["dur"]
    top = sorted(agg.items(), key=lambda kv: -kv[1])[:25]
    print("-- top ops (approx inclusive us, one step) --")
    for name, us in top:
        print(f"{us:10.0f}  {name[:110]}")
