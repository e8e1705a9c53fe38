#!/usr/bin/env python
"""Profile the full-image (eval) render path: where do the ms go between the
fused forward kernel's ~450k rays/s and the measured full-image throughput?

Prints per-op aggregate device times from a jax.profiler trace plus the
end-to-end frame time at the BENCH_NOTES shape (400x400, 64+128).
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

from nerf_tpu.models import NeRFModel
from nerf_tpu.render.renderer import RenderSettings
from nerf_tpu.train.step import make_eval_render

H = W = int(os.environ.get("EVAL_HW", 400))
S = int(os.environ.get("EVAL_S", 64))
F = int(os.environ.get("EVAL_F", 128))
CHUNK = int(os.environ.get("EVAL_CHUNK", 8192))

model = NeRFModel(compute_dtype="bfloat16")
settings = RenderSettings(
    near=2.0, far=6.0, num_samples=S, num_fine_samples=F,
    white_background=True, chunk_size=CHUNK,
)
params = model.init(jax.random.key(0))
fine_params = model.init(jax.random.key(1))

rng = np.random.default_rng(0)
n = H * W
rays_o = jnp.asarray(rng.normal(scale=0.1, size=(n, 3)), jnp.float32)
rd = rng.normal(size=(n, 3))
rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
rays_d = jnp.asarray(rd, jnp.float32)

render = make_eval_render(model, settings)

def frame(i):
    return render(params, fine_params, rays_o, rays_d, jax.random.key(i))

out = frame(0)
_ = float(np.asarray(out.rgb[0, 0]))  # force

t0 = time.perf_counter()
reps = 3
prev = 0.0
for i in range(reps):
    out = frame(i + 1)
    prev = float(np.asarray(out.rgb[0, 0])) + prev * 0  # chain-ish fetch
dt = (time.perf_counter() - t0) / reps
print(f"frame: {dt*1e3:.1f} ms  -> {n/dt/1e3:.0f}k rays/s  "
      f"({H}x{W}, {S}+{F} samples, chunk {CHUNK})")

trace_dir = os.environ.get("EVAL_TRACE", "")
if trace_dir:
    jax.profiler.start_trace(trace_dir)
    out = frame(99)
    _ = float(np.asarray(out.rgb[0, 0]))
    jax.profiler.stop_trace()
    paths = sorted(glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                             recursive=True), key=os.path.getmtime)
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    agg = defaultdict(float)
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") == "X" and "dur" in ev:
            name = ev.get("name", "?")
            # only device lanes: skip python/host threads
            agg[name] += ev["dur"]
    top = sorted(agg.items(), key=lambda kv: -kv[1])[:30]
    total = sum(agg.values())
    print(f"-- top ops (us, one frame; total {total:.0f}) --")
    for name, us in top:
        print(f"{us:10.0f}  {name[:110]}")
