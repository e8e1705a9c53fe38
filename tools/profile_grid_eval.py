#!/usr/bin/env python
"""Profile the GRID-family full-image render at the bench shape: where do
the ms go between the fused grid kernel's brick-DMA roofline (sub-ms of
bulk traffic per frame) and the measured ~43-53k rays/s?

Same harness geometry as bench.py's render mode (real orbit pose, hw=
tile reorder) so numbers are comparable. Prints the frame time plus
per-op aggregate device times from a jax.profiler trace.

  EVAL_MODEL=plenoxels EVAL_TRACE=/tmp/trace python tools/profile_grid_eval.py
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
from nerf_tpu.models import create_model
from nerf_tpu.models.registry import grid_domain
from nerf_tpu.train.loop import render_settings_from_config
from nerf_tpu.train.step import make_eval_render

H = W = int(os.environ.get("EVAL_HW", 400))
S = int(os.environ.get("EVAL_S", 64))
F = int(os.environ.get("EVAL_F", 128))
MODEL = os.environ.get("EVAL_MODEL", "plenoxels")

cfg = Config(num_samples=S, num_fine_samples=F, model_type=MODEL)
model = create_model(MODEL, compute_dtype="bfloat16",
                     domain=grid_domain(cfg))
settings = render_settings_from_config(cfg)
params = model.init(jax.random.key(0))
fine_params = model.init(jax.random.key(1)) if F else {}

from nerf_tpu.data.poses import spherical_orbit
from nerf_tpu.data.rays import compute_rays_single

n = H * W
focal = 0.5 * W / np.tan(0.5 * 0.6911)
c2w = np.eye(4, dtype=np.float32)
c2w[:3] = spherical_orbit(4)[0][:3]
ro, rd = compute_rays_single(H, W, focal, c2w)
rays_o = jnp.asarray(ro.reshape(-1, 3), jnp.float32)
rays_d = jnp.asarray(rd.reshape(-1, 3), jnp.float32)

render = make_eval_render(model, settings)


def frame(i):
    out = render(params, fine_params, rays_o, rays_d, jax.random.key(i),
                 hw=(H, W))
    return float(np.asarray(out.rgb[0, 0]))  # host fetch = hard sync


frame(0)  # compile
t0 = time.perf_counter()
reps = int(os.environ.get("EVAL_REPS", 3))
for i in range(reps):
    frame(i + 1)
dt = (time.perf_counter() - t0) / reps
print(f"frame: {dt*1e3:.1f} ms  -> {n/dt/1e3:.0f}k rays/s  "
      f"({MODEL}, {H}x{W}, {S}+{F} samples)")

trace_dir = os.environ.get("EVAL_TRACE", "")
if trace_dir:
    jax.profiler.start_trace(trace_dir)
    frame(99)
    jax.profiler.stop_trace()
    paths = sorted(glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                             recursive=True), key=os.path.getmtime)
    if not paths:
        sys.exit(f"no *.trace.json.gz files under {trace_dir}")
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    agg = defaultdict(float)
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") == "X" and "dur" in ev:
            agg[ev.get("name", "?")] += ev["dur"]
    top = sorted(agg.items(), key=lambda kv: -kv[1])[:30]
    total = sum(agg.values())
    # 'X' (complete) events nest — parents include children — and host
    # threads are mixed in, so these are approximate INCLUSIVE durations,
    # useful for ranking, not an exact per-frame device total.
    print(f"-- top ops (approx inclusive us, one frame; sum {total:.0f}) --")
    for name, us in top:
        print(f"{us:10.0f}  {name[:110]}")
