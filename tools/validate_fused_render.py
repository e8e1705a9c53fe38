#!/usr/bin/env python
"""Validate the fully fused render kernel against the pure-JAX path:
forward rgb/acc/depth/weights and parameter gradients on a fixed t grid."""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from nerf_tpu.models import NeRFModel
from nerf_tpu.ops.pallas.fused_render import make_fused_nerf_render
from nerf_tpu.ops.sampling import (
    deltas_from_t, normalize_positions, sample_positions,
)
from nerf_tpu.ops.volume import composite

R = int(os.environ.get("VR_RAYS", 64))
S = int(os.environ.get("VR_S", 256))
NEAR, FAR = 2.0, 6.0
INTERPRET = os.environ.get("VR_INTERPRET", "0") == "1"

model = NeRFModel(compute_dtype=os.environ.get("VR_DTYPE", "float32"))
params = model.init(jax.random.key(0))

rng = np.random.default_rng(0)
rays_o = jnp.asarray(rng.normal(scale=0.5, size=(R, 3)) + 4.0, jnp.float32) * 0  # keep pts in range
rays_o = jnp.asarray(rng.uniform(2.5, 3.5, (R, 3)), jnp.float32)
rd = rng.normal(size=(R, 3))
rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
rays_d = jnp.asarray(rd, jnp.float32)
viewdirs = rays_d

edges = np.linspace(NEAR, FAR, S + 1)
t = edges[:-1] + rng.uniform(0, 1, (R, S)) * (edges[1:] - edges[:-1])
t = jnp.asarray(t, jnp.float32)
deltas = deltas_from_t(t)


def pure(params, with_wb=True):
    pts = sample_positions(rays_o, rays_d, t)
    ptsn = normalize_positions(pts, NEAR, FAR)
    dirs = jnp.broadcast_to(viewdirs[:, None, :], ptsn.shape)
    rgb, sigma = model.apply(params, ptsn, dirs)
    return composite(rgb, sigma, deltas, t=t, white_background=False)


fr = make_fused_nerf_render(model, NEAR, FAR, normalize=True,
                            interpret=INTERPRET)
assert fr is not None

out_p = jax.jit(pure)(params)
out_f = jax.jit(lambda p: fr(p, rays_o, rays_d, viewdirs, t))(params)

for name, a, b in [
    ("rgb", out_p.rgb, out_f["rgb"]),
    ("acc", out_p.acc, out_f["acc"]),
    ("depth", out_p.depth, out_f["depth"]),
    ("weights", out_p.weights, out_f["weights"]),
]:
    err = float(jnp.max(jnp.abs(a - b)))
    print(f"fwd {name:8s} max|err| = {err:.3e}")

target = jnp.asarray(rng.uniform(0, 1, (R, 3)), jnp.float32)


def loss_pure(p):
    out = pure(p)
    rgb = out.rgb + (1.0 - out.acc[:, None])
    return jnp.mean((rgb - target) ** 2)


def loss_fused(p):
    out = fr(p, rays_o, rays_d, viewdirs, t)
    rgb = out["rgb"] + (1.0 - out["acc"][:, None])
    return jnp.mean((rgb - target) ** 2)


lp, gp = jax.jit(jax.value_and_grad(loss_pure))(params)
lf, gf = jax.jit(jax.value_and_grad(loss_fused))(params)
print(f"loss pure={float(lp):.6f} fused={float(lf):.6f}")

flat_p, _ = jax.tree.flatten(gp)
flat_f, _ = jax.tree.flatten(gf)
worst = 0.0
for a, b in zip(flat_p, flat_f):
    scale = float(jnp.max(jnp.abs(a))) + 1e-8
    err = float(jnp.max(jnp.abs(a - b))) / scale
    worst = max(worst, err)
print(f"grad worst rel err = {worst:.3e}")
