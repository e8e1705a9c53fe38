#!/usr/bin/env python
"""Dissect the NGP train-step cost on TPU (VERDICT r3 item 5).

BENCH_NOTES records ~0.9 s/step at 1024x64 (~0.45 s at 16 samples) and
blames the 16-level hash-table gradient scatter. This isolates the pieces,
each scan-chained (10 reps in one dispatch) so tunnel overhead is out:

  fwd encode        the 16-level gather+trilinear encode alone
  fwd apply         full field fwd (encode + tiny MLPs)
  fwd render+loss   coarse render_rays + MSE (no grad)
  bwd no-tables     grad wrt MLPs only (tables stop_gradient'd):
                    isolates everything EXCEPT the table scatter
  bwd full          grad wrt everything (the real training grad)
  scatter sim       the 16 per-level (N*8)-row scatter-adds alone, from
                    precomputed indices/values
  adam update       optimizer update on a real-sized grad pytree

Env: RAYS (1024), SAMPLES (64), K (10).
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
from nerf_tpu.models.ngp import NGPModel
from nerf_tpu.render.renderer import RenderSettings, render_rays
from nerf_tpu.train.optim import make_optimizer

K = int(os.environ.get("K", 10))
R = int(os.environ.get("RAYS", 1024))
S = int(os.environ.get("SAMPLES", 64))

model = NGPModel(domain=grid_domain(Config()),
                 compute_dtype=os.environ.get("NGP_DTYPE", "bfloat16"))
params = jax.jit(model.init)(jax.random.key(0))
settings = RenderSettings(near=2.0, far=6.0, num_samples=S,
                          white_background=True)
tx = make_optimizer(Config(learning_rate=1e-2))
opt_state = jax.jit(lambda p: tx.init((p, {})))(params)

key = jax.random.key(1)
rays_d = jax.random.normal(key, (R, 3))
rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
rays_o = jax.random.normal(key, (R, 3)) * 0.1
target = jax.random.uniform(key, (R, 3))
N = R * S
pts = jax.random.uniform(key, (N, 3), minval=-1.0, maxval=1.0)
dirs = jnp.repeat(rays_d, S, axis=0)


def timed(name, body, k=None):
    k = K if k is None else k

    @jax.jit
    def run(p):
        def step(carry, _):
            s = body(carry)
            return carry + 1e-12 * s, s

        _, ss = jax.lax.scan(step, p, None, length=k)
        return ss[-1]

    t_c = time.perf_counter()
    out = run(pts)
    _ = float(np.asarray(out.reshape(-1)[0]))
    compile_s = time.perf_counter() - t_c
    t0 = time.perf_counter()
    out = run(pts)
    _ = float(np.asarray(out.reshape(-1)[0]))
    dt = (time.perf_counter() - t0) / k
    print(f"{name:24s}: {dt*1e3:8.2f} ms   (compile {compile_s:.0f}s)",
          flush=True)
    return dt


def fwd_encode(p):
    enc = model.encode(params["tables"], p)
    return jnp.sum(enc)


def fwd_apply(p):
    rgb, sigma = model.apply(params, p, dirs)
    return jnp.sum(rgb[0]) + sigma[0]


def loss_fn(prms, p):
    out = render_rays(
        lambda pr, x, d: model.apply(pr, x, d),
        prms, rays_o + 1e-12 * p[0, 0], rays_d, jax.random.key(2),
        settings,
    )
    return jnp.mean((out.rgb - target) ** 2)


def fwd_render(p):
    return loss_fn(params, p)


def _live(tree):
    """Reduce EVERY leaf so XLA cannot dead-code-eliminate any gradient.
    (The first version of this tool returned one scalar slice of one
    table's grad — XLA then DCE'd 15 of the 16 per-level scatters and
    'bwd full' read 81 ms while the un-DCE-able real step read 538 ms.)"""
    return sum(jnp.sum(x) for x in jax.tree.leaves(tree))


def bwd_no_tables(p):
    def f(mlps):
        prms = dict(params, density=mlps[0], color=mlps[1])
        prms = dict(prms,
                    tables=[jax.lax.stop_gradient(t) for t in prms["tables"]])
        return loss_fn(prms, p)

    g = jax.grad(f)((params["density"], params["color"]))
    return _live(g)


def bwd_full(p):
    g = jax.grad(lambda prms: loss_fn(prms, p))(params)
    return _live(g)


# precomputed scatter inputs: real indices from the encode of pts
def _scatter_inputs():
    from nerf_tpu.models.common import remap_domain

    x01 = jnp.clip((remap_domain(pts, model.domain) + 1.0) * 0.5, 0.0, 1.0)
    offs = np.stack(np.meshgrid([0, 1], [0, 1], [0, 1],
                                indexing="ij"), axis=-1).reshape(8, 3)
    offs_j = jnp.asarray(offs, jnp.uint32)
    idxs, ws = [], []
    for lvl, res in enumerate(model.level_resolutions()):
        res = int(res)
        x = x01 * res
        x0 = jnp.minimum(jnp.floor(x), res - 1)
        f = x - x0
        cell = x0.astype(jnp.uint32)[:, None, :] + offs_j[None]
        idxs.append(model._corner_index(cell, res))
        ws.append(jnp.prod(
            jnp.where(offs_j[None].astype(bool), f[:, None, :],
                      1.0 - f[:, None, :]), axis=-1))
    return idxs, ws


IDXS, WS = jax.jit(_scatter_inputs)()
T_ROWS = 1 << model.log2_table
F = model.feat_dim


def scatter_sim(p):
    g_enc = p[:, :1] * jnp.ones((N, F))  # fake per-point cotangent
    tot = 0.0
    for lvl in range(model.num_levels):
        vals = (WS[lvl][..., None] * g_enc[:, None, :]).reshape(N * 8, F)
        g_tab = jnp.zeros((T_ROWS, F), jnp.float32).at[
            IDXS[lvl].reshape(-1)].add(vals)
        tot = tot + jnp.sum(g_tab)
    return tot


def adam_update(p):
    g = jax.tree.map(lambda x: x * 0 + 1e-3, params)
    updates, _ = tx.update((g, {}), opt_state, (params, {}))
    return _live(updates) + 1e-12 * p[0, 0]


def grad_plus_adam(p):
    """grad + optimizer update in ONE program — the real train step's
    shape (every update leaf kept live; see _live)."""
    g = jax.grad(lambda prms: loss_fn(prms, p))(params)
    updates, _ = tx.update((g, {}), opt_state, (params, {}))
    return _live(updates)


def real_step_row():
    """The actual make_train_step program, chained exactly as bench.py
    measures it (per-step dispatch, donated state)."""
    import bench as bench_mod

    step_fn, state, pool = bench_mod._build(R, S, model.compute_dtype,
                                            True, 1, "ngp")
    rps, _, compile_s = bench_mod._measure(step_fn, state, pool, R, 5, 1,
                                           warmup=2)
    print(f"{'real train step':24s}: {R / rps * 1e3:8.2f} ms   "
          f"(compile {compile_s:.0f}s)", flush=True)


print(f"R={R} S={S} N={N} levels={model.num_levels} "
      f"table=2^{model.log2_table} platform={jax.devices()[0].platform}",
      flush=True)
only = os.environ.get("NGP_ROWS")
rows = [
    ("adam update", adam_update, 5),
    ("fwd encode", fwd_encode, 5),
    ("fwd apply", fwd_apply, 5),
    ("scatter sim (16 levels)", scatter_sim, 3),
    ("fwd render+loss", fwd_render, 3),
    ("bwd no-tables", bwd_no_tables, 3),
    ("bwd full", bwd_full, 3),
    ("grad+adam", grad_plus_adam, 3),
]
for name, body, k in rows:
    if only and name.split()[0] not in only:
        continue
    try:
        timed(name, body, k)
    except Exception as exc:  # keep later rows alive past one bad program
        print(f"{name:24s}: ERROR {type(exc).__name__}: {exc}", flush=True)
if not only or "real" in only:
    real_step_row()
