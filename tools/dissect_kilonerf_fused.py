#!/usr/bin/env python
"""Where does the FUSED KiloNeRF step spend its time? (VERDICT r3 item 3)

tools/dissect_kilonerf.py times the XLA grouped path; this one dissects the
Pallas grouped-kernel path (ops/pallas/fused_kilonerf.py) piece by piece at
the training shape, each piece as a scan-chained jitted program so tunnel
dispatch/fetch overhead cannot pollute the numbers:

  sort+plan      build_dispatch (argsort + searchsorted plan)
  gathers        to_tiles input gathers (loc/dir/expert column)
  pack           pack_params_multi (pytree -> block-diagonal group blocks)
  kernel fwd     the pallas_call alone, dispatch plan precomputed
  kernel fwd+bwd ... plus the backward kernel via jax.grad on wpack
  reorder        tile layout -> original order (sort_key_val + gather)
  apply fwd      the whole fused apply (everything above)
  apply fwd+bwd  jax.grad of the whole apply wrt params

Knobs: KN_POINTS (262144), KN_DTYPE (bfloat16), KN_TILE (256), KN_EPER.
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
from nerf_tpu.models.kilonerf import build_dispatch
from nerf_tpu.models.registry import grid_domain
from nerf_tpu.config import Config
from nerf_tpu.ops.pallas import fused_kilonerf as fk

N = int(os.environ.get("KN_POINTS", 262144))
T = int(os.environ.get("KN_TILE", 256))
REPS = 10
model = KiloNeRFModel(
    compute_dtype=os.environ.get("KN_DTYPE", "bfloat16"),
    hidden_dim=32, grid_res=8, domain=grid_domain(Config()),
    dispatch_tile=T,
)
e_env = os.environ.get("KN_EPER")
e_per = int(e_env) if e_env else max(1, 128 // model.hidden_dim)
params = model.init(jax.random.key(0))

rng = np.random.default_rng(0)
pts0 = jnp.asarray(rng.uniform(-1, 1, (N, 3)), jnp.float32)
dirs = jnp.asarray(rng.normal(size=(N, 3)), jnp.float32)
dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)

g3 = model.num_networks
ng = g3 // e_per
h = model.hidden_dim
real_p = 3 * (1 + 2 * model.pos_encoding_dim)
real_d = 3 * (1 + 2 * model.dir_encoding_dim)
p_pad = fk._round_up(real_p, 8)
d_pad = fk._round_up(real_d, 8)

apply_fused = fk.make_fused_kilonerf_apply(model, tile_fwd=T, tile_bwd=T,
                                           experts_per_step=e_per)
assert apply_fused is not None


def scan_time(name, body, arg=None):
    a0 = pts0 if arg is None else arg

    @jax.jit
    def run(a):
        def step(carry, _):
            s = body(carry)
            return carry + 1e-12 * s, s

        final, ss = jax.lax.scan(step, a, None, length=REPS)
        return ss[-1]

    out = run(a0)
    _ = float(np.asarray(out))  # compile + warm
    t0 = time.perf_counter()
    out = run(a0)
    _ = float(np.asarray(out))
    dt = (time.perf_counter() - t0) / REPS
    print(f"{name:28s}: {dt*1e3:8.2f} ms   ({N/dt/1e3:7.0f}k pts/s)",
          flush=True)
    return dt


# ---- pieces ---------------------------------------------------------------

def plan_only(p):
    vid, local = model.voxel_of(p)
    grp = (vid // e_per).astype(vid.dtype)
    order, gid, src, valid, counts = build_dispatch(grp, ng, T)
    return (jnp.sum(gid[:4].astype(jnp.float32))
            + jnp.sum(order[:4].astype(jnp.float32)))


def _make_tiles(p):
    n = p.shape[0]
    vid, local = model.voxel_of(p)
    grp = (vid // e_per).astype(vid.dtype)
    order, gid, src, valid, counts = build_dispatch(grp, ng, T)
    used = jnp.sum(-(-counts // T)).astype(jnp.int32)[None]
    orig_flat = jnp.where(
        valid.reshape(-1),
        jnp.concatenate(
            [order.astype(jnp.int32), jnp.full((1,), n, jnp.int32)]
        )[src.reshape(-1)],
        n,
    )

    # the combined payload apply() now builds: ONE 8-wide row gather
    e_col = ((vid % e_per).astype(jnp.float32)[:, None]
             if e_per > 1 else jnp.zeros((n, 1), jnp.float32))
    pay = jnp.concatenate(
        [local, e_col, dirs, jnp.zeros((n, 1), jnp.float32)], axis=1)
    pay = jnp.concatenate([pay, jnp.zeros((1, 8), pay.dtype)])
    pts_t = pay[orig_flat]
    return gid, used, pts_t, orig_flat, counts


def gathers_only(p):
    gid, used, pts_t, orig_flat, _ = _make_tiles(p)
    return jnp.sum(pts_t[0])


def pack_only(p):
    wpack = fk.pack_params_multi(params, p_pad, d_pad, h, e_per)
    return wpack[0, 0, 0] + 1e-12 * jnp.sum(p[0])


# precomputed plan for kernel-only rows
_plan = jax.jit(_make_tiles)(pts0)
_plan = jax.tree.map(lambda x: jax.device_put(x), _plan)
GID, USED, PTS_T, ORIG_FLAT, COUNTS = _plan
WPACK = jax.jit(
    lambda: fk.pack_params_multi(params, p_pad, d_pad, h, e_per)
)()

def apply_fwd(p):
    rgb, sigma = apply_fused(params, p, dirs)
    return jnp.sum(rgb[0]) + sigma[0]


def apply_bwd(p):
    g = jax.grad(
        lambda pr: jnp.sum(apply_fused(pr, p, dirs)[0])
    )(params)
    # reduce EVERY leaf: returning one scalar slice lets XLA DCE the other
    # leaves' unpack/pack-VJP glue (the Pallas bwd call itself is a single
    # un-DCE-able op, so only the XLA-side glue was at risk)
    return sum(jnp.sum(x) for x in jax.tree.leaves(g))


def reorder_only(p):
    out_t = PTS_T * 1.0 + 1e-12 * jnp.sum(p[0])
    out = fk._reorder(out_t, ORIG_FLAT, N)
    return jnp.sum(out[0])


print(f"N={N} T={T} e_per={e_per} dtype={model.compute_dtype} "
      f"platform={jax.devices()[0].platform}", flush=True)
scan_time("plan (sort+searchsorted)", plan_only)
scan_time("plan+gathers", gathers_only)
scan_time("pack_params_multi", pack_only)
scan_time("reorder (sort+gather)", reorder_only)
scan_time("apply fwd (everything)", apply_fwd)
scan_time("apply fwd+bwd", apply_bwd)
