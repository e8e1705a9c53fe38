#!/usr/bin/env python
"""Where does the FUSED KiloNeRF step spend its time? (round-5 pipeline)

Dissects the mixed-tile grouped-kernel path (ops/pallas/fused_kilonerf.py)
at the training shape, each piece as a scan-chained jitted program so
tunnel dispatch/fetch overhead cannot pollute the numbers:

  prep           voxel_of + payload build + the ONE payload-carrying sort
                 + per-tile group ids (the whole dispatch)
  pack           pack_params_multi (pytree -> block-diagonal group blocks)
  apply fwd      the full fused apply (prep + pack + fwd kernel + unsort)
  apply fwd+bwd  jax.grad of the full apply wrt params (adds the main +
                 boundary backward calls and the unsort-VJP sort)

Knobs: KN_POINTS (262144), KN_DTYPE (bfloat16), KN_TILE (256), KN_EPER.
History: the round-4 tile-aligned pipeline measured apply fwd 14.1 ms /
fwd+bwd 17.3 ms at this shape; the mixed-tile rewrite (r5) measures
~6.7 / ~10 ms (bench row 42.0k -> 58.0k rays/s).
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
params = jax.jit(model.init)(jax.random.key(0))

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


def prep_only(p):
    """The whole dispatch: voxel_of + payload + sort + tile group ids."""
    n = p.shape[0]
    vid, local = model.voxel_of(p)
    grp = (vid // e_per).astype(jnp.int32)
    e_col = ((vid % e_per).astype(jnp.float32)[:, None]
             if e_per > 1 else jnp.zeros((n, 1), jnp.float32))
    pay = jnp.concatenate(
        [local, e_col, dirs, grp.astype(jnp.float32)[:, None]], axis=1)
    n_tot = fk._round_up(n + ng * T, T)
    dg = np.repeat(np.arange(ng, dtype=np.int32), T)
    dg = np.concatenate([dg, np.full(n_tot - n - ng * T, ng - 1, np.int32)])
    pay_d = np.zeros((n_tot - n, 8), np.float32)
    pay_d[:, 7] = dg
    keys = jnp.concatenate([grp, jnp.asarray(dg)])
    pay_all = jnp.concatenate([pay, jnp.asarray(pay_d)])
    iota = jnp.arange(n_tot, dtype=jnp.int32)
    so = jax.lax.sort((keys, iota) + tuple(pay_all[:, j] for j in range(8)),
                      num_keys=1)
    bt = so[0].reshape(n_tot // T, T)
    return (so[2][0] + bt[0, 0].astype(jnp.float32)
            + so[1][0].astype(jnp.float32))


def pack_only(p):
    wpack = fk.pack_params_multi(params, p_pad, d_pad, h, e_per)
    return wpack[0, 0, 0] + 1e-12 * jnp.sum(p[0])


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


print(f"N={N} T={T} e_per={e_per} dtype={model.compute_dtype} "
      f"platform={jax.devices()[0].platform}", flush=True)
scan_time("prep (sort + tile ids)", prep_only)
scan_time("pack_params_multi", pack_only)
scan_time("apply fwd (everything)", apply_fwd)
scan_time("apply fwd+bwd", apply_bwd)
