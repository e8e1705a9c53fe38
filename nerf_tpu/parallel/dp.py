"""Explicit data-parallel training step via shard_map.

This is the explicit-collectives twin of the GSPMD path in
`nerf_tpu.train.step` (which relies on sharding constraints and lets XLA
place the psum). Here the mapping is spelled out per device:

  * the RayPool is sharded along the ``data`` mesh axis (each chip holds
    M/D rays in its HBM — the pool never exists replicated),
  * each chip samples ``batch/D`` rays from ITS OWN shard with a
    per-device PRNG key (fold_in of the step and the axis index),
  * each chip renders and differentiates locally,
  * gradients and metrics are ``psum``-averaged over ICI — the only
    communication in the whole step (MLP params are ~661k floats, so the
    all-reduce is microseconds on ICI and overlaps with the optimizer).

The sample axis stays chip-local by construction (it is never sharded), so
hierarchical inverse-CDF resampling needs no communication either.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from nerf_tpu.data.pipeline import RayBatch, RayPool
from nerf_tpu.render.renderer import RenderSettings, render_rays
from nerf_tpu.train.state import TrainState
from nerf_tpu.train.step import resolve_apply_fn, resolve_fused_render


def make_dp_train_step(
    model,
    tx,
    settings: RenderSettings,
    batch_size: int,
    base_key: jax.Array,
    mesh: Mesh,
    axis: str = "data",
    use_pallas: bool = True,
    donate: bool = True,
):
    """Returns ``step(state, pool) -> (state, metrics)`` with explicit
    per-device sampling and psum gradient reduction. ``pool`` must be placed
    with `nerf_tpu.parallel.mesh.shard_pool`."""
    fused_render = resolve_fused_render(model, settings, use_pallas)
    apply_fn = (model.apply if fused_render is not None
                else resolve_apply_fn(model, use_pallas))
    num_shards = mesh.shape[axis]
    if batch_size % num_shards:
        raise ValueError(f"batch_size {batch_size} not divisible by {num_shards}")
    local_batch = batch_size // num_shards

    use_fused_train = fused_render is not None and hasattr(fused_render, "train")

    def loss_fn(param_pair, batch: RayBatch, key):
        params, fine_params = param_pair
        if use_fused_train:
            from nerf_tpu.render.renderer import render_rays_train

            return render_rays_train(
                fused_render, params, batch.rays_o, batch.rays_d, key,
                settings, batch.rgb,
                fine_params=fine_params if fine_params else None,
                viewdirs=batch.viewdirs,
            )
        out = render_rays(
            apply_fn,
            params,
            batch.rays_o,
            batch.rays_d,
            key,
            settings,
            fine_params=fine_params if fine_params else None,
            viewdirs=batch.viewdirs,
            fused_render=fused_render,
        )
        mse = jnp.mean((out.rgb - batch.rgb) ** 2)
        loss = mse
        if settings.num_fine_samples > 0:
            loss = loss + jnp.mean((out.rgb_coarse - batch.rgb) ** 2)
        return loss, mse

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(axis), P()),
        out_specs=(P(), P()),
        # the fused Pallas render/train kernels declare no varying-mesh-axes
        # info, which trips check_vma at trace time on TPU; replication of
        # the outputs is real regardless (explicit pmean below)
        check_vma=False,
    )
    def grad_shard(param_pair, pool_shard: RayPool, step):
        my_idx = jax.lax.axis_index(axis)
        key = jax.random.fold_in(jax.random.fold_in(base_key, step), my_idx)
        k_sample, k_render = jax.random.split(key)

        batch = pool_shard.sample(k_sample, local_batch)
        (loss, mse), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            param_pair, batch, k_render
        )
        grads = jax.lax.pmean(grads, axis)
        loss = jax.lax.pmean(loss, axis)
        mse = jax.lax.pmean(mse, axis)
        return (loss, mse), grads

    def step(state: TrainState, pool: RayPool):
        (loss, mse), grads = grad_shard(
            (state.params, state.fine_params), pool, state.step
        )
        updates, opt_state = tx.update(
            grads, state.opt_state, (state.params, state.fine_params)
        )
        params, fine_params = jax.tree.map(
            lambda p, u: p + u, (state.params, state.fine_params), updates
        )
        new_state = TrainState(
            step=state.step + 1,
            params=params,
            fine_params=fine_params,
            opt_state=opt_state,
        )
        return new_state, {"loss": loss, "mse": mse, "psnr": -10.0 * jnp.log10(mse)}

    return jax.jit(step, donate_argnums=(0,) if donate else ())
