"""The jitted training step — the whole hot loop in one compiled program.

The reference's per-iteration work (batch fetch -> H2D copy -> chunked
render -> MSE -> backward -> Adam -> LR step, /root/reference/train.py:154-183)
becomes ONE jit-compiled function of (TrainState, RayPool): on-device batch
sampling, a single un-chunked render, value_and_grad, and the optax update,
with the state donated so parameter/optimizer buffers update in place in
HBM. Per-step randomness derives from ``fold_in(base_key, step)``, so runs
are exactly reproducible and resume continues the same random sequence.

Loss matches the reference: MSE of rendered vs target rgb (train.py:124,180);
with hierarchical sampling the coarse MSE is added (original-NeRF style),
which the coarse-only reference never reaches.
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp

from nerf_tpu.data.pipeline import RayBatch, RayPool
from nerf_tpu.render.renderer import RenderSettings, render_image, render_rays
from nerf_tpu.train.state import TrainState


def resolve_apply_fn(model, use_pallas: bool = True, probe: bool = True) -> Callable:
    """Pick the field evaluator: fused Pallas kernel on TPU when available
    and applicable, else the pure-JAX reference path.

    ``probe`` compiles one tiny fwd+bwd through the kernel up front: Mosaic
    compile failures surface lazily at the first training step otherwise, and
    a probe failure downgrades to the pure-JAX path with a warning instead of
    crashing the run."""
    if not use_pallas:
        return model.apply
    try:
        from nerf_tpu.ops.pallas import get_fused_apply

        fused = get_fused_apply(model)
        if fused is None:
            return model.apply
        if probe:
            # numpy, not device arrays: closure constants of the probe
            # lower without a per-constant D2H fetch (~11 s each on the
            # tunneled TPU)
            pts = np.zeros((4, 3), np.float32)
            drs = np.ones((4, 3), np.float32)
            params = jax.eval_shape(model.init, jax.random.key(0))
            params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), params)

            def probe_loss(p):
                rgb, sigma = fused(p, pts, drs)
                return jnp.sum(rgb) + jnp.sum(sigma)

            jax.block_until_ready(jax.jit(jax.grad(probe_loss)).lower(params)
                                  .compile()(params))
        return fused
    except Exception as e:  # pragma: no cover - backend-specific
        print(f"Pallas kernel unavailable ({type(e).__name__}); "
              "falling back to pure-JAX apply.")
        return model.apply


def resolve_fused_render(model, settings: RenderSettings,
                         use_pallas: bool = True, probe: bool = True,
                         for_train: bool = True):
    """The fully fused render kernel for this model/settings, or None.

    Like `resolve_apply_fn`, a probe compiles one tiny fwd+bwd up front so
    Mosaic failures downgrade to the next-best path (fused field kernel or
    pure JAX) instead of crashing the first training step.

    ``for_train=False`` (eval/render call sites) additionally admits
    eval-only kernels (``fr.eval_only``, e.g. the fused grid render) whose
    forward has no VJP — training routes must never see those."""
    if not use_pallas:
        return None
    try:
        from nerf_tpu.ops.pallas import get_fused_render

        fr = get_fused_render(model, settings)
        if fr is None:
            return None
        if for_train and getattr(fr, "eval_only", False):
            return None
        if probe and getattr(fr, "eval_only", False):
            # forward value-probe only: there is no train route and the
            # forward VJP is intentionally absent
            params = jax.eval_shape(model.init, jax.random.key(0)) \
                if hasattr(model, "init") else None
            if params is not None:
                params = jax.tree.map(
                    lambda s: jnp.zeros(s.shape, s.dtype), params)
            ro = np.zeros((8, 3), np.float32)
            rd = np.ones((8, 3), np.float32)
            t = np.repeat(np.linspace(0.1, 1.0, 8, dtype=np.float32)[None, :],
                          8, 0)

            def probe_eval(p):
                out = fr(p, ro, rd, rd, t)
                return jnp.sum(out["rgb"]) + jnp.sum(out["acc"])

            jax.block_until_ready(
                jax.jit(probe_eval).lower(params).compile()(params))
            return fr
        if probe:
            params = jax.eval_shape(model.init, jax.random.key(0))
            params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), params)
            ro = np.zeros((8, 3), np.float32)
            rd = np.ones((8, 3), np.float32)
            t = np.repeat(np.linspace(0.1, 1.0, 8, dtype=np.float32)[None, :],
                          8, 0)

            def probe_fwd(p):
                out = fr(p, ro, rd, rd, t)
                return jnp.sum(out["rgb"]) + jnp.sum(out["acc"])

            if hasattr(fr, "train"):
                # Training goes through the single-kernel train pass, so the
                # forward route only needs to evaluate (eval/validation path);
                # grad-probing it would wrongly reject kernels whose forward
                # VJP is intentionally unimplemented (e.g. GaborNet).
                jax.block_until_ready(
                    jax.jit(probe_fwd).lower(params).compile()(params)
                )
                tgt = np.zeros((8, 3), np.float32)

                def probe_train(p):
                    return fr.train(p, ro, rd, rd, t, tgt, True)[0]

                jax.block_until_ready(
                    jax.jit(jax.grad(probe_train)).lower(params)
                    .compile()(params)
                )
            else:
                # No fused train pass: training differentiates through the
                # forward route, so the probe must exercise its VJP.
                jax.block_until_ready(
                    jax.jit(jax.grad(probe_fwd)).lower(params).compile()(params)
                )
        return fr
    except Exception as e:  # pragma: no cover - backend-specific
        print(f"Fused render kernel unavailable ({type(e).__name__}); "
              "falling back to the field kernel / pure-JAX path.")
        return None


def _make_step_body(
    apply_fn: Callable,
    tx,
    settings: RenderSettings,
    batch_size: int,
    base_key: jax.Array,
    data_sharding=None,
    fused_render=None,
    epoch_sampling: bool = False,
    regularizer: Optional[Callable] = None,
    occupancy_opts: Optional[tuple] = None,
):
    """The un-jitted single-iteration body shared by the one-step and
    scanned trainers: sample batch -> render -> MSE -> grad -> optax update.

    ``regularizer(param_pair) -> scalar`` is added to the photometric loss
    (but not to the logged mse) — fit() wires the grid families' TV prior
    through it.

    ``occupancy_opts = (domain, num_bins, floor)`` enables the optional
    ``occ_grid`` step argument: fit() rebakes an occupancy prior from the
    live field at intervals and passes it as a TRACED array (not a closure
    constant, so a rebake never retraces), and the coarse pass draws its
    samples from the prior's inverse CDF (ops/occupancy.py)."""
    # epoch-permutation sampling keys the per-epoch cipher off a stream
    # disjoint from the per-step render keys
    k_epoch = jax.random.fold_in(base_key, 0x7FFFFFFF)
    # Single-kernel fused train pass (fwd + MSE + bwd in one Pallas call,
    # no forward recompute) when the kernel provides it.
    use_fused_train = fused_render is not None and hasattr(fused_render, "train")

    def _occ(occ_grid):
        if occ_grid is None:
            return None
        from nerf_tpu.ops.occupancy import OccupancyGrid

        domain, num_bins, floor = occupancy_opts
        return OccupancyGrid(grid=occ_grid, domain=domain,
                             num_bins=num_bins, floor=floor)

    def loss_fn(param_pair, batch: RayBatch, key: jax.Array, occ_grid):
        params, fine_params = param_pair
        if use_fused_train:
            from nerf_tpu.render.renderer import render_rays_train

            loss, mse = render_rays_train(
                fused_render,
                params,
                batch.rays_o,
                batch.rays_d,
                key,
                settings,
                batch.rgb,
                fine_params=fine_params if fine_params else None,
                viewdirs=batch.viewdirs,
                occupancy=_occ(occ_grid),
            )
            if regularizer is not None:
                loss = loss + regularizer(param_pair)
            return loss, mse
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
            occupancy=_occ(occ_grid),
        )
        mse = jnp.mean((out.rgb - batch.rgb) ** 2)
        loss = mse
        if settings.num_fine_samples > 0:
            loss = loss + jnp.mean((out.rgb_coarse - batch.rgb) ** 2)
        if regularizer is not None:
            loss = loss + regularizer(param_pair)
        return loss, mse

    def step(state: TrainState, pool: RayPool, occ_grid=None):
        key = jax.random.fold_in(base_key, state.step)
        k_sample, k_render = jax.random.split(key)

        if epoch_sampling:
            batch = pool.sample_epoch(k_epoch, state.step, batch_size)
        else:
            batch = pool.sample(k_sample, batch_size)
        if data_sharding is not None:
            batch = jax.tree.map(
                lambda x: jax.lax.with_sharding_constraint(x, data_sharding), batch
            )

        (loss, mse), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            (state.params, state.fine_params), batch, k_render, occ_grid
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
        metrics = {
            "loss": loss,
            "mse": mse,
            "psnr": -10.0 * jnp.log10(mse),
        }
        return new_state, metrics

    return step


def make_train_step(
    model,
    tx,
    settings: RenderSettings,
    batch_size: int,
    base_key: jax.Array,
    use_pallas: bool = True,
    data_sharding=None,
    donate: bool = True,
    apply_fn: Optional[Callable] = None,
    fused_render=None,
    epoch_sampling: bool = False,
    regularizer: Optional[Callable] = None,
    occupancy_opts: Optional[tuple] = None,
):
    """Returns ``step(state, pool[, occ_grid]) -> (state, metrics)``
    (jitted).

    ``data_sharding`` optionally constrains the sampled ray batch onto the
    mesh's data axis; with replicated params XLA then emits the gradient
    all-reduce (psum over ICI) automatically.
    """
    if apply_fn is None:
        apply_fn = resolve_apply_fn(model, use_pallas)
        if fused_render is None:
            fused_render = resolve_fused_render(model, settings, use_pallas)
    step = _make_step_body(
        apply_fn, tx, settings, batch_size, base_key, data_sharding,
        fused_render=fused_render, epoch_sampling=epoch_sampling,
        regularizer=regularizer, occupancy_opts=occupancy_opts,
    )
    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_scan_train_step(
    model,
    tx,
    settings: RenderSettings,
    batch_size: int,
    base_key: jax.Array,
    num_steps: int,
    use_pallas: bool = True,
    data_sharding=None,
    donate: bool = True,
    apply_fn: Optional[Callable] = None,
    fused_render=None,
    epoch_sampling: bool = False,
    regularizer: Optional[Callable] = None,
    occupancy_opts: Optional[tuple] = None,
):
    """Returns ``step_n(state, pool[, occ_grid]) -> (state, metrics)``
    running
    ``num_steps`` training iterations inside ONE compiled program via
    ``lax.scan``; ``metrics`` leaves are stacked ``(num_steps,)`` arrays.

    Because each iteration's randomness and batch selection derive from
    ``state.step`` (fold_in), a scan of N steps is bit-identical to N
    single-step calls — chunking is purely a dispatch-amortization choice.
    Host<->device dispatch costs ~1 ms per call on tunneled/remote runtimes
    and ~100 us locally; at ~7 ms of real compute per reference-shape step
    that overhead is material, and between host touchpoints (log/val/save
    boundaries) there is nothing for the host to do anyway.
    """
    if apply_fn is None:
        apply_fn = resolve_apply_fn(model, use_pallas)
        if fused_render is None:
            fused_render = resolve_fused_render(model, settings, use_pallas)
    one_step = _make_step_body(
        apply_fn, tx, settings, batch_size, base_key, data_sharding,
        fused_render=fused_render, epoch_sampling=epoch_sampling,
        regularizer=regularizer, occupancy_opts=occupancy_opts,
    )

    def step_n(state: TrainState, pool: RayPool, occ_grid=None):
        # occ_grid is constant across the chunk by design: fit() rebakes
        # only at event boundaries
        def body(carry, _):
            new_state, metrics = one_step(carry, pool, occ_grid)
            return new_state, metrics

        return jax.lax.scan(body, state, None, length=num_steps)

    return jax.jit(step_n, donate_argnums=(0,) if donate else ())


def make_eval_render(
    model,
    settings: RenderSettings,
    use_pallas: bool = True,
    apply_fn: Optional[Callable] = None,
    fused_render=None,
    mesh=None,
    occupancy=None,
):
    """Returns a jitted full-image renderer:
    ``render(params, fine_params, rays_o, rays_d, key, viewdirs=None,
    hw=None) -> RenderOutput``. Memory is bounded by
    ``settings.chunk_size`` via lax.map tiling.

    When ``hw=(h, w)`` is passed and the model is a grid family, rays are
    reordered into spatial pixel blocks before rendering and the outputs
    restored to scanline order after — the coherence the fused grid
    kernel needs. Both permutations are device-side gathers (the index
    arrays are cached on device per ``hw``): on a tunneled TPU a
    host-side round-trip of the inputs+outputs (~18 MB/frame at 400^2)
    used to cost multiples of the render itself.

    When ``mesh`` (a multi-device, single-process jax.sharding.Mesh) is
    given, the render is shard_map'd over the mesh's ``data`` axis: rays
    split into contiguous per-chip shards, params replicated, each chip
    running the full per-ray pipeline locally. Unlike plain GSPMD jit,
    this manual partitioning lets the per-chip Pallas render kernels —
    including the coherent grid kernel, which GSPMD cannot partition —
    engage on every chip; the only cross-chip traffic is the output's
    logical concat. Ray counts are padded to chips x 64 so shard
    boundaries stay on the 8x8 pixel-block boundaries ``tile_ray_order``
    emits (a split block would break a tile's spatial coherence)."""
    if apply_fn is None:
        apply_fn = resolve_apply_fn(model, use_pallas)
        if fused_render is None:
            fused_render = resolve_fused_render(model, settings, use_pallas,
                                                for_train=False)
    # Grid families declare wants_tile_order (ray order is semantically
    # neutral — each ray renders independently; the permutation round-trips
    # on the host). Pointless when the kernel is disabled (pure tier).
    tile_order = (getattr(model, "wants_tile_order", False)
                  and getattr(model, "use_grid_kernel", True))
    precompute = getattr(model, "precompute", None)
    perm_cache: dict = {}

    ndev = int(np.prod(mesh.devices.shape)) if mesh is not None else 1
    use_mesh = ndev > 1 and jax.process_count() == 1
    # Shards must not split an 8x8 pixel block (64 rays, tile_ray_order).
    align = 64 * ndev if use_mesh else 0

    def _render_body(params, fine_params, rays_o, rays_d, viewdirs, key):
        return render_image(
            apply_fn,
            params,
            rays_o,
            rays_d,
            key,
            settings,
            fine_params=fine_params if fine_params else None,
            viewdirs=viewdirs,
            fused_render=fused_render,
            # an OccupancyGrid prior concentrates the coarse samples in
            # occupied space (ops/occupancy.py) — a closure constant, so
            # it replicates onto every chip under the shard_map below
            occupancy=occupancy,
        )

    if use_mesh:
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        axis = "data" if "data" in mesh.axis_names else mesh.axis_names[0]

        def _shard_body(params, fine_params, rays_o, rays_d, viewdirs, key):
            # decorrelate the stratified jitter across ray shards
            key = jax.random.fold_in(key, jax.lax.axis_index(axis))
            return _render_body(params, fine_params, rays_o, rays_d,
                                viewdirs, key)

        _sharded = shard_map(
            _shard_body,
            mesh=mesh,
            in_specs=(P(), P(), P(axis), P(axis), P(axis), P()),
            out_specs=P(axis),
            # pallas_call declares no varying-mesh-axes info; the body is
            # per-shard-local anyway (no collectives, outputs all sharded)
            check_vma=False,
        )

    @jax.jit
    def _render(params, fine_params, rays_o, rays_d, viewdirs, key):
        if precompute is not None:
            # render-time prep (e.g. the grid families' pre-packed bricks)
            # runs ONCE here, outside render_image's lax.map chunk loop
            # (and outside the shard_map — it's a function of replicated
            # params, so its product is replicated too)
            params = precompute(params)
            if fine_params:
                fine_params = precompute(fine_params)
        if use_mesh:
            return _sharded(params, fine_params, rays_o, rays_d, viewdirs,
                            key)
        return _render_body(params, fine_params, rays_o, rays_d, viewdirs,
                            key)

    def render(params, fine_params, rays_o, rays_d, key, viewdirs=None,
               hw=None):
        if viewdirs is None:
            viewdirs = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
        perm = inv = None
        if tile_order and hw is not None and hw[0] * hw[1] == rays_o.shape[0]:
            if hw not in perm_cache:
                from nerf_tpu.ops.pallas.fused_grid import tile_ray_order

                p = tile_ray_order(hw[0], hw[1])
                perm_cache[hw] = (jnp.asarray(p),
                                  jnp.asarray(np.argsort(p)))
            perm, inv = perm_cache[hw]
            rays_o = jnp.take(jnp.asarray(rays_o), perm, axis=0)
            rays_d = jnp.take(jnp.asarray(rays_d), perm, axis=0)
            viewdirs = jnp.take(jnp.asarray(viewdirs), perm, axis=0)
        if use_mesh:
            # params restored from a checkpoint (or trained single-device)
            # arrive committed to one device — incompatible with the
            # mesh-spanning shard_map; re-place replicated (no-op when
            # already mesh-placed, e.g. from fit()). Rays get the same
            # treatment: a caller may pass arrays committed to a single
            # device (e.g. sliced from a device-resident pool), which the
            # mesh jit would otherwise reject with a device-assignment
            # error.
            from jax.sharding import NamedSharding, PartitionSpec

            rep = NamedSharding(mesh, PartitionSpec())
            params = jax.device_put(params, rep)
            if fine_params:
                fine_params = jax.device_put(fine_params, rep)
            rays_o = jax.device_put(jnp.asarray(rays_o), rep)
            rays_d = jax.device_put(jnp.asarray(rays_d), rep)
            viewdirs = jax.device_put(jnp.asarray(viewdirs), rep)
        num_rays = rays_o.shape[0]
        pad = (-num_rays) % align if align else 0
        if pad:
            def padded(x):
                filler = jnp.ones((pad,) + x.shape[1:], x.dtype)
                return jnp.concatenate([x, filler], axis=0)

            rays_o, rays_d = padded(rays_o), padded(rays_d)
            viewdirs = padded(viewdirs)
        out = _render(params, fine_params, rays_o, rays_d, viewdirs, key)
        if pad:
            out = type(out)(*(x[:num_rays] for x in out))
        if perm is not None:
            out = type(out)(*(jnp.take(x, inv, axis=0) for x in out))
        return out

    return render
