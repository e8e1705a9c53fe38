"""End-to-end training driver.

Preserves every observable trainer behavior of the reference
(/root/reference/train.py:20-263): seeding, config summary, interval-driven
logging/checkpointing/validation (same conditions), resume, final save, and
checkpoint-on-SIGINT — while the step itself is the jitted TPU program from
`nerf_tpu.train.step` (or the explicit shard_map variant when a multi-device
mesh is active).

Asynchronous dispatch: metrics are device arrays; the loop only forces them
to host on log steps, so between logs the host runs ahead and the TPU queue
stays full (the reference pays a D2H sync every log via ``loss.item()``,
utils.py:73 — same cadence here, zero extra syncs).
"""

from __future__ import annotations

import datetime
import os
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from nerf_tpu.config import Config
from nerf_tpu.data.pipeline import load_scene
from nerf_tpu.data.rays import compute_rays
from nerf_tpu.render.renderer import RenderSettings
from nerf_tpu.train.optim import lr_schedule
from nerf_tpu.train.state import TrainState, create_train_state
from nerf_tpu.train.step import make_eval_render, make_train_step
from nerf_tpu.utils.checkpoint import load_checkpoint, read_metadata, save_checkpoint
from nerf_tpu.utils.logging import MetricLogger
from nerf_tpu.utils.metrics import mse_to_psnr
from nerf_tpu.utils.timer import format_elapsed_time


def render_settings_from_config(cfg: Config, ndc: bool = False) -> RenderSettings:
    return RenderSettings(
        near=cfg.near,
        far=cfg.far,
        num_samples=cfg.num_samples,
        num_fine_samples=cfg.num_fine_samples,
        white_background=cfg.white_background and not ndc,
        jitter_mode=cfg.jitter_mode,
        perturb=cfg.perturb,
        chunk_size=cfg.chunk_size,
        normalize_positions=not ndc,
    )


def print_config_summary(cfg: Config) -> None:
    print("===== Training Configuration Summary =====")
    for field in (
        "dataset_path num_random_rays chunk_size num_samples num_fine_samples "
        "num_iters learning_rate near far save_path save_interval lr_decay "
        "lr_decay_factor lr_min first_step_render log_interval val_interval "
        "model_type compute_dtype use_pallas".split()
    ):
        print(f"{field}: {getattr(cfg, field)}")
    print(f"devices: {jax.device_count()} x {jax.devices()[0].device_kind}")
    print("==========================================")


def fit(
    cfg: Config,
    resume_path: Optional[str] = None,
    max_steps: Optional[int] = None,
    enable_tensorboard: bool = True,
) -> TrainState:
    """Train per the config; returns the final TrainState."""
    np.random.seed(cfg.seed)
    if cfg.debug_nans:
        jax.config.update("jax_debug_nans", True)
    root_key = jax.random.key(cfg.seed)
    k_init, k_train, k_val = jax.random.split(root_key, 3)

    print_config_summary(cfg)
    num_iters = int(max_steps if max_steps is not None else cfg.num_iters)

    # --- mesh / sharding ---
    data_shard = None
    replicated = None
    if jax.device_count() > 1:
        from nerf_tpu.parallel.mesh import create_mesh, data_sharding, replicated_sharding

        mesh = create_mesh(cfg.mesh_shape)
        data_shard = data_sharding(mesh)
        replicated = replicated_sharding(mesh)
        print(f"Mesh: {dict(zip(mesh.axis_names, mesh.devices.shape))}")

    # --- data ---
    print("Loading dataset...")
    scene = load_scene(cfg)
    settings = render_settings_from_config(cfg, ndc=scene.ndc)
    # the scene dictates the sampling interval and background (NDC scenes
    # sample t in [0,1] and composite without a white background)
    import dataclasses

    settings = dataclasses.replace(
        settings, near=scene.near, far=scene.far,
        white_background=scene.white_background,
    )
    print(
        f"Loaded scene '{scene.name}': {scene.pool.size} train rays, "
        f"{scene.val_images.shape[0]} val images {scene.hw[0]}x{scene.hw[1]}"
    )

    # --- model / state ---
    model, tx, state = create_train_state(cfg, k_init)
    start_step = 0
    if resume_path is not None:
        meta = read_metadata(resume_path)
        state = load_checkpoint(resume_path, state)
        if replicated is not None:
            # Orbax restores arrays committed to one device; re-place the
            # state replicated on the mesh so the sharded step accepts it.
            state = jax.device_put(state, replicated)
        start_step = int(meta["step"])
        print(f"Resuming training from iteration {start_step}")

    train_step = make_train_step(
        model,
        tx,
        settings,
        cfg.num_random_rays,
        k_train,
        use_pallas=cfg.use_pallas,
        data_sharding=data_shard,
        donate=cfg.donate_state,
    )
    eval_render = make_eval_render(model, settings, use_pallas=cfg.use_pallas)
    schedule = lr_schedule(
        cfg.learning_rate, cfg.lr_decay, cfg.lr_decay_factor, cfg.lr_min
    )

    os.makedirs(cfg.save_path, exist_ok=True)
    logger = MetricLogger(
        log_dir=cfg.log_dir,
        model_type=cfg.model_type,
        dataset_name=scene.name,
        config_text=str(cfg),
        enable_tensorboard=enable_tensorboard,
    )
    start_time = datetime.datetime.now()

    def run_validation(step: int) -> None:
        idx = np.random.randint(scene.val_images.shape[0])
        val_img = scene.val_images[idx]
        c2w = np.eye(4, dtype=np.float32)
        c2w[: scene.val_c2w.shape[1]] = scene.val_c2w[idx]
        rays_o, rays_d, _ = compute_rays(
            val_img[None], c2w[None], scene.focal
        )
        rays_o, rays_d = rays_o[0], rays_d[0]
        viewdirs = None
        if scene.ndc:
            from nerf_tpu.ops.ndc import ndc_rays

            h, w = scene.hw
            viewdirs = rays_d
            rays_o, rays_d = ndc_rays(
                h, w, scene.focal, 1.0, jnp.asarray(rays_o), jnp.asarray(rays_d)
            )
        out = eval_render(
            state.params,
            state.fine_params,
            jnp.asarray(rays_o),
            jnp.asarray(rays_d),
            jax.random.fold_in(k_val, step),
            viewdirs=jnp.asarray(viewdirs) if viewdirs is not None else None,
        )
        pred = np.asarray(out.rgb).reshape(*scene.hw, 3)
        val_mse = float(np.mean((pred - val_img) ** 2))
        val_psnr = float(mse_to_psnr(val_mse))
        logger.log_validation(step, val_psnr, pred)

    # --- loop ---
    from tqdm import tqdm

    from nerf_tpu.utils.profiling import Throughput

    throughput = Throughput(warmup=2)
    step = start_step
    try:
        with tqdm(
            total=num_iters, initial=start_step, desc="Training", unit="it"
        ) as pbar:
            profile_window = (start_step + 5, start_step + 15)
            for step in range(start_step, num_iters):
                if cfg.profile_dir and step == profile_window[0]:
                    jax.profiler.start_trace(cfg.profile_dir)
                state, metrics = train_step(state, scene.pool)
                throughput.update(cfg.num_random_rays)
                if cfg.profile_dir and step == profile_window[1]:
                    jax.block_until_ready(metrics["loss"])
                    jax.profiler.stop_trace()

                if step % cfg.log_interval == 0:
                    logger.log_train(
                        step, float(schedule(jnp.asarray(step))), float(metrics["mse"])
                    )
                    logger.log_scalar(
                        "rays_per_sec", throughput.rays_per_sec, step
                    )

                if step % cfg.save_interval == 0 and 0 < step < num_iters - 1:
                    path = save_checkpoint(state, cfg.save_path, cfg.model_type, step)
                    tqdm.write(
                        f"[{format_elapsed_time(start_time)}] Model saved to "
                        f"{path} at iteration {step}"
                    )

                if step % cfg.val_interval == 0 and (step > 0 or cfg.first_step_render):
                    run_validation(step)

                pbar.update(1)

        final = save_checkpoint(state, cfg.save_path, cfg.model_type, num_iters)
        elapsed = format_elapsed_time(start_time)
        tqdm.write(f"[{elapsed}] Training complete!")
        tqdm.write(f"[{elapsed}] Final model saved to {final}")
    except KeyboardInterrupt:
        elapsed = format_elapsed_time(start_time)
        print(f"\n[{elapsed}] Keyboard interrupt! Saving current checkpoint...")
        path = save_checkpoint(state, cfg.save_path, cfg.model_type, step)
        print(f"[{elapsed}] Checkpoint saved to {path}. Exiting training.")
    finally:
        logger.close()

    return state
