"""Multi-scene training driver: N scenes trained concurrently on one mesh
(BASELINE.json config 5). Builds on `nerf_tpu.parallel.multiscene`: per-scene
params stacked on a ``scene`` mesh axis, rays sharded on ``data``, one
vmapped jitted step for all scenes. Checkpoints store the stacked state
plus the scene list; per-scene metrics are logged under ``scene{i}/``.
"""

from __future__ import annotations

import datetime
import os
from typing import Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from nerf_tpu.config import Config
from nerf_tpu.data.pipeline import load_scene
from nerf_tpu.parallel.mesh import create_mesh
from nerf_tpu.parallel.multiscene import make_multiscene_train_step, stack_scenes
from nerf_tpu.train.loop import print_config_summary, render_settings_from_config
from nerf_tpu.train.optim import make_optimizer
from nerf_tpu.train.state import TrainState
from nerf_tpu.models.registry import model_from_config
from nerf_tpu.utils.checkpoint import save_checkpoint
from nerf_tpu.utils.logging import MetricLogger
from nerf_tpu.utils.timer import format_elapsed_time


def fit_multiscene(
    cfg: Config,
    dataset_paths: Sequence[str],
    max_steps: Optional[int] = None,
    enable_tensorboard: bool = True,
) -> TrainState:
    """Train one model per scene concurrently. ``cfg`` supplies the shared
    schedule/model; ``dataset_paths`` the scenes. The mesh comes from
    ``cfg.mesh_shape`` (e.g. "scene:2,data:4") or defaults to all devices on
    'data' with the scene axis vmapped but unsharded."""
    import dataclasses

    np.random.seed(cfg.seed)
    key = jax.random.key(cfg.seed)
    num_scenes = len(dataset_paths)
    num_iters = int(max_steps if max_steps is not None else cfg.num_iters)

    print_config_summary(cfg)
    print(f"Multi-scene training over {num_scenes} scenes: {list(dataset_paths)}")

    mesh_spec = cfg.mesh_shape
    if not mesh_spec:
        n = jax.device_count()
        if n % num_scenes == 0 and n >= num_scenes:
            mesh_spec = f"scene:{num_scenes},data:{n // num_scenes}"
        else:
            mesh_spec = f"scene:1,data:{n}"
    mesh = create_mesh(mesh_spec)
    print(f"Mesh: {dict(zip(mesh.axis_names, mesh.devices.shape))}")

    scenes = []
    for path in dataset_paths:
        scenes.append(load_scene(dataclasses.replace(cfg, dataset_path=path)))
    sizes = {s.pool.size for s in scenes}
    if len(sizes) > 1:
        # stack_scenes needs equal pools; trim to the smallest (uniform
        # with-replacement sampling is unaffected by dropping the tail)
        m = min(sizes)
        for i, s in enumerate(scenes):
            scenes[i] = dataclasses.replace(
                s, pool=jax.tree.map(lambda x: x[:m], s.pool)
            )
    pools = stack_scenes([s.pool for s in scenes])

    settings = render_settings_from_config(cfg, ndc=scenes[0].ndc)
    settings = dataclasses.replace(
        settings, near=scenes[0].near, far=scenes[0].far,
        white_background=scenes[0].white_background,
    )

    model = model_from_config(cfg)
    if getattr(model, "use_grid_kernel", False):
        # the per-scene step is vmapped and (scene x data) sharded — both
        # unsupported by the scalar-prefetched grid kernel
        model = dataclasses.replace(model, use_grid_kernel=False)
    tx = make_optimizer(cfg)
    k_init, k_train = jax.random.split(key)
    params = stack_scenes(
        [model.init(jax.random.fold_in(k_init, i)) for i in range(num_scenes)]
    )
    if cfg.num_fine_samples > 0 and cfg.separate_fine_model:
        fine_params = stack_scenes(
            [model.init(jax.random.fold_in(k_init, 1000 + i))
             for i in range(num_scenes)]
        )
    else:
        fine_params = {}
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        fine_params=fine_params,
        opt_state=tx.init((params, fine_params)),
    )

    from nerf_tpu.train.loop import make_regularizer

    step_fn = make_multiscene_train_step(
        model, tx, settings, cfg.num_random_rays, k_train, mesh,
        use_pallas=cfg.use_pallas, donate=cfg.donate_state,
        regularizer=make_regularizer(cfg, model),
    )

    os.makedirs(cfg.save_path, exist_ok=True)
    logger = MetricLogger(
        log_dir=cfg.log_dir,
        model_type=f"{cfg.model_type}_x{num_scenes}",
        dataset_name="multiscene",
        config_text=str(cfg),
        enable_tensorboard=enable_tensorboard,
    )
    start_time = datetime.datetime.now()

    from tqdm import tqdm

    step = 0
    try:
        with tqdm(total=num_iters, desc="Training", unit="it") as pbar:
            for step in range(num_iters):
                state, metrics = step_fn(state, pools)
                if step % cfg.log_interval == 0:
                    mses = np.asarray(metrics["mse"])
                    logger.log_train(step, cfg.learning_rate, float(mses.mean()))
                    for i, m in enumerate(mses):
                        logger.log_scalar(f"scene{i}/mse", float(m), step)
                if step % cfg.save_interval == 0 and 0 < step < num_iters - 1:
                    save_checkpoint(
                        state, cfg.save_path, f"{cfg.model_type}_multiscene", step
                    )
                pbar.update(1)
        save_checkpoint(
            state, cfg.save_path, f"{cfg.model_type}_multiscene", num_iters
        )
        print(f"[{format_elapsed_time(start_time)}] Multi-scene training complete!")
    except KeyboardInterrupt:
        save_checkpoint(state, cfg.save_path, f"{cfg.model_type}_multiscene", step)
        print("Interrupt: checkpoint saved.")
    finally:
        logger.close()
    return state
