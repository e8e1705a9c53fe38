#!/usr/bin/env python
"""Occupancy-guided plenoxels training: measured end-to-end (VERDICT r3 #4).

Round 3 shipped "equal quality at 4x fewer samples" as a linear projection
(the S=16 profile run hung on the tunnel). This measures the real thing on
TPU through the actual `fit()` driver: two full plenoxels trainings on the
synthetic sphere scene —

  dense:     num_samples = 64, no occupancy             (the r3 baseline)
  occupancy: num_samples = 16, occupancy_res = 32, rebake every 250 steps

— reporting final val PSNR, wall-clock, and steps/s for each, so the
"occupancy is the shipping mitigation for the scatter wall" claim carries a
measured curve.

Env: STEPS (1000), HW (48), GRID_RES (64).
"""
from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

STEPS = int(os.environ.get("STEPS", 1000))
HW = int(os.environ.get("HW", 48))
GRID_RES = int(os.environ.get("GRID_RES", 64))


def run(tag: str, root: str, steps: int = STEPS, **overrides) -> dict:
    import jax

    from nerf_tpu.config import Config
    from nerf_tpu.train.loop import fit

    save = tempfile.mkdtemp(prefix=f"occ_{tag}_")
    cfg = Config(
        dataset_path=root, num_random_rays=1024,
        model_type="plenoxels", grid_res=GRID_RES, learning_rate=1e-2,
        compute_dtype="bfloat16", num_iters=steps,
        log_interval=max(steps // 4, 1), val_interval=steps,
        save_interval=10 * steps, save_path=save,
        log_dir=os.path.join(save, "logs"), seed=0,
        **overrides,
    )
    t0 = time.perf_counter()
    state = fit(cfg)
    dt = time.perf_counter() - t0

    # final val PSNR, rendered from the returned state (fit's own val
    # renders go to TB; recompute here so the row is self-contained)
    import dataclasses

    import jax.numpy as jnp

    from nerf_tpu.data.pipeline import load_scene
    from nerf_tpu.data.rays import compute_rays
    from nerf_tpu.models import create_model
    from nerf_tpu.models.registry import grid_domain
    from nerf_tpu.train.loop import render_settings_from_config
    from nerf_tpu.train.step import make_eval_render, resolve_apply_fn
    from nerf_tpu.utils.metrics import mse_to_psnr

    scene = load_scene(cfg)
    # score BOTH runs at 64 uniform eval samples: the quality question is
    # what field the training produced, not how few samples it trained with
    settings = render_settings_from_config(
        dataclasses.replace(cfg, num_samples=64))
    settings = dataclasses.replace(
        settings, near=scene.near, far=scene.far,
        white_background=scene.white_background,
    )
    model = create_model(cfg.model_type, grid_res=cfg.grid_res,
                         compute_dtype=cfg.compute_dtype,
                         domain=grid_domain(cfg))
    eval_render = make_eval_render(
        model, settings, apply_fn=resolve_apply_fn(model, use_pallas=True))
    val_img = np.asarray(scene.val_images[0]).reshape(-1, 3)
    c2w = np.eye(4, dtype=np.float32)
    c2w[: scene.val_c2w.shape[1]] = scene.val_c2w[0]
    ro, rd, _ = compute_rays(scene.val_images[:1], c2w[None], scene.focal)
    out = eval_render(state.params, state.fine_params, jnp.asarray(ro[0]),
                      jnp.asarray(rd[0]), jax.random.key(9))
    mse = float(np.mean((np.asarray(out.rgb) - val_img) ** 2))
    row = dict(tag=tag, steps=steps, wall_s=round(dt, 1),
               rays_per_sec=round(1024 * steps / dt, 1),
               final_val_psnr=round(float(mse_to_psnr(mse)), 2),
               **{k: v for k, v in overrides.items()})

    if cfg.occupancy_res:
        # occupancy-CONSISTENT score: the trained system is field + prior
        # (instant-ngp renders with its occupancy grid too) — bake the
        # prior from the final field and let the 64-sample eval draw
        # through it, exactly as fit()'s own validation renders do
        from nerf_tpu.ops.occupancy import (
            OccupancyGrid, bake_occupancy, sigma_field)

        occ_domain = model.domain
        apply_fn = resolve_apply_fn(model, use_pallas=True)
        grid = jax.jit(lambda p: bake_occupancy(
            sigma_field(apply_fn, p), grid_res=cfg.occupancy_res,
            domain=occ_domain, threshold=cfg.occupancy_thresh))(state.params)
        occ = OccupancyGrid(grid=grid, domain=occ_domain)
        eval_occ = make_eval_render(
            model, settings,
            apply_fn=resolve_apply_fn(model, use_pallas=True),
            occupancy=occ)
        out2 = eval_occ(state.params, state.fine_params, jnp.asarray(ro[0]),
                        jnp.asarray(rd[0]), jax.random.key(9))
        mse2 = float(np.mean((np.asarray(out2.rgb) - val_img) ** 2))
        row["final_val_psnr_occ_eval"] = round(float(mse_to_psnr(mse2)), 2)
    return row


def main():
    from nerf_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    from tests.synthetic import make_synthetic_blender_scene

    with tempfile.TemporaryDirectory() as td:
        root = make_synthetic_blender_scene(
            os.path.join(td, "scene"), h=HW, w=HW, num_train=16)
        rows = [
            run("dense64", root, num_samples=64),
            run("occ16", root, num_samples=16, occupancy_res=32,
                occupancy_interval=250),
            # equal-wall-clock row: occ16 steps are ~4x cheaper, so give
            # it 4x the steps dense64 got
            run("occ16_4x_steps", root, steps=4 * STEPS, num_samples=16,
                occupancy_res=32, occupancy_interval=250),
        ]
    for r in rows:
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
