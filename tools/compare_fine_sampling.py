#!/usr/bin/env python
"""merge vs resample fine sampling: TPU quality + throughput head-to-head.

VERDICT r3 item 6: hierarchical train runs at 135.9k rays/s vs flat 156k
because `fine_sampling="merge"` pays sample_pdf + the (R, M, M) rank/one-hot
merge between the coarse and fine kernel calls; `"resample"` (mip-NeRF-style
single stratified inverse-CDF draw) removes the merge. Round 3 only drove
quality on a 150-step CPU run. This trains BOTH modes at the reference
hierarchical shape (64+128, 1024 rays, bf16 fused kernels) on a synthetic
Blender scene on the real chip, printing val PSNR at intervals plus
steps/s, so the train default can be flipped on measured evidence.

Env: STEPS (1500), VAL_EVERY (250), HW (80), SEED (0).
"""
from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

STEPS = int(os.environ.get("STEPS", 1500))
VAL_EVERY = int(os.environ.get("VAL_EVERY", 250))
HW = int(os.environ.get("HW", 80))


def run(mode: str, root: str) -> dict:
    import dataclasses

    import jax
    import jax.numpy as jnp

    from nerf_tpu.config import Config
    from nerf_tpu.data.pipeline import load_scene
    from nerf_tpu.data.rays import compute_rays
    from nerf_tpu.train.loop import render_settings_from_config
    from nerf_tpu.train.state import create_train_state
    from nerf_tpu.train.step import (
        make_eval_render,
        make_scan_train_step,
        resolve_apply_fn,
        resolve_fused_render,
    )
    from nerf_tpu.utils.metrics import mse_to_psnr

    cfg = Config(
        dataset_path=root, num_random_rays=1024, num_samples=64,
        num_fine_samples=128, compute_dtype="bfloat16", model_type="nerf",
        fine_sampling=mode, seed=int(os.environ.get("SEED", 0)),
        half_res=False,
    )
    scene = load_scene(cfg)
    settings = render_settings_from_config(cfg)
    settings = dataclasses.replace(
        settings, near=scene.near, far=scene.far,
        white_background=scene.white_background,
    )
    model, tx, state = create_train_state(cfg, jax.random.key(cfg.seed))
    fused = resolve_fused_render(model, settings, use_pallas=True)
    apply_fn = (model.apply if fused is not None
                else resolve_apply_fn(model, use_pallas=True))
    step_fn = make_scan_train_step(
        model, tx, settings, cfg.num_random_rays, jax.random.key(1),
        num_steps=VAL_EVERY, use_pallas=True, apply_fn=apply_fn,
        fused_render=fused,
    )
    eval_render = make_eval_render(model, settings, apply_fn=apply_fn,
                                   fused_render=fused)

    val_img = np.asarray(scene.val_images[0]).reshape(-1, 3)
    c2w = np.eye(4, dtype=np.float32)
    c2w[: scene.val_c2w.shape[1]] = scene.val_c2w[0]
    ro, rd, _ = compute_rays(scene.val_images[:1], c2w[None], scene.focal)
    ro, rd = jnp.asarray(ro[0]), jnp.asarray(rd[0])

    def val_psnr(step):
        out = eval_render(state.params, state.fine_params, ro, rd,
                          jax.random.key(step))
        mse = float(np.mean((np.asarray(out.rgb) - val_img) ** 2))
        return float(mse_to_psnr(mse))

    # compile outside the clock
    state, m = step_fn(state, scene.pool)
    float(np.asarray(m["loss"][-1]))
    history = [dict(step=VAL_EVERY, psnr=round(val_psnr(0), 3))]
    t0 = time.perf_counter()
    steps_done = VAL_EVERY
    while steps_done < STEPS:
        state, m = step_fn(state, scene.pool)
        float(np.asarray(m["loss"][-1]))
        steps_done += VAL_EVERY
        history.append(dict(step=steps_done, psnr=round(val_psnr(steps_done), 3)))
    dt = time.perf_counter() - t0
    rps = cfg.num_random_rays * (steps_done - VAL_EVERY) / dt if dt else 0.0
    return dict(mode=mode, history=history,
                final_psnr=history[-1]["psnr"],
                train_rays_per_sec=round(rps, 1))


def main():
    from nerf_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    from tests.synthetic import make_synthetic_blender_scene

    with tempfile.TemporaryDirectory() as td:
        root = make_synthetic_blender_scene(
            os.path.join(td, "scene"), h=HW, w=HW, num_train=12)
        results = [run(m, root) for m in ("merge", "resample")]
    import json

    for r in results:
        print(json.dumps(r), flush=True)
    d = results[1]["final_psnr"] - results[0]["final_psnr"]
    print(f"resample - merge final PSNR: {d:+.3f} dB", flush=True)


if __name__ == "__main__":
    main()
