"""Device-resident data pipeline.

The reference feeds training with a host-side ``DataLoader(shuffle=True)``
over a flattened ray pool, paying a host->device copy of every batch
(/root/reference/train.py:119-121,162-164). TPU-native design inverts this:
the ENTIRE ray pool is uploaded to HBM once at startup, and each training
step draws a uniform random batch on-device with ``jax.random.randint`` + a
gather — all inside the jitted step, so steps never touch the host.

Uniform-with-replacement sampling replaces epoch-shuffling; for NeRF-style
training over tens of millions of rays the two are statistically
indistinguishable and with-replacement keeps the step a pure function of
(state, key).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from nerf_tpu.data.blender import load_blender
from nerf_tpu.data.llff import load_llff
from nerf_tpu.data.rays import compute_rays


class RayBatch(NamedTuple):
    rays_o: jax.Array   # (B, 3)
    rays_d: jax.Array   # (B, 3)
    rgb: jax.Array      # (B, 3) target pixels
    viewdirs: jax.Array  # (B, 3) unit view directions


class RayPool(NamedTuple):
    """Flattened ray pool living in device memory (sharded or replicated)."""

    rays_o: jax.Array    # (M, 3)
    rays_d: jax.Array    # (M, 3)
    rgb: jax.Array       # (M, 3)
    viewdirs: jax.Array  # (M, 3)

    @property
    def size(self) -> int:
        return self.rays_o.shape[0]

    def sample(self, key: jax.Array, batch_size: int) -> RayBatch:
        """Uniform random ray batch; jit-safe (static batch_size)."""
        idx = jax.random.randint(key, (batch_size,), 0, self.rays_o.shape[0])
        take = lambda x: jnp.take(x, idx, axis=0)
        return RayBatch(
            rays_o=take(self.rays_o),
            rays_d=take(self.rays_d),
            rgb=take(self.rgb),
            viewdirs=take(self.viewdirs),
        )


def build_ray_pool(
    rays_o: np.ndarray,
    rays_d: np.ndarray,
    rgb: np.ndarray,
    viewdirs: Optional[np.ndarray] = None,
    sharding=None,
) -> RayPool:
    """Flatten (N, HW, 3) host arrays into a device RayPool.

    ``viewdirs`` defaults to ``rays_d`` normalized (for NDC rays pass the
    pre-warp world directions). ``sharding`` optionally places the pool
    sharded across the mesh's data axis.
    """
    flat = lambda x: np.ascontiguousarray(x.reshape(-1, 3), dtype=np.float32)
    rays_o, rays_d, rgb = flat(rays_o), flat(rays_d), flat(rgb)
    if viewdirs is None:
        viewdirs = rays_d / np.linalg.norm(rays_d, axis=-1, keepdims=True)
    else:
        viewdirs = flat(viewdirs)
        viewdirs = viewdirs / np.linalg.norm(viewdirs, axis=-1, keepdims=True)

    put = (lambda x: jax.device_put(x, sharding)) if sharding is not None else jnp.asarray
    return RayPool(
        rays_o=put(rays_o), rays_d=put(rays_d), rgb=put(rgb), viewdirs=put(viewdirs)
    )


@dataclass
class Scene:
    """Everything the trainer needs for one scene."""

    pool: RayPool                 # training rays on device
    val_images: np.ndarray        # (Nv, H, W, 3)
    val_c2w: np.ndarray           # (Nv, 4, 4) or (Nv, 3, 4)
    focal: float
    hw: tuple[int, int]
    near: float
    far: float
    white_background: bool
    ndc: bool = False
    render_poses: Optional[np.ndarray] = None  # eval path (LLFF spiral)
    name: str = "scene"


def load_scene(cfg, sharding=None) -> Scene:
    """Load the dataset named by a Config into a device-resident Scene."""
    if cfg.dataset_type == "blender":
        images, c2w, focal = load_blender(
            cfg.dataset_path,
            mode="train",
            white_background=cfg.white_background,
            half_res=cfg.half_res,
        )
        val_images, val_c2w, val_focal = load_blender(
            cfg.dataset_path,
            mode="val",
            white_background=cfg.white_background,
            half_res=cfg.half_res,
        )
        rays_o, rays_d, rgb = compute_rays(images, c2w, focal)
        pool = build_ray_pool(rays_o, rays_d, rgb, sharding=sharding)
        return Scene(
            pool=pool,
            val_images=val_images,
            val_c2w=val_c2w,
            focal=val_focal,
            hw=(images.shape[1], images.shape[2]),
            near=cfg.near,
            far=cfg.far,
            white_background=cfg.white_background,
            ndc=False,
            name=cfg.dataset_path.rstrip("/").split("/")[-1],
        )

    if cfg.dataset_type == "llff":
        data = load_llff(cfg.dataset_path, factor=cfg.llff_factor)
        images, poses = data["images"], data["poses"]
        h, w = data["hw"]
        focal = data["focal"]

        i_train, i_test = data["i_train"], data["i_test"]
        c2w44 = np.tile(np.eye(4, dtype=np.float32), (poses.shape[0], 1, 1))
        c2w44[:, :3, :4] = poses
        rays_o, rays_d, rgb = compute_rays(images, c2w44, focal)

        if cfg.ndc:
            from nerf_tpu.ops.ndc import ndc_rays

            world_d = rays_d[i_train]
            o_ndc, d_ndc = ndc_rays(
                h, w, focal, 1.0,
                jnp.asarray(rays_o[i_train]), jnp.asarray(rays_d[i_train]),
            )
            pool = build_ray_pool(
                np.asarray(o_ndc), np.asarray(d_ndc), rgb[i_train],
                viewdirs=world_d, sharding=sharding,
            )
            near, far = 0.0, 1.0
        else:
            pool = build_ray_pool(
                rays_o[i_train], rays_d[i_train], rgb[i_train], sharding=sharding
            )
            near, far = data["near_world"], data["far_world"]

        return Scene(
            pool=pool,
            val_images=images[i_test],
            val_c2w=c2w44[i_test],
            focal=focal,
            hw=(h, w),
            near=near,
            far=far,
            white_background=False,
            ndc=cfg.ndc,
            render_poses=data["render_poses"],
            name=cfg.dataset_path.rstrip("/").split("/")[-1],
        )

    raise ValueError(f"Unknown dataset_type: {cfg.dataset_type}")
