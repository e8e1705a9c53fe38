"""NDC ray warping for forward-facing (LLFF) scenes.

The reference has no LLFF/NDC support (it only reads Blender
``transforms_*.json`` — /root/reference/nerf/data.py:10-62); this implements
the standard NeRF normalized-device-coordinate reparameterization so
forward-facing captures can be sampled uniformly in [0, 1] disparity space.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ndc_rays(
    h: int,
    w: int,
    focal: float,
    near: float,
    rays_o: jax.Array,
    rays_d: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """Map world-space rays to NDC space (projective warp to the near plane).

    Args:
      h, w: image size in pixels; focal: focal length in pixels.
      near: distance of the near plane (typically 1.0 for LLFF).
      rays_o, rays_d: (..., 3) world-space rays looking down -z.

    Returns NDC-space (rays_o, rays_d); sample t in [0, 1] afterwards.
    """
    # Shift origins to the near plane.
    tshift = -(near + rays_o[..., 2]) / rays_d[..., 2]
    rays_o = rays_o + tshift[..., None] * rays_d

    ox, oy, oz = rays_o[..., 0], rays_o[..., 1], rays_o[..., 2]
    dx, dy, dz = rays_d[..., 0], rays_d[..., 1], rays_d[..., 2]

    o0 = -focal / (0.5 * w) * ox / oz
    o1 = -focal / (0.5 * h) * oy / oz
    o2 = 1.0 + 2.0 * near / oz

    d0 = -focal / (0.5 * w) * (dx / dz - ox / oz)
    d1 = -focal / (0.5 * h) * (dy / dz - oy / oz)
    d2 = -2.0 * near / oz

    rays_o = jnp.stack([o0, o1, o2], axis=-1)
    rays_d = jnp.stack([d0, d1, d2], axis=-1)
    return rays_o, rays_d
