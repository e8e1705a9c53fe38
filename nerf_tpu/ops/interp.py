"""Grid interpolation primitives shared by the grid-based field families
(FastNeRF's baked cache, Plenoxels' voxel grid).

TPU shape policy: the 8-corner trilinear stencil is expressed as 8 flat
gathers + FMA accumulation over static shapes — no dynamic slicing — so it
jits cleanly and its VJP is 8 scatter-adds (how a voxel grid trains).
"""

from __future__ import annotations

import jax.numpy as jnp


def trilinear(grid: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Trilinear interpolation of ``grid`` (R, R, R, C) at points ``p``
    (N, 3) in [-1, 1]^3 (coordinates clamp to the grid border)."""
    r = grid.shape[0]
    x = jnp.clip((p + 1.0) * 0.5 * (r - 1), 0.0, r - 1.0)
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, r - 2)
    f = x - x0
    flat = grid.reshape(-1, grid.shape[-1])

    def corner(dx, dy, dz):
        idx = ((x0[:, 0] + dx) * r + (x0[:, 1] + dy)) * r + (x0[:, 2] + dz)
        w = (
            (f[:, 0] if dx else 1 - f[:, 0])
            * (f[:, 1] if dy else 1 - f[:, 1])
            * (f[:, 2] if dz else 1 - f[:, 2])
        )
        return w[:, None] * flat[idx]

    out = 0.0
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                out = out + corner(dx, dy, dz)
    return out


def bilinear(grid: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Bilinear interpolation of ``grid`` (H, W, C) at float coordinates
    ``(u, v)`` (clamped to the border cell)."""
    h, w = grid.shape[0], grid.shape[1]
    u0 = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, h - 2)
    v0 = jnp.clip(jnp.floor(v).astype(jnp.int32), 0, w - 2)
    fu, fv = u - u0, v - v0
    flat = grid.reshape(-1, grid.shape[-1])

    def at(du, dv):
        return flat[(u0 + du) * w + (v0 + dv)]

    return (
        (1 - fu)[:, None] * ((1 - fv)[:, None] * at(0, 0) + fv[:, None] * at(0, 1))
        + fu[:, None] * ((1 - fv)[:, None] * at(1, 0) + fv[:, None] * at(1, 1))
    )
