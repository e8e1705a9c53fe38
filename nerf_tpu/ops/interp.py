"""Grid interpolation primitives shared by the grid-based field families
(FastNeRF's baked cache, Plenoxels' voxel grid).

TPU shape policy (measured, tools/microbench_gather.py on v5e): XLA's
gather is row-at-a-time regardless of row width, so the stencil wants the
FEWEST gather rows whose slices stay memory-contiguous. The 8-corner
trilinear stencil is expressed as 4 gathers of z-PAIRS — slice sizes
(1, 1, 2, C), the two z-corners are adjacent in memory — which measures
3.7x faster than 8 flat row-gathers (12.3 vs 3.3 Msamples/s at 262k
samples from a 128^3 x 28 grid; 46k vs 13k rays/s on the 400x400
plenoxels render). Wider slices regress catastrophically: one (2,2,2,C)
stencil gather lowers to ~3.6 us/row and (1,2,2,C) quads compile for
minutes — XLA only lowers single-contiguous-run slices well.

The pair-gather is wrapped in a custom VJP because its AUTODIFF transpose
(pair scatter-add, slice (1,1,2,C)) hangs/crashes the v5e TPU worker at
128^3 scale. The backward instead uses the proven formulation: 8 flat
row scatter-adds into the flattened grid (exactly what the old 8-gather
forward's autodiff produced — how a voxel grid trains), plus the
analytic point gradient.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _tri_coords(p: jnp.ndarray, r: int):
    x = jnp.clip((p + 1.0) * 0.5 * (r - 1), 0.0, r - 1.0)
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, r - 2)
    return x0, x - x0


def _pair_gather(grid: jnp.ndarray, x0: jnp.ndarray, dx: int, dy: int):
    """Gather the two z-adjacent corner rows at (x0+dx, y0+dy, z0) ->
    (N, 2, C). One contiguous (1,1,2,C) slice per sample."""
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3, 4),
        collapsed_slice_dims=(),
        start_index_map=(0, 1, 2),
    )
    start = x0 + jnp.array([dx, dy, 0], jnp.int32)
    return jax.lax.gather(
        grid, start, dnums, slice_sizes=(1, 1, 2, grid.shape[-1]),
        mode=jax.lax.GatherScatterMode.CLIP,
    )[:, 0, 0]


def _xy_weight(f: jnp.ndarray, dx: int, dy: int) -> jnp.ndarray:
    return ((f[:, 0] if dx else 1.0 - f[:, 0])
            * (f[:, 1] if dy else 1.0 - f[:, 1]))


@jax.custom_vjp
def trilinear(grid: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Trilinear interpolation of ``grid`` (R, R, R, C) at points ``p``
    (N, 3) in [-1, 1]^3 (coordinates clamp to the grid border)."""
    r = grid.shape[0]
    x0, f = _tri_coords(p, r)
    wz = jnp.stack([1.0 - f[:, 2], f[:, 2]], axis=-1)       # (N, 2)
    out = 0.0
    for dx in (0, 1):
        for dy in (0, 1):
            pair = _pair_gather(grid, x0, dx, dy)           # (N, 2, C)
            v = jnp.einsum("nz,nzc->nc", wz, pair)
            out = out + _xy_weight(f, dx, dy)[:, None] * v
    return out


def _trilinear_fwd(grid, p):
    return trilinear(grid, p), (grid, p)


def _trilinear_bwd(res, g):
    grid, p = res
    r, c = grid.shape[0], grid.shape[-1]
    x0, f = _tri_coords(p, r)
    wz = jnp.stack([1.0 - f[:, 2], f[:, 2]], axis=-1)

    gfx = gfy = gfz = 0.0
    scatter_idx, scatter_val = [], []
    for dx in (0, 1):
        for dy in (0, 1):
            w_xy = _xy_weight(f, dx, dy)                     # (N,)
            pair = _pair_gather(grid, x0, dx, dy)            # (N, 2, C)
            # value of this xy-corner column after z-lerp, and its pieces
            v = jnp.einsum("nz,nzc->nc", wz, pair)           # (N, C)
            gv = jnp.sum(g * v, axis=-1)                     # (N,)
            # d/d f_z: (pair_z1 - pair_z0) . g, scaled by w_xy
            dz = jnp.sum(g * (pair[:, 1] - pair[:, 0]), axis=-1)
            gfz = gfz + w_xy * dz
            # d/d f_x, f_y through the xy weight
            sx = (1.0 if dx else -1.0) * (f[:, 1] if dy else 1.0 - f[:, 1])
            sy = (1.0 if dy else -1.0) * (f[:, 0] if dx else 1.0 - f[:, 0])
            gfx = gfx + sx * gv
            gfy = gfy + sy * gv
            # grid cotangent rows for this xy corner (both z corners)
            base = ((x0[:, 0] + dx) * r + (x0[:, 1] + dy)) * r + x0[:, 2]
            coeff = w_xy[:, None] * g                        # (N, C)
            scatter_idx += [base, base + 1]
            scatter_val += [coeff * wz[:, :1], coeff * wz[:, 1:]]
    grad_f = jnp.stack([gfx, gfy, gfz], axis=-1)

    # ONE scatter-add for all 8 corners. XLA's TPU scatter costs a flat
    # ~130 ns/row at this shape no matter how it's phrased — measured on
    # the v5e (tools/microbench_scatter.py; 524k rows x 28ch -> 128^3):
    # one 8N-row call, <=64k-row chunked calls, sorted indices, the
    # unique_indices/indices_are_sorted flags, bf16 values, and a
    # sort+segment-sum+unique-row pipeline all land within 65-81 ms;
    # collision structure is irrelevant. (Round 4 briefly measured
    # chunked calls 7.5x faster — a harness bug: the scanned timing body
    # used loop-invariant inputs, so XLA hoisted the op out of the loop.
    # The microbench now threads the loop carry through the values.)
    # The Pallas sorted-window reformulation (ops/pallas/scatter_add.py)
    # is exact but measured 57 ms — still not a win. The productive lever
    # is fewer rows: occupancy-guided training (cfg.occupancy_res) cuts
    # samples ~4x at equal quality, and scatter cost is linear in samples.
    grad_flat = jnp.zeros((r * r * r, c), grid.dtype).at[
        jnp.concatenate(scatter_idx)
    ].add(jnp.concatenate(scatter_val))

    # f = x - x0 with x = clip((p+1)/2*(r-1), 0, r-1): the clip zeroes
    # dx/dp outside the volume, else it's the constant scale
    raw = (p + 1.0) * (0.5 * (r - 1))
    inside = ((raw > 0.0) & (raw < (r - 1.0))).astype(grad_f.dtype)
    grad_p = grad_f * inside * (0.5 * (r - 1))
    return grad_flat.reshape(grid.shape), grad_p.astype(p.dtype)


trilinear.defvjp(_trilinear_fwd, _trilinear_bwd)


def bilinear(grid: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Bilinear interpolation of ``grid`` (H, W, C) at float coordinates
    ``(u, v)`` (clamped to the border cell). Same contiguous-pair law as
    ``trilinear``: 2 gathers of (1, 2, C) w-pairs. Left on autodiff — the
    direction grid is small (64 x 128) and is only trained through
    FastNeRF's MLP, never as a raw grid."""
    h, w = grid.shape[0], grid.shape[1]
    u0 = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, h - 2)
    v0 = jnp.clip(jnp.floor(v).astype(jnp.int32), 0, w - 2)
    fu, fv = u - u0, v - v0

    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3),
        collapsed_slice_dims=(),
        start_index_map=(0, 1),
    )
    wv = jnp.stack([1.0 - fv, fv], axis=-1)                 # (N, 2)
    out = 0.0
    for du in (0, 1):
        start = jnp.stack([u0 + du, v0], axis=-1)
        pair = jax.lax.gather(
            grid, start, dnums, slice_sizes=(1, 2, grid.shape[-1]),
            mode=jax.lax.GatherScatterMode.CLIP,
        )[:, 0]                                             # (N, 2, C)
        val = jnp.einsum("nz,nzc->nc", wv, pair)
        out = out + (fu if du else 1.0 - fu)[:, None] * val
    return out
