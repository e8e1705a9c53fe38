"""Coherent trilinear grid interpolation as a Pallas TPU kernel.

The grid families (Plenoxels, baked FastNeRF, baked PlenOctrees) render by
trilinearly interpolating a dense (R, R, R, C) voxel grid at every ray
sample. XLA's TPU gather is row-at-a-time (~51 ns/row regardless of width,
tools/microbench_gather.py), so even the 4-row z-pair stencil
(ops/interp.py) renders a 400x400 image at only ~46k rays/s — 27x below
the MLP families. "Baked caches are fast" is a CUDA-texture-unit property;
on TPU it has to be rebuilt out of DMA + MXU.

This kernel exploits the one thing gathers ignore: RAY COHERENCE. Samples
of a tile of adjacent rays within a depth segment all land in a small
spatial window, so the stencil reads become bulk DMA + dense math:

  * the grid is repacked once per render into (R/8)^3 aligned 8^3
    sub-bricks of 512 consecutive rows: ``pack_grid`` -> (NB, 512, 32);
  * an XLA prologue ("the plan") groups samples into (ray-tile x depth
    segment) steps, finds each step's 16^3 cell window (2x2x2 sub-bricks
    at 8-aligned origins), and emits scalar-prefetch arrays of sub-brick
    block ids — Mosaic's BlockSpec index_map then streams exactly the
    bricks each step needs, double-buffered across steps (the grouped
    dispatch pattern proven in fused_kilonerf.py);
  * in-kernel, trilinear interpolation is a MATMUL: per sub-brick k the
    separable tent weights W_k = wx(dx) (x) wy(dy) (x) wz(dz) form an
    (S, 512) matrix that is zero except at each sample's stencil columns,
    and sum_k W_k @ brick_k is EXACTLY the 8-corner trilinear sum. The
    per-axis tents are (S, 8) VPU ops expanded to (S, 512) by constant
    0/1 matmuls and ``pltpu.repeat`` — no per-corner gathers anywhere.

Probed constraints that shaped this (tools/probe_kernel_gather*.py,
tools/probe_grid_kernel*.py, all on the v5e Mosaic backend):
  * dynamic in-kernel DMA (``make_async_copy`` from an ANY/HBM ref)
    crashes the compiler in every form, including static origins — brick
    streaming must go through BlockSpec index maps;
  * ``take_along_axis`` lane gathers are only correct at width <= 128;
    there is no sublane-dynamic gather — per-sample selection from VMEM
    must ride the MXU;
  * scalar-prefetched index maps + revisited/skipped blocks work.

Window-fit fallback: a step whose samples span more than its 16^3 window
(incoherent rays, extreme close-ups) cannot be served by this plan. The
plan computes a single ``fits`` bit for the whole batch and the wrapper
``lax.cond``s between the kernel and the pure z-pair-gather path, so the
result is ALWAYS exact w.r.t. ``ops.interp.trilinear`` — coherence only
decides which path computes it. Training batches (random rays) take the
pure path by construction; block-ordered eval rays (``tile_ray_order``)
take the kernel.

Gradients: ``trilinear_rays`` carries a custom VJP whose backward is the
proven pure formulation (8 flat row scatter-adds + analytic point
gradient, ops/interp.py::_trilinear_bwd) — the kernel only ever
accelerates forward evaluation; values, and therefore cotangents, are
identical either way.
"""

from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HIGHEST = jax.lax.Precision.HIGHEST

_LANES = 32          # channel pad: supports C <= 32 (plenoxels 28, fastnerf 25)
_SUB = 8             # sub-brick edge (cells); 8^3 = 512 rows
_ROWS = _SUB ** 3


# ------------------------------------------------------------------ packing


def packable(shape) -> bool:
    """Whether a (R, R, R, C) grid satisfies the kernel's static shape
    constraints (callers gate pre-packing on this; trilinear_rays itself
    falls back for unpackable grids)."""
    r, c = shape[0], shape[-1]
    return r % _SUB == 0 and r // _SUB >= 2 and c <= _LANES


def pack_grid(grid: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """(R, R, R, C) -> (NB, 512, 32) with aligned 8^3 sub-bricks contiguous.

    Row order inside a sub-brick is (lx, ly, lz) lexicographic (local cell
    l = lx*64 + ly*8 + lz); sub-brick b = (bx*nb + by)*nb + bz. A pure
    reshape/transpose — XLA moves ~R^3*C*4 bytes at HBM bandwidth (~1 ms at
    128^3 x 32), no gathers. ``dtype=bfloat16`` halves the kernel's brick
    DMA traffic and removes the per-step cast (bf16 interp mode)."""
    r, c = grid.shape[0], grid.shape[-1]
    nb = r // _SUB
    g = jnp.pad(grid, ((0, 0), (0, 0), (0, 0), (0, _LANES - c)))
    g = g.reshape(nb, _SUB, nb, _SUB, nb, _SUB, _LANES)
    g = g.transpose(0, 2, 4, 1, 3, 5, 6)
    return g.reshape(nb * nb * nb, _ROWS, _LANES).astype(dtype)


def _expand_consts():
    """0/1 expansion matrices mapping per-axis (S, 8) tents onto the
    sub-brick's 512 local cells (l = lx*64 + ly*8 + lz)."""
    ex = np.zeros((8, _ROWS), np.float32)
    for x in range(8):
        ex[x, x * 64:(x + 1) * 64] = 1.0
    ey = np.zeros((8, 64), np.float32)
    for y in range(8):
        ey[y, y * 8:(y + 1) * 8] = 1.0
    # numpy, not device arrays (lowering D2H cost; see fused_render.py)
    return ex, ey


# ------------------------------------------------------------------- kernel


def _tent(p_loc, tb):
    """max(0, 1 - |p - cell|) against local cells 0..7: the (TB, 8) axis
    factor of trilinear weights. ``p_loc`` is a (TB, 1) column."""
    cells = jax.lax.broadcasted_iota(jnp.int32, (tb, 8), 1).astype(jnp.float32)
    return jnp.maximum(0.0, 1.0 - jnp.abs(p_loc - cells))


def _interp_seg(base_ref, px_ref, py_ref, pz_ref, ex, ey, bricks,
                step, lo, hi, tb, cdt, prec):
    """One depth segment's trilinear interpolation against its 8 window
    sub-bricks: returns the (TB, 32) f32 interpolated channels. Shared by
    the channels-out kernel below and the fused render kernel
    (fused_grid_render.py)."""
    # Expansion dots carry 0/1 matrices; their precision only needs to
    # match the downstream contraction (bf16 mode rounds w to bf16 anyway).
    eprec = HIGHEST if cdt == jnp.float32 else jax.lax.Precision.DEFAULT

    def axis_tents(col_ref, a):
        loc = col_ref[lo:hi] - base_ref[step * 3 + a].astype(jnp.float32)
        return _tent(loc, tb), _tent(loc - float(_SUB), tb)

    wx = axis_tents(px_ref, 0)
    wy = axis_tents(py_ref, 1)
    wz = axis_tents(pz_ref, 2)
    wx_e = [jax.lax.dot(v, ex, precision=eprec) for v in wx]   # (TB, 512)
    wy_e = [pltpu.repeat(jax.lax.dot(v, ey, precision=eprec), 8, axis=1)
            for v in wy]
    wz_e = [pltpu.repeat(v, 64, axis=1) for v in wz]

    acc = jnp.zeros((tb, _LANES), jnp.float32)
    for dx in range(2):
        for dy in range(2):
            wxy = wx_e[dx] * wy_e[dy]
            for dz in range(2):
                k = dx * 4 + dy * 2 + dz
                acc = acc + jax.lax.dot(
                    (wxy * wz_e[dz]).astype(cdt),
                    bricks[k][0].astype(cdt),
                    preferred_element_type=jnp.float32, precision=prec,
                )
    return acc


def _grid_kernel(base_ref, blk_ref, px_ref, py_ref, pz_ref, ex_ref, ey_ref,
                 *refs, tb, sps, cdt, prec):
    """``sps`` segments per grid step: per-step fixed costs (index maps,
    scalar reads, pipeline turnarounds) amortize over sps windows; each
    segment keeps its own 16^3 window and 8 bricks."""
    brick_refs, out_ref = refs[:8 * sps], refs[8 * sps]
    i = pl.program_id(0)
    ex, ey = ex_ref[:], ey_ref[:]

    for seg in range(sps):
        step = i * sps + seg
        lo, hi = seg * tb, (seg + 1) * tb
        out_ref[lo:hi] = _interp_seg(
            base_ref, px_ref, py_ref, pz_ref, ex, ey,
            brick_refs[seg * 8:(seg + 1) * 8], step, lo, hi, tb, cdt, prec,
        )


# -------------------------------------------------------------------- plan


def _plan(gx, gy, gz, t_tiles, tr, g_segs, s_seg, nb):
    """Window bases + sub-brick ids per (tile, segment) step.

    ``gx/gy/gz`` are (T, G, TR, S_seg) step-grouped float cell coords.
    Returns (bases (nsteps, 8) int32 cell origins, blks (nsteps, 8) int32
    block ids, fits bool)."""
    lo = [jnp.min(a, axis=(2, 3)) for a in (gx, gy, gz)]       # (T, G)
    hi = [jnp.max(a, axis=(2, 3)) for a in (gx, gy, gz)]
    b = [jnp.clip(jnp.floor(v / _SUB).astype(jnp.int32), 0, nb - 2)
         for v in lo]
    # The window serves cells B*8 .. B*8+15. A sample at coordinate g needs
    # nonzero-weight stencil cells floor(g) and, when frac(g) > 0,
    # floor(g)+1 — both <= B*8+15 exactly when g <= B*8+15 (an integral
    # g's +1 corner has zero tent weight, so the top border cell r-1,
    # where out-of-range samples clamp, still fits).
    fits = jnp.asarray(True)
    for a in range(3):
        fits = jnp.logical_and(
            fits, jnp.all(hi[a] <= (b[a] * _SUB + (2 * _SUB - 1)).astype(
                hi[a].dtype))
        )
    nsteps = t_tiles * g_segs
    bx, by, bz = (v.reshape(nsteps) for v in b)
    # 1D scalar-prefetch layouts: 2D SMEM arrays get lane-padded to 128
    # entries per row (measured: a (3072, 8) int32 operand allocates 1.5 MB
    # and overflows the 1 MB SMEM); flat (nsteps*k,) arrays stay compact.
    bases = jnp.stack([bx * _SUB, by * _SUB, bz * _SUB],
                      axis=-1).reshape(nsteps * 3)
    blks = []
    for k in range(8):
        dx, dy, dz = (k >> 2) & 1, (k >> 1) & 1, k & 1
        blks.append(((bx + dx) * nb + (by + dy)) * nb + (bz + dz))
    return bases, jnp.stack(blks, axis=-1).reshape(nsteps * 8), fits


def _step_major(a, t_tiles, tr, g_segs, s_seg):
    """(R_pad, S_pad) ray-major -> (T, G, TR, S_seg) step-grouped."""
    return a.reshape(t_tiles, tr, g_segs, s_seg).transpose(0, 2, 1, 3)


def auto_seg_samples(grid_res: int, domain_ext: float, near: float,
                     far: float, num_coarse: int, normalize: bool = True,
                     cap: int = 8) -> int:
    """Largest power-of-2 samples-per-step whose WORST-CASE depth extent
    fits the 16-cell brick window.

    The fit bit is a global AND over every (ray-tile x depth-segment) step
    of a chunk, so the step size must be sized for the widest sample
    spacing the chunk can contain — which for BOTH hierarchical passes is
    the coarse stratified spacing, ``(far-near)/num_coarse`` (a merged
    coarse+fine t keeps adjacent coarse samples wherever the fine samples
    concentrated elsewhere). Measured at the 400x400 / 128^3 bench
    geometry: the old fixed s_seg=8 fit 10% of coarse-pass steps (0/20
    chunks -> every chunk silently gathered); the auto choice (2 there)
    fits 20/20 chunks for both passes. Budget: the window serves 15 cells
    per axis; ~7 are reserved for the ray tile's lateral extent +
    diagonal travel, leaving ~8 for depth."""
    if normalize:
        cells_per_sample = 2.0 * (grid_res - 1) / (domain_ext * num_coarse)
    else:
        cells_per_sample = ((grid_res - 1) * (far - near)
                            / (domain_ext * num_coarse))
    budget = 8.0
    s = 1
    while s * 2 <= cap and cells_per_sample * (s * 2) <= budget:
        s *= 2
    return s


def _run_kernel(packed, bases, blks, gx, gy, gz, *, tb, sps, nsteps, cdt,
                prec, interpret):
    ex, ey = _expand_consts()
    tbs = tb * sps
    col = lambda a: a.reshape(nsteps * tb, 1)
    col_spec = pl.BlockSpec((tbs, 1), lambda i, bas, blk: (i, 0),
                            memory_space=pltpu.VMEM)
    const_spec = lambda a: pl.BlockSpec(
        a.shape, lambda i, bas, blk: (0, 0), memory_space=pltpu.VMEM)
    brick_specs = [
        pl.BlockSpec((1, _ROWS, _LANES),
                     functools.partial(
                         lambda i, bas, blk, k=0: (blk[i * 8 * sps + k], 0, 0),
                         k=k),
                     memory_space=pltpu.VMEM)
        for k in range(8 * sps)
    ]
    out = pl.pallas_call(
        functools.partial(_grid_kernel, tb=tb, sps=sps, cdt=cdt, prec=prec),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nsteps // sps,),
            in_specs=[col_spec, col_spec, col_spec,
                      const_spec(ex), const_spec(ey)] + brick_specs,
            out_specs=pl.BlockSpec((tbs, _LANES),
                                   lambda i, bas, blk: (i, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((nsteps * tb, _LANES), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * nsteps * tb * 8 * (_ROWS * (_LANES + 8)),
            bytes_accessed=nsteps * 8 * _ROWS * _LANES * packed.dtype.itemsize
            + nsteps * tb * 4 * 4,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(bases, blks, col(gx), col(gy), col(gz), ex, ey,
      *([packed] * (8 * sps)))
    return out


def _coherent_channels(grid, points, tr, s_seg, cdt, prec, interpret,
                       sps: int = None, packed=None):
    """Kernel-path forward: (R_rays, S, 3) points in [-1,1] ->
    ((R_rays, S, C), fits). Exact trilinear when ``fits``; garbage when
    not (callers cond on ``fits``). ``packed`` (from ``pack_grid``) skips
    the per-call repack — callers that render many chunks from one grid
    pack once (the repack moves ~R^3*C*4 bytes; inside render_image's
    lax.map chunk loop it would re-run per chunk per pass).

    ``sps`` (depth segments fetched per grid step, default 2 — each step
    DMAs 8*sps sub-bricks) is sweepable via ``NERF_TPU_GRID_SPS`` for the
    on-TPU tile sweep (tools/bench_grid_kernel.py)."""
    if sps is None:
        sps = int(os.environ.get("NERF_TPU_GRID_SPS", 2))
    r, c = grid.shape[0], grid.shape[-1]
    nb = r // _SUB
    num_rays, s = points.shape[0], points.shape[1]

    t_tiles = -(-num_rays // tr)
    g_segs = -(-s // (s_seg * sps)) * sps
    pad_r, pad_s = t_tiles * tr - num_rays, g_segs * s_seg - s

    def axis(a):
        # per-axis (R, S) extraction BEFORE any padding: jnp.pad on the
        # minor-dim-3 array costs a lane-padded copy (~3 ms per 8192x192
        # chunk measured), on the dense (R, S) slices it's cheap
        ga = jnp.clip((points[..., a] + 1.0) * (0.5 * (r - 1)),
                      0.0, float(r - 1))
        if pad_r or pad_s:
            ga = jnp.pad(ga, ((0, pad_r), (0, pad_s)), mode="edge")
        return _step_major(ga, t_tiles, tr, g_segs, s_seg)

    gx, gy, gz = axis(0), axis(1), axis(2)
    bases, blks, fits = _plan(gx, gy, gz, t_tiles, tr, g_segs, s_seg, nb)

    def kernel_path():
        pk = packed
        if pk is None:
            pk = pack_grid(grid, jnp.bfloat16 if cdt == jnp.bfloat16
                           else jnp.float32)
        tb = tr * s_seg
        out = _run_kernel(
            pk, bases, blks, gx, gy, gz, tb=tb, sps=sps,
            nsteps=t_tiles * g_segs, cdt=cdt, prec=prec, interpret=interpret,
        )
        out = out.reshape(t_tiles, g_segs, tr, s_seg, _LANES)
        out = out.transpose(0, 2, 1, 3, 4).reshape(
            t_tiles * tr, g_segs * s_seg, _LANES
        )
        return out[:num_rays, :s, :c]

    return kernel_path, fits


# ----------------------------------------------------------------- wrapper


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover - backend init failure
        return False


def _is_batched(x) -> bool:
    """True when ``x`` is a vmap tracer: the kernel's scalar-prefetched
    grid spec has no batching rule (same limitation as the KiloNeRF
    grouped kernels), so vmapped callers — multiscene training vmaps
    model.apply over the scene axis — must take the pure path."""
    try:
        from jax._src.interpreters import batching

        return isinstance(x, batching.BatchTracer)
    except Exception:  # pragma: no cover - private API moved
        return False


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _trilinear_rays_impl(grid, packed, points, tr, s_seg, cdt, prec,
                         interpret):
    """``packed``, when given, MUST equal ``pack_grid(grid, <cdt dtype>)``
    — the forward reads it, while gradients flow through ``grid`` via the
    pure backward (packed's cotangent is zero, which is the correct total
    derivative exactly under that contract)."""
    kernel_path, fits = _coherent_channels(
        grid, points, tr, s_seg, cdt, prec, interpret, packed=packed
    )

    def pure_path():
        from nerf_tpu.ops.interp import trilinear

        flat = trilinear(grid, points.reshape(-1, 3))
        return flat.reshape(*points.shape[:-1], grid.shape[-1])

    return jax.lax.cond(fits, kernel_path, pure_path)


def _impl_fwd(grid, packed, points, tr, s_seg, cdt, prec, interpret):
    out = _trilinear_rays_impl(grid, packed, points, tr, s_seg, cdt, prec,
                               interpret)
    return out, (grid, packed, points)


def _impl_bwd(tr, s_seg, cdt, prec, interpret, res, g):
    from nerf_tpu.ops.interp import _trilinear_bwd

    grid, packed, points = res
    gg, gp = _trilinear_bwd(
        (grid, points.reshape(-1, 3)), g.reshape(-1, grid.shape[-1])
    )
    g_packed = None if packed is None else jnp.zeros(packed.shape,
                                                     packed.dtype)
    return gg, g_packed, gp.reshape(points.shape)


_trilinear_rays_impl.defvjp(_impl_fwd, _impl_bwd)


def trilinear_rays(grid: jnp.ndarray, points: jnp.ndarray,
                   tile_rays: int = 64, seg_samples: int = 8,
                   dtype: str = "bfloat16",
                   interpret: bool = False,
                   force: bool = False,
                   packed: jnp.ndarray | None = None) -> jnp.ndarray:
    """Trilinear interpolation of ``grid`` (R, R, R, C) at ray-structured
    ``points`` (R_rays, S, 3) in [-1,1]^3 — exact-semantics drop-in for
    ``trilinear(grid, points.reshape(-1,3)).reshape(R_rays, S, C)``.

    On TPU, spatially coherent batches (tiles of ``tile_rays`` adjacent
    rays whose per-``seg_samples``-segment footprint fits a 16^3 window)
    run the brick-DMA + tent-matmul kernel; anything else falls back to the
    pure gather path at trace- or run-time. ``dtype`` picks the interp
    matmul precision: "bfloat16" (fast; ~3e-3 relative) or "float32"
    (exact to ~1e-6). ``force`` skips the backend check (tests use it with
    ``interpret=True``). ``packed``, when given, must be
    ``pack_grid(grid, <matching dtype>)`` — pack once per render instead
    of per chunk (models' ``precompute`` hooks do this)."""
    r, c = grid.shape[0], grid.shape[-1]
    usable = (
        (force or (_on_tpu()
                   and not os.environ.get("NERF_TPU_NO_GRID_KERNEL")))
        and points.ndim == 3
        and r % _SUB == 0
        and r // _SUB >= 2
        and c <= _LANES
        and points.shape[0] * points.shape[1] >= tile_rays * seg_samples
        and not (_is_batched(points) or _is_batched(grid))
        # multihost renders are sharded across processes (GSPMD cannot
        # partition a pallas_call) and keep scanline ray order (loop.py
        # passes hw=None), so there is no coherence to exploit anyway
        and jax.process_count() == 1
    )
    if not usable:
        from nerf_tpu.ops.interp import trilinear

        flat = trilinear(grid, points.reshape(-1, 3))
        return flat.reshape(*points.shape[:-1], c)
    if dtype == "float32":
        cdt, prec = jnp.float32, HIGHEST
    else:
        cdt, prec = jnp.bfloat16, jax.lax.Precision.DEFAULT
    if packed is not None:
        nb = r // _SUB
        want = (nb * nb * nb, _ROWS, _LANES)
        if packed.shape != want:
            raise ValueError(
                f"packed grid shape {packed.shape} != {want} "
                f"(must be pack_grid(grid))"
            )
    return _trilinear_rays_impl(
        grid, packed, points, tile_rays, seg_samples, cdt, prec, interpret
    )


def tile_ray_order(h: int, w: int, tile: int = 8) -> np.ndarray:
    """Permutation putting an (h, w) image's rays into ``tile`` x ``tile``
    pixel blocks (row-major blocks, row-major within) — the spatial
    coherence ``trilinear_rays`` wants. Returns ``perm`` with
    ``rays_blocked = rays[perm]``; invert with ``argsort(perm)``. Partial
    edge blocks are simply smaller (still contiguous)."""
    idx = np.arange(h * w, dtype=np.int64).reshape(h, w)
    out = []
    for by in range(0, h, tile):
        for bx in range(0, w, tile):
            out.append(idx[by:by + tile, bx:bx + tile].reshape(-1))
    return np.concatenate(out)
