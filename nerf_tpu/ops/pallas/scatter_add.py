"""Row scatter-add as a Pallas TPU kernel — a measured experiment.

Voxel/hash-grid training is scatter-bound on TPU: the gradient of a
gather-interpolated grid is a scatter-add of 8 corner rows per sample,
and XLA's TPU scatter costs a flat ~135 ns/row REGARDLESS of collisions,
sortedness, or phrasing (measured, tools/microbench_scatter.py, at the
1024x64-ray plenoxels shape — 524k rows x 28ch into a 128^3 grid):

    one 8N-row scatter            70.6 ms
    8 split N-row scatters        70.8 ms   (barriered or not)
    sort + sorted-flag scatter    65.7 ms
    sort + cumsum dedup           103.7 ms
    4 z-pair window scatters      2556.6 ms
    uniform vs 65536-way dup      within 5%

That is ~260x off the HBM roofline (~59 MB of updates + touched rows),
so this kernel restructures the scatter as dense work: sort rows by id
(lax.sort_key_val, 3.5 ms) + permute values (row take, 3.5 ms), then
accumulate sorted tiles into a VMEM window via ONE-HOT MATMULS (MXU, no
scatter op anywhere), flushing the window to HBM as the sorted ids
advance. Exact: f32 HIGHEST accumulation, deterministic order, and a
whole-call lax.cond fallback to the XLA scatter when one tile spans more
than ``window`` cells (same escape pattern as the grid render kernel's
fit bit).

MEASURED OUTCOME (v5e, same shape): 57 ms at best — parity-correct but
NOT yet faster than XLA's 70 ms. The ledger, so the next attempt starts
where this one stopped:
  * one accumulate pass (T=512, W=4096) costs ~18 ms — the one-hot
    compare + 8 narrow (512x512)@(512x32) dots per tile are ~55 us/tile
    against ~6 us of roofline math; per-op overhead dominates.
  * @pl.when bodies execute PREDICATED on TPU: "rare" spill passes cost
    as much as always-on ones (3 unrolled passes = 3x kernel time), and
    per-tile RMW flush variants pay the flush every tile (89-113 ms).
  * The productive lever today is FEWER ROWS, not a faster scatter:
    occupancy-guided training (cfg.occupancy_res) cuts samples ~4x at
    equal quality, and scatter cost is linear in samples.

Kept because it is correct (interpret-mode parity tests), documents the
measured design space, and is the right skeleton if Mosaic gains
non-predicated conditionals or cheaper small dots.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_CP = 32         # padded channel width; 4 cells x 32 lanes = one 128 row


def _scatter_kernel(ids_ref, idr_ref, vals_ref, zeros_ref, out_ref,
                    flag_ref, window, staging, w0_ref, sem,
                    *, T, W, n_tiles):
    """One grid step = one tile of T sorted rows.

    window:  (W//4, 128) f32 VMEM accumulator for cells [w0, w0+W), four
             cells per row; w0 is 32-cell aligned (DMA sublane tiling),
             NOT W-aligned — it rebases to each spilling tile's first id.
    staging: (W//4, 128) f32 VMEM for the read half of the RMW flush.
    w0_ref:  (1,) int32 SMEM window base, persists across grid steps.
    """
    del zeros_ref
    i = pl.program_id(0)
    ids = ids_ref[:]                      # (T, 1) int32, sorted ascending
    # (8, T) block serves 8 consecutive tiles; pick this tile's row
    idr = idr_ref[pl.ds(i % 8, 1), :]     # (1, T) same ids, row layout
    vals = vals_ref[:]                    # (T, _CP) f32
    first_id = ids[0, 0]
    last_id = ids[T - 1, 0]

    @pl.when(i == 0)
    def _init():
        window[:] = jnp.zeros_like(window)
        w0_ref[0] = (ids[0, 0] // 32) * 32
        flag_ref[0, 0] = 0

    def accumulate():
        w0 = w0_ref[0]
        local = ids - w0                                    # (T, 1)
        in_win = (local >= 0) & (local < W)
        v = jnp.where(in_win, 1.0, 0.0) * vals              # (T, _CP)
        # row-layout ids feed the one-hot compare directly: deriving
        # (1, T) from the (T, 1) column in-kernel is a Mosaic transpose
        # (~50 us/tile measured — 8x the tile's real work)
        lr = idr - w0
        inr = (lr >= 0) & (lr < W)
        lis = [jnp.where(inr & (lr % 4 == phase), lr // 4, -1)
               for phase in range(4)]
        # row-chunked so the live one-hot stays small (VMEM is 16M)
        rc = min(W // 4, 512)
        for c0 in range(0, W // 4, rc):
            rows = jax.lax.broadcasted_iota(jnp.int32, (rc, T), 0) + c0
            parts = []
            for phase in range(4):
                onehot = jnp.where(rows == lis[phase], 1.0, 0.0)
                parts.append(jax.lax.dot(
                    onehot, v, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST))
            window[c0:c0 + rc, :] += jnp.concatenate(parts, axis=1)

    def flush(next_base):
        # rebased windows can overlap earlier ones: read-modify-write,
        # exact under the sequential grid
        w0 = w0_ref[0]
        dma_in = pltpu.make_async_copy(
            out_ref.at[pl.ds(w0 // 4, W // 4)], staging, sem)
        dma_in.start()
        dma_in.wait()
        staging[:] += window[:]
        dma_out = pltpu.make_async_copy(
            staging, out_ref.at[pl.ds(w0 // 4, W // 4)], sem)
        dma_out.start()
        dma_out.wait()
        window[:] = jnp.zeros_like(window)
        w0_ref[0] = next_base

    # rebase BEFORE the tile's single accumulate pass when it outruns the
    # window; a tile spanning more than W cells escapes via the flag
    @pl.when(last_id >= w0_ref[0] + W)
    def _rebase():
        flush((first_id // 32) * 32)

    accumulate()

    @pl.when(last_id >= w0_ref[0] + W)
    def _overflow():
        flag_ref[0, 0] = 1

    @pl.when(i == n_tiles - 1)
    def _final():
        flush(jnp.int32(0))


def _xla_scatter(ids, vals, num_rows):
    return jnp.zeros((num_rows, vals.shape[-1]), vals.dtype).at[ids].add(vals)


def scatter_add_rows(ids: jax.Array, vals: jax.Array, num_rows: int,
                     tile: int = 1024, window: int = 8192,
                     interpret: bool = False,
                     force: bool = False) -> jax.Array:
    """``zeros((num_rows, C), f32).at[ids].add(vals)`` via the
    sorted-window kernel. Exact up to f32 summation order (the matmul
    accumulates at HIGHEST precision; the sort fixes a deterministic
    order), with a whole-call lax.cond fallback to the XLA scatter when
    any single tile's ids span more than ``window`` cells.

    ids: (M,) int32 in [0, num_rows); vals: (M, C) float32, C <= 32.
    """
    from nerf_tpu.ops.pallas import _on_tpu

    M, C = vals.shape
    if C > _CP or not (force or _on_tpu()) or M < tile:
        return _xla_scatter(ids, vals, num_rows)

    sidx, perm = jax.lax.sort_key_val(ids.astype(jnp.int32),
                                      jnp.arange(M, dtype=jnp.int32))
    sval = jnp.take(vals, perm, axis=0).astype(jnp.float32)
    pad_m = (-M) % tile
    if pad_m:
        # pad rows repeat the last id with zero values: same window, no-op
        sidx = jnp.concatenate(
            [sidx, jnp.full((pad_m,), sidx[-1], jnp.int32)])
        sval = jnp.concatenate([sval, jnp.zeros((pad_m, C), jnp.float32)])
    if C != _CP:
        sval = jnp.pad(sval, ((0, 0), (0, _CP - C)))
    n_tiles = (M + pad_m) // tile

    rows_pad = -(-num_rows // window) * window + window
    zeros = jnp.zeros((rows_pad // 4, 4 * _CP), jnp.float32)
    # row-layout ids, 8 tiles per sublane-aligned block
    pad_t = (-n_tiles) % 8
    sidx_rows = sidx.reshape(n_tiles, tile)
    if pad_t:
        sidx_rows = jnp.concatenate(
            [sidx_rows, jnp.zeros((pad_t, tile), jnp.int32)])

    kernel = functools.partial(
        _scatter_kernel, T=tile, W=window, n_tiles=n_tiles,
    )
    out, flag = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, tile), lambda i: (i // 8, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, _CP), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows_pad // 4, 4 * _CP), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((window // 4, 4 * _CP), jnp.float32),  # window
            pltpu.VMEM((window // 4, 4 * _CP), jnp.float32),  # RMW staging
            pltpu.SMEM((1,), jnp.int32),                      # base
            pltpu.SemaphoreType.DMA(()),
        ],
        input_output_aliases={3: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(sidx.reshape(n_tiles * tile, 1), sidx_rows, sval, zeros)

    # unpack 4-cells-per-row -> (rows, C)
    result = out.reshape(rows_pad, _CP)[:num_rows, :C].astype(vals.dtype)
    return jax.lax.cond(
        flag[0, 0] == 0,
        lambda: result,
        lambda: _xla_scatter(ids, vals, num_rows),
    )
