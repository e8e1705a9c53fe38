"""Fully fused grid-family rendering: interp + color decode + compositing
in ONE Pallas TPU kernel.

The coherent brick-DMA kernel (fused_grid.py) removes the gathers from
grid-family rendering, but channels-out still writes every sample's
interpolated (S, 32) row to HBM, and XLA then re-reads it for the SH/
factor color decode, the density activation, and the transmittance scan —
at 400x400 x 192 samples x 32 lanes that round trip alone is ~7 GB/frame
of HBM traffic against a few hundred MB of brick reads. This kernel keeps
the interpolated channels in VMEM and finishes the ray right there:

  per (ray-tile x depth-segment) step
    interp      (TB, 32)  <- _interp_seg (fused_grid.py: tent matmuls)
    sigma       softplus/relu of channel 0 (masked lane reduce, no slice)
    rgb         sigmoid((interp * basis_expanded) @ SEL) — SEL is a 0/1
                (32, 8) channel->color map, so BOTH decode layouts ride
                one MXU dot: Plenoxels/PlenOctree SH (channel 1+c*L+l,
                basis = Y_lm(viewdir)) and baked FastNeRF factors
                (channel 1+d*3+c, basis = beta(viewdir));
    composite   exclusive-cumprod transmittance via the segmented
                Hillis-Steele roll-scan (fused_render.py), with the
                per-ray carry threaded ACROSS depth segments through
                lane 5 of the revisited per-tile output block.

Outputs are per-ray stats (rgb, acc, depth) plus the (R, S) weights the
hierarchical fine pass resamples — the (R, S, 32) intermediate never
exists in HBM.

Exactness: the window-fit bit from the shared plan (fused_grid.py::_plan)
gates a lax.cond to a pure-XLA path (trilinear gather + decode +
ops.volume.composite), so results match the unfused route everywhere —
coherence only picks which path computes them. Eval-only by design
(``eval_only = True``): training batches are incoherent (the plan would
fall back every step) and gradients would need a whole-kernel VJP;
resolve_fused_render skips eval-only kernels for training routes.

Reference semantics covered: rendering.py:110-153 (transmittance +
compositing), rendering.py:30-64 (deltas with the 1e10 tail),
rendering.py:67-107 ([near,far] -> [-1,1] normalization, folded into the
ray->cell affine).
"""

from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nerf_tpu.ops.pallas.fused_grid import (
    _LANES,
    _ROWS,
    _SUB,
    _expand_consts,
    _interp_seg,
    _plan,
    _step_major,
    pack_grid,
    packable,
)
from nerf_tpu.ops.pallas.fused_render import (
    _onehot_rows,
    _per_ray_sum,
    _rep,
    _seg_excl_cumprod_col,
    _seg_pos,
)

HIGHEST = jax.lax.Precision.HIGHEST


def _grid_render_kernel(base_ref, blk_ref, px_ref, py_ref, pz_ref,
                        t_ref, d_ref, bexp_ref, ex_ref, ey_ref, sel_ref,
                        *refs, tb, sps, steps_per_tile, s_seg, tr, cdt,
                        prec, softplus_sigma):
    """One grid step = ``sps`` depth segments of one ray tile: interp,
    decode, and composite each, carrying per-ray transmittance and the
    accumulating (rgb, acc, depth) stats in the revisited ray-stats block.

    Ray-stats lanes: 0-2 rgb, 3 acc, 4 depth, 5 transmittance carry
    (initialized to 1 at each tile's first segment), 6-7 zero.
    """
    brick_refs = refs[:8 * sps]
    ray_ref, w_ref = refs[8 * sps], refs[8 * sps + 1]
    i = pl.program_id(0)
    ex, ey, sel = ex_ref[:], ey_ref[:], sel_ref[:]
    lane8r = jax.lax.broadcasted_iota(jnp.int32, (tr, 8), 1)
    lane32 = jax.lax.broadcasted_iota(jnp.int32, (tb, _LANES), 1)
    col8 = jax.lax.broadcasted_iota(jnp.int32, (tb, 8), 1)
    g8 = _onehot_rows(tb, tr, s_seg)
    pos = _seg_pos(tb, s_seg)
    bexp = _rep(bexp_ref[:], s_seg)          # (TB, 32) per-sample basis

    for seg in range(sps):
        step = i * sps + seg
        lo, hi = seg * tb, (seg + 1) * tb
        if seg == 0:
            @pl.when(jax.lax.rem(i, steps_per_tile) == 0)
            def _init():
                # fresh tile: zero stats, transmittance carry = 1
                ray_ref[:] = jnp.where(lane8r == 5, 1.0, 0.0)

        acc = _interp_seg(
            base_ref, px_ref, py_ref, pz_ref, ex, ey,
            brick_refs[seg * 8:(seg + 1) * 8], step, lo, hi, tb, cdt, prec,
        )

        # density from channel 0 (masked lane reduce — no lane slicing)
        sraw = jnp.sum(jnp.where(lane32 == 0, acc, 0.0), axis=1,
                       keepdims=True)
        if softplus_sigma:
            sigma = jnp.maximum(sraw, 0.0) + jnp.log1p(
                jnp.exp(-jnp.abs(sraw)))
        else:
            sigma = jnp.maximum(sraw, 0.0)

        # transmittance: within-segment roll-scan x across-segment carry
        one_m = jnp.exp(-sigma * d_ref[lo:hi])       # = 1 - alpha, exactly
        t_local = _seg_excl_cumprod_col(one_m, s_seg)
        cur = ray_ref[:]
        carry = jnp.sum(jnp.where(lane8r == 5, cur, 0.0), axis=1,
                        keepdims=True)               # (TR, 1)
        w = t_local * _rep(carry, s_seg) * (1.0 - one_m)

        # color decode: one (TB, 32) x (32, 8) dot serves SH and factors
        rgb8 = jax.nn.sigmoid(jax.lax.dot(
            acc * bexp, sel,
            preferred_element_type=jnp.float32, precision=HIGHEST,
        ))
        stat = (w * jnp.where(col8 < 3, rgb8, 0.0)
                + jnp.where(col8 == 3, w, 0.0)
                + jnp.where(col8 == 4, w * t_ref[lo:hi], 0.0))
        inc = _per_ray_sum(g8, stat)                 # (TR, 8); lanes 5-7 = 0
        seg_prod = _per_ray_sum(
            g8, jnp.where(pos == s_seg - 1, t_local * one_m, 0.0))
        ray_ref[:] = jnp.where(lane8r == 5, carry * seg_prod, cur + inc)
        w_ref[lo:hi] = w


def _run_render_kernel(packed, bases, blks, gx, gy, gz, tcol, dcol, bexp, *,
                       tr, s_seg, sps, t_tiles, g_segs, sel, cdt, prec,
                       softplus_sigma, interpret):
    ex, ey = _expand_consts()
    tb = tr * s_seg
    tbs = tb * sps
    nsteps = t_tiles * g_segs
    steps_per_tile = g_segs // sps
    col = lambda a: a.reshape(nsteps * tb, 1)
    col_spec = pl.BlockSpec((tbs, 1), lambda i, bas, blk: (i, 0),
                            memory_space=pltpu.VMEM)
    const_spec = lambda a: pl.BlockSpec(
        a.shape, lambda i, bas, blk: (0, 0), memory_space=pltpu.VMEM)
    bexp_spec = pl.BlockSpec(
        (tr, _LANES),
        # same block across a tile's steps -> Mosaic re-DMAs nothing
        functools.partial(
            lambda i, bas, blk, spt=1: (i // spt, 0), spt=steps_per_tile),
        memory_space=pltpu.VMEM,
    )
    brick_specs = [
        pl.BlockSpec((1, _ROWS, _LANES),
                     functools.partial(
                         lambda i, bas, blk, k=0: (blk[i * 8 * sps + k], 0, 0),
                         k=k),
                     memory_space=pltpu.VMEM)
        for k in range(8 * sps)
    ]
    ray_spec = pl.BlockSpec(
        (tr, 8),
        functools.partial(
            lambda i, bas, blk, spt=1: (i // spt, 0), spt=steps_per_tile),
        memory_space=pltpu.VMEM,
    )
    w_spec = pl.BlockSpec((tbs, 1), lambda i, bas, blk: (i, 0),
                          memory_space=pltpu.VMEM)
    stats, weights = pl.pallas_call(
        functools.partial(
            _grid_render_kernel, tb=tb, sps=sps,
            steps_per_tile=steps_per_tile, s_seg=s_seg, tr=tr, cdt=cdt,
            prec=prec, softplus_sigma=softplus_sigma,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nsteps // sps,),
            in_specs=[col_spec, col_spec, col_spec, col_spec, col_spec,
                      bexp_spec, const_spec(ex), const_spec(ey),
                      const_spec(sel)] + brick_specs,
            out_specs=(ray_spec, w_spec),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((t_tiles * tr, 8), jnp.float32),
            jax.ShapeDtypeStruct((nsteps * tb, 1), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * nsteps * tb * (8 * (_ROWS * (_LANES + 8))
                                     + _LANES * 8),
            bytes_accessed=nsteps * 8 * _ROWS * _LANES * packed.dtype.itemsize
            + nsteps * tb * 6 * 4,
            transcendentals=nsteps * tb * 6,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(bases, blks, col(gx), col(gy), col(gz), col(tcol), col(dcol), bexp,
      ex, ey, sel, *([packed] * (8 * sps)))
    return stats, weights


class FusedGridRender:
    """Callable with the fused-render contract (see FusedNerfRender):
    ``__call__(params, rays_o, rays_d, viewdirs, t)`` -> dict with
    ``rgb (R,3)``, ``acc (R,)``, ``depth (R,)``, ``weights (R,S)``. White
    background and disparity are left to the caller. Forward/eval only
    (``eval_only``) — training keeps the pure gather path, whose custom
    VJP is exact.

    ``grid_fn(params) -> (grid, packed|None)`` supplies the voxel grid
    (and its pre-packed bricks when the caller's precompute hook ran);
    ``basis_fn(viewdirs) -> (R, 32)`` the channel-expanded per-ray color
    basis matching ``sel``'s layout.
    """

    eval_only = True

    def __init__(self, grid_fn, basis_fn, sel, grid_res: int, channels: int,
                 near: float, far: float, normalize: bool,
                 softplus_sigma: bool, interp_dtype: str = "bfloat16",
                 tile_rays: int = 64, seg_samples: int = 8, sps: int = 2,
                 domain: tuple = (-1.0, 1.0), num_coarse: int = 0,
                 interpret: bool = False, force: bool = False):
        self.grid_fn = grid_fn
        self.basis_fn = basis_fn
        # numpy, not a device array (lowering D2H; see fused_render.py)
        self.sel = np.asarray(sel, np.float32)
        self.r, self.c = int(grid_res), int(channels)
        self.near, self.far, self.normalize = float(near), float(far), normalize
        self.domain = (float(domain[0]), float(domain[1]))
        self.softplus_sigma = softplus_sigma
        if interp_dtype == "float32":
            self.cdt, self.prec = jnp.float32, HIGHEST
        else:
            self.cdt, self.prec = jnp.bfloat16, jax.lax.Precision.DEFAULT
        self.tr = int(os.environ.get("NERF_TPU_GRID_TILE_RAYS", tile_rays))
        if "NERF_TPU_GRID_SEG" in os.environ:  # sweep override: exact value
            self.s_seg = int(os.environ["NERF_TPU_GRID_SEG"])
        elif num_coarse > 0:
            # size steps so the WORST-CASE spacing (the coarse stratified
            # spacing — merged hierarchical t inherits it) fits the window;
            # the old fixed 8 silently gathered every real render chunk
            from nerf_tpu.ops.pallas.fused_grid import auto_seg_samples

            self.s_seg = min(seg_samples, auto_seg_samples(
                grid_res, float(domain[1]) - float(domain[0]), near, far,
                num_coarse, normalize=normalize, cap=seg_samples))
        else:
            self.s_seg = int(seg_samples)
        self.sps = int(os.environ.get("NERF_TPU_GRID_SPS", sps))
        self.interpret = interpret
        self.force = force

    def supported(self) -> bool:
        if not packable((self.r, self.r, self.r, self.c)):
            return False
        if self.force:
            return True  # tests drive interpret mode off-TPU
        return (jax.process_count() == 1
                # the gather-baseline escape hatch disables ALL grid
                # kernels; NO_FUSED_GRID_RENDER isolates this kernel from
                # the channels-out tier (bench sweeps, debugging)
                and not os.environ.get("NERF_TPU_NO_GRID_KERNEL")
                and not os.environ.get("NERF_TPU_NO_FUSED_GRID_RENDER"))

    def _cells(self, rays_o, rays_d, t):
        """Per-axis float cell coordinates (R, S): the [near,far]->[-1,1]
        normalization (when active) AND the model's domain cube
        (registry.py::grid_domain) folded into one ray->cell affine."""
        r = self.r
        lo, hi = self.domain
        ext = hi - lo
        if self.normalize:
            s_n = 2.0 / (self.far - self.near)          # world -> normalized
            o_n = -2.0 * self.near / (self.far - self.near) - 1.0
            scale = (r - 1.0) * s_n / ext               # -> domain -> cells
            off = (r - 1.0) * (o_n - lo) / ext
        else:  # raw points already in the model's input space
            scale = (r - 1.0) / ext
            off = (r - 1.0) * (-lo) / ext
        return [
            jnp.clip(
                (scale * rays_o[:, a:a + 1] + off)
                + (scale * rays_d[:, a:a + 1]) * t,
                0.0, float(r - 1),
            )
            for a in range(3)
        ]

    def __call__(self, params, rays_o, rays_d, viewdirs, t):
        from nerf_tpu.ops.interp import trilinear
        from nerf_tpu.ops.sampling import deltas_from_t
        from nerf_tpu.ops.volume import composite

        grid, packed = self.grid_fn(params)
        num_rays, s = t.shape
        tr, s_seg, sps = self.tr, self.s_seg, self.sps
        ga = self._cells(rays_o, rays_d, t)          # 3 x (R, S)
        deltas = deltas_from_t(t)                    # (R, S), 1e10 tail
        bexp = self.basis_fn(viewdirs)               # (R, 32)

        t_tiles = -(-num_rays // tr)
        g_segs = -(-s // (s_seg * sps)) * sps
        pad_r, pad_s = t_tiles * tr - num_rays, g_segs * s_seg - s

        def pad_edge(a):  # rays: repeat last (coherent); samples: repeat
            if pad_r or pad_s:
                a = jnp.pad(a, ((0, pad_r), (0, pad_s)), mode="edge")
            return a

        gx, gy, gz = (_step_major(pad_edge(a), t_tiles, tr, g_segs, s_seg)
                      for a in ga)
        # pad deltas with ZEROS: alpha = 0, so pad samples are weightless
        # and the carry/depth/acc of real samples is untouched
        d_pad = deltas
        if pad_r or pad_s:
            d_pad = jnp.pad(deltas, ((0, pad_r), (0, 0)), mode="edge")
            d_pad = jnp.pad(d_pad, ((0, 0), (0, pad_s)))
        dcol = _step_major(d_pad, t_tiles, tr, g_segs, s_seg)
        tcol = _step_major(pad_edge(t), t_tiles, tr, g_segs, s_seg)
        bexp_pad = (jnp.pad(bexp, ((0, pad_r), (0, 0)), mode="edge")
                    if pad_r else bexp)

        bases, blks, fits = _plan(gx, gy, gz, t_tiles, tr, g_segs, s_seg,
                                  self.r // _SUB)

        def kernel_path():
            pk = packed
            if pk is None:
                pk = pack_grid(grid, self.cdt)
            stats, w = _run_render_kernel(
                pk, bases, blks, gx, gy, gz, tcol, dcol, bexp_pad,
                tr=tr, s_seg=s_seg, sps=sps, t_tiles=t_tiles, g_segs=g_segs,
                sel=self.sel, cdt=self.cdt, prec=self.prec,
                softplus_sigma=self.softplus_sigma,
                interpret=self.interpret,
            )
            w = w.reshape(t_tiles, g_segs, tr, s_seg).transpose(0, 2, 1, 3)
            w = w.reshape(t_tiles * tr, g_segs * s_seg)[:num_rays, :s]
            stats = stats[:num_rays]
            return stats[:, 0:3], stats[:, 3], stats[:, 4], w

        def pure_path():
            # exact fallback (incoherent batches): gather interp + the
            # same decode/composite in XLA, from the identical clamped
            # cell coordinates
            half = (self.r - 1.0) / 2.0
            pts = jnp.stack([a / half - 1.0 for a in ga], axis=-1)
            vals = trilinear(grid, pts.reshape(-1, 3)).reshape(
                num_rays, s, self.c)
            sraw = vals[..., 0]
            sigma = (jax.nn.softplus(sraw) if self.softplus_sigma
                     else jax.nn.relu(sraw))
            prod = vals * bexp[:, None, :self.c]
            rgb = jax.nn.sigmoid(
                jnp.einsum("rsc,cd->rsd", prod, self.sel[:self.c, :3],
                           precision=HIGHEST))
            out = composite(rgb, sigma, deltas, t=t, white_background=False)
            return out.rgb, out.acc, out.depth, out.weights

        rgb, acc, depth, weights = jax.lax.cond(fits, kernel_path, pure_path)
        return {"rgb": rgb, "acc": acc, "depth": depth,
                "weights": jax.lax.stop_gradient(weights)}


def _sh_sel(channels: int, l_dim: int) -> np.ndarray:
    """SH layout: channel 1 + c*L + l belongs to color c."""
    sel = np.zeros((_LANES, 8), np.float32)
    for c in range(3):
        for l in range(l_dim):
            sel[1 + c * l_dim + l, c] = 1.0
    return sel


def _factor_sel(channels: int, d_dim: int) -> np.ndarray:
    """Factor layout (baked FastNeRF): channel 1 + d*3 + c -> color c."""
    sel = np.zeros((_LANES, 8), np.float32)
    for d in range(d_dim):
        for c in range(3):
            sel[1 + d * 3 + c, c] = 1.0
    return sel


def _expand_basis(x: jnp.ndarray, repeat_block: bool) -> jnp.ndarray:
    """(R, L) basis -> (R, 32) channel-aligned: [0, basis x3 blocks, 0...]
    for SH (c-major channels) or [0, interleaved x3, 0...] for factors."""
    num = x.shape[0]
    if repeat_block:          # SH: basis repeats per color block
        body = jnp.concatenate([x, x, x], axis=1)
    else:                     # factors: each beta_d covers 3 channels
        body = jnp.repeat(x, 3, axis=1)
    pad = _LANES - 1 - body.shape[1]
    return jnp.concatenate(
        [jnp.zeros((num, 1), x.dtype), body,
         jnp.zeros((num, pad), x.dtype)], axis=1)


def make_fused_grid_render(model, near, far, normalize=True,
                           num_coarse: int = 0,
                           interpret: bool = False, force: bool = False):
    """FusedGridRender for SH voxel grids (PlenoxelsModel — also the baked
    PlenOctree cache) and baked FastNeRF caches; None when the model's
    grid shape can't ride the kernel."""
    from nerf_tpu.models.plenoxels import PlenoxelsModel, sh_basis

    if isinstance(model, PlenoxelsModel):
        l_dim = model.sh_dim
        if model.channels > _LANES:  # sel rows would overflow the 32 lanes
            return None

        fr = FusedGridRender(
            grid_fn=lambda p: (p["grid"], p.get("_packed")),
            basis_fn=lambda d: _expand_basis(
                sh_basis(d, model.sh_degree), repeat_block=True),
            sel=_sh_sel(model.channels, l_dim),
            grid_res=model.grid_res, channels=model.channels,
            near=near, far=far, normalize=normalize,
            softplus_sigma=True, interp_dtype=model.interp_dtype,
            domain=model.domain, num_coarse=num_coarse,
            interpret=interpret, force=force,
        )
        return fr if (model.use_grid_kernel and fr.supported()) else None

    from nerf_tpu.models.fastnerf import BakedFastNeRF

    if isinstance(model, BakedFastNeRF):
        d_dim = model.num_factors
        if model.pos_grid.shape[-1] > _LANES:  # 1 + 3D channel rows
            return None

        def beta_basis(dirs):
            # one source for the direction-grid parameterization: the
            # cache's own beta(); kernel-vs-fallback exactness depends on it
            return _expand_basis(model.beta(dirs), repeat_block=False)

        fr = FusedGridRender(
            grid_fn=lambda p: (model.pos_grid, model.packed_pos),
            basis_fn=beta_basis,
            sel=_factor_sel(model.pos_grid.shape[-1], d_dim),
            grid_res=model.pos_grid.shape[0],
            channels=model.pos_grid.shape[-1],
            near=near, far=far, normalize=normalize,
            softplus_sigma=False,  # baked FastNeRF uses relu density
            domain=model.domain, num_coarse=num_coarse,
            interpret=interpret, force=force,
        )
        return fr if (model.use_grid_kernel and fr.supported()) else None
    return None
