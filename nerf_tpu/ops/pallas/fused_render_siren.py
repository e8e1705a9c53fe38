"""Fully fused SIREN volumetric rendering (Pallas TPU kernels).

The SIREN counterpart of `fused_render` (see that module's header for the
design): one kernel per pass renders whole-ray tiles — in-kernel sample
positions, the 8-layer sine MLP (reference /root/reference/nerf/models.py:
130-203, via `fused_siren._mlp_tile`), and volume compositing — with an
analytic backward through compositing shared via `fused_render._composite_bwd`.

SIREN takes RAW normalized positions (no positional encoding of positions,
models.py:163-166), so the per-ray inputs are just the affine-normalized
origin/direction padded to 8 lanes: p_norm = (a*o+b) + t*(a*d) assembles
per sample on the VPU. View directions still use the L=4 frequency encoding
(models.py:197), precomputed per ray on the host side.
"""

from __future__ import annotations

import functools

import jax
import numpy as np
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nerf_tpu.ops.pallas.fused_nerf import (
    _cast_weights,
    _enc_consts,
    _round_up,
)
from nerf_tpu.ops.pallas.fused_render import (
    _col_spec,
    _t_spec,
    _composite_bwd,
    _composite_tile,
    _mse_cotangent,
    _onehot_rows,
    _point_cols_from_t,
    _rep,
    _slot_rays,
    _unslot_rays,
)
from nerf_tpu.ops.pallas.fused_siren import (
    _NUM_BASE,
    _WEIGHT_NAMES,
    _mlp_bwd_core,
    _mlp_tile,
    pack_params,
)

HIGHEST = jax.lax.Precision.HIGHEST


def _field_tile(o8, d8, denc_r, t, s, w, w0s, sigma_mul, rgb_mul, cdt):
    pts8 = _rep(o8, s) + t * _rep(d8, s)      # (TB, 8), cols 3..7 zero
    denc = _rep(denc_r, s)
    return _mlp_tile(pts8, denc, w, w0s, sigma_mul, rgb_mul, cdt), pts8


def _fwd_kernel(*refs, cdt, s, tr, slot, w0s, sigma_mul, rgb_mul):
    (o8_r, d8_r, denc_r, t_r), refs = refs[:4], refs[4:]
    w_refs, (out_ref, wcol_ref) = refs[:-2], refs[-2:]
    w = {k: v[:] for k, v in zip(_WEIGHT_NAMES, w_refs)}
    tb = tr * s
    g8 = _onehot_rows(tb, tr, s)
    t, delta = _point_cols_from_t(t_r[:][:tr], s)
    (acts, sigma), _ = _field_tile(
        o8_r[:][:tr], d8_r[:][:tr], denc_r[:][:tr], t, s, w,
        w0s, sigma_mul, rgb_mul, cdt,
    )
    # cdt deliberately NOT passed: SIREN is VPU-bound (sine chain), so the
    # hi/lo 2-pass per-ray sum's extra VPU split work costs more than the
    # MXU passes it saves (measured 124.5k vs 127.6k rays/s, round 5)
    ray_out, w_col, _, _ = _composite_tile(acts, sigma, t, delta, g8, tb,
                                           tr, s)
    if slot != tr:
        ray_out = jnp.pad(ray_out, ((0, slot - tr), (0, 0)))
    out_ref[:] = ray_out
    wcol_ref[:] = w_col


def _bwd_kernel(*refs, cdt, s, tr, slot, num_w, w0s, sigma_mul, rgb_mul):
    (o8_r, d8_r, denc_r, t_r, g_ref), refs = refs[:5], refs[5:]
    w_refs = refs[:num_w]
    acc_refs = dict(zip(_WEIGHT_NAMES, refs[num_w:]))
    w = {k: v[:] for k, v in zip(_WEIGHT_NAMES, w_refs)}

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for r in acc_refs.values():
            r[:] = jnp.zeros_like(r)

    tb = tr * s
    g8 = _onehot_rows(tb, tr, s)
    t, delta = _point_cols_from_t(t_r[:][:tr], s)
    (acts, sigma), pts8 = _field_tile(
        o8_r[:][:tr], d8_r[:][:tr], denc_r[:][:tr], t, s, w,
        w0s, sigma_mul, rgb_mul, cdt,
    )
    _, w_col, T_col, one_m = _composite_tile(
        acts, sigma, t, delta, g8, tb, tr, s
    )
    g_rgb8, g_sigma = _composite_bwd(
        acts["rgb8"], w_col, T_col, one_m, t, delta, g_ref[:][:tr], s
    )
    _mlp_bwd_core(acts, pts8, w, cdt, g_rgb8, g_sigma, acc_refs,
                  w0s, sigma_mul, rgb_mul, want_input_grads=False)


def _train_kernel(*refs, cdt, s, tr, slot, num_w, w0s, sigma_mul, rgb_mul,
                  white_bg, scale, num_valid):
    """Single-kernel SIREN train pass: forward + MSE + backward (see the
    NeRF counterpart in fused_render._train_kernel)."""
    (o8_r, d8_r, denc_r, t_r, tgt_r), refs = refs[:5], refs[5:]
    w_refs = refs[:num_w]
    loss_ref, out_ref, wcol_ref = refs[num_w], refs[num_w + 1], refs[num_w + 2]
    acc_refs = dict(zip(_WEIGHT_NAMES, refs[num_w + 3:]))
    w = {k: v[:] for k, v in zip(_WEIGHT_NAMES, w_refs)}

    @pl.when(pl.program_id(0) == 0)
    def _init():
        loss_ref[:] = jnp.zeros_like(loss_ref)
        for r in acc_refs.values():
            r[:] = jnp.zeros_like(r)

    tb = tr * s
    g8 = _onehot_rows(tb, tr, s)
    t, delta = _point_cols_from_t(t_r[:][:tr], s)
    (acts, sigma), pts8 = _field_tile(
        o8_r[:][:tr], d8_r[:][:tr], denc_r[:][:tr], t, s, w,
        w0s, sigma_mul, rgb_mul, cdt,
    )
    ray_out, w_col, T_col, one_m = _composite_tile(
        acts, sigma, t, delta, g8, tb, tr, s
    )

    loss_tile, g_ray = _mse_cotangent(
        ray_out, tgt_r[:][:tr], tr, slot, pl.program_id(0), num_valid,
        white_bg, scale,
    )
    lcol = jax.lax.broadcasted_iota(jnp.int32, (1, 8), 1)
    loss_ref[:] += jnp.where(lcol == 0, loss_tile, 0.0)

    g_rgb8, g_sigma = _composite_bwd(
        acts["rgb8"], w_col, T_col, one_m, t, delta, g_ray, s
    )
    _mlp_bwd_core(acts, pts8, w, cdt, g_rgb8, g_sigma, acc_refs,
                  w0s, sigma_mul, rgb_mul, want_input_grads=False)

    if slot != tr:
        ray_out = jnp.pad(ray_out, ((0, slot - tr), (0, 0)))
    out_ref[:] = ray_out
    wcol_ref[:] = w_col


def _ray_specs(slot: int, d_pad: int):
    def spec(width):
        return pl.BlockSpec((slot, width), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    return [spec(8), spec(8), spec(d_pad)]


def _build(h, d_pad, s, tr_fwd, tr_bwd, cdt, w0s, sigma_mul, rgb_mul,
           interpret):
    num_w = len(_WEIGHT_NAMES)
    slot_fwd = _round_up(tr_fwd, 8)
    slot_bwd = _round_up(tr_bwd, 8)
    kern_args = dict(cdt=cdt, s=s, w0s=w0s, sigma_mul=sigma_mul,
                     rgb_mul=rgb_mul)
    mm_cols = 8 * h + 7 * h * h + h + h * h + (h + d_pad) * (h // 2) \
        + (h // 2) * 8

    def weight_specs(wc):
        return [
            pl.BlockSpec(wc[n].shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
            for n in _WEIGHT_NAMES
        ]

    def run_fwd(wc, prep):
        o8, d8, denc, t2d = prep
        n = t2d.shape[0] * s
        tb = tr_fwd * s
        n_tiles = n // tb
        o8, d8, denc, t2d = (
            _slot_rays(x, tr_fwd, slot_fwd) for x in (o8, d8, denc, t2d)
        )
        out_spec = pl.BlockSpec((slot_fwd, 8), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
        ray_out, w_col = pl.pallas_call(
            functools.partial(_fwd_kernel, tr=tr_fwd, slot=slot_fwd,
                              **kern_args),
            grid=(n_tiles,),
            in_specs=_ray_specs(slot_fwd, d_pad)
            + [_t_spec(slot_fwd, s)] + weight_specs(wc),
            out_specs=[out_spec, _col_spec(tb)],
            out_shape=[
                jax.ShapeDtypeStruct((n_tiles * slot_fwd, 8), jnp.float32),
                jax.ShapeDtypeStruct((n, 1), jnp.float32),
            ],
            cost_estimate=pl.CostEstimate(
                flops=2 * n * mm_cols,
                bytes_accessed=n * 2 * 4 + (n // s) * 24 * 4,
                transcendentals=n * (8 * h + 8),
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
        )(o8, d8, denc, t2d, *(wc[k] for k in _WEIGHT_NAMES))
        return _unslot_rays(ray_out, tr_fwd, slot_fwd), w_col

    def run_bwd(wc, prep, g_ray):
        o8, d8, denc, t2d = prep
        n = t2d.shape[0] * s
        tb = tr_bwd * s
        o8, d8, denc, t2d = (
            _slot_rays(x, tr_bwd, slot_bwd) for x in (o8, d8, denc, t2d)
        )
        g_ray = _slot_rays(g_ray, tr_bwd, slot_bwd)
        g_spec = pl.BlockSpec((slot_bwd, 8), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)
        acc_specs = [
            pl.BlockSpec(wc[k].shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
            for k in _WEIGHT_NAMES
        ]
        acc_shapes = [
            jax.ShapeDtypeStruct(wc[k].shape, jnp.float32)
            for k in _WEIGHT_NAMES
        ]
        outs = pl.pallas_call(
            functools.partial(_bwd_kernel, tr=tr_bwd, slot=slot_bwd,
                              num_w=num_w, **kern_args),
            grid=(n // tb,),
            in_specs=_ray_specs(slot_bwd, d_pad)
            + [_t_spec(slot_bwd, s), g_spec] + weight_specs(wc),
            out_specs=acc_specs,
            out_shape=acc_shapes,
            cost_estimate=pl.CostEstimate(
                flops=3 * 2 * n * mm_cols,
                bytes_accessed=n * 2 * 4 + (n // s) * 32 * 4,
                transcendentals=n * (16 * h + 8),
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
        )(o8, d8, denc, t2d, g_ray, *(wc[k] for k in _WEIGHT_NAMES))
        return dict(zip(_WEIGHT_NAMES, outs))

    @jax.custom_vjp
    def fused(packed, prep):
        return run_fwd(_cast_weights(packed, cdt), prep)

    def fused_fwd(packed, prep):
        wc = _cast_weights(packed, cdt)
        return run_fwd(wc, prep), (wc, prep)

    def fused_bwd(res, g):
        wc, prep = res
        g_ray, _g_wcol = g  # weights output is stop-gradient
        dpacked = run_bwd(wc, prep, g_ray)
        return dpacked, jax.tree.map(jnp.zeros_like, prep)

    fused.defvjp(fused_fwd, fused_bwd)
    return fused


def _build_train(h, d_pad, s, tr, cdt, w0s, sigma_mul, rgb_mul, white_bg,
                 scale, num_valid, interpret):
    num_w = len(_WEIGHT_NAMES)
    slot = _round_up(tr, 8)
    kern_args = dict(cdt=cdt, s=s, w0s=w0s, sigma_mul=sigma_mul,
                     rgb_mul=rgb_mul)
    mm_cols = 8 * h + 7 * h * h + h + h * h + (h + d_pad) * (h // 2) \
        + (h // 2) * 8

    def weight_specs(wc):
        return [
            pl.BlockSpec(wc[n].shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
            for n in _WEIGHT_NAMES
        ]

    def run_train(wc, prep, target8):
        o8, d8, denc, t2d = prep
        n = t2d.shape[0] * s
        tb = tr * s
        n_tiles = n // tb
        o8, d8, denc, t2d, target8 = (
            _slot_rays(x, tr, slot) for x in (o8, d8, denc, t2d, target8)
        )
        row8 = pl.BlockSpec((slot, 8), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
        loss_spec = pl.BlockSpec((1, 8), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM)
        acc_specs = [
            pl.BlockSpec(wc[k].shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
            for k in _WEIGHT_NAMES
        ]
        acc_shapes = [
            jax.ShapeDtypeStruct(wc[k].shape, jnp.float32)
            for k in _WEIGHT_NAMES
        ]
        outs = pl.pallas_call(
            functools.partial(_train_kernel, tr=tr, slot=slot, num_w=num_w,
                              white_bg=white_bg, scale=scale,
                              num_valid=num_valid, **kern_args),
            grid=(n_tiles,),
            in_specs=_ray_specs(slot, d_pad)
            + [_t_spec(slot, s), row8] + weight_specs(wc),
            out_specs=[loss_spec, row8, _col_spec(tb)] + acc_specs,
            out_shape=[
                jax.ShapeDtypeStruct((1, 8), jnp.float32),
                jax.ShapeDtypeStruct((n_tiles * slot, 8), jnp.float32),
                jax.ShapeDtypeStruct((n, 1), jnp.float32),
            ]
            + acc_shapes,
            cost_estimate=pl.CostEstimate(
                flops=3 * 2 * n * mm_cols,
                bytes_accessed=n * 2 * 4 + (n // s) * 32 * 4,
                transcendentals=n * (16 * h + 8),
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
        )(o8, d8, denc, t2d, target8,
          *(wc[k] for k in _WEIGHT_NAMES))
        loss = outs[0][0, 0]
        ray_out = _unslot_rays(outs[1], tr, slot)
        return loss, ray_out, outs[2], dict(zip(_WEIGHT_NAMES, outs[3:]))

    @jax.custom_vjp
    def fused_train(packed, prep, target8):
        loss, ray_out, w_col, _ = run_train(
            _cast_weights(packed, cdt), prep, target8
        )
        return loss, ray_out, w_col

    def train_fwd(packed, prep, target8):
        loss, ray_out, w_col, dpacked = run_train(
            _cast_weights(packed, cdt), prep, target8
        )
        return (loss, ray_out, w_col), (dpacked, prep, target8)

    def train_bwd(res, g):
        dpacked, prep, target8 = res
        g_loss, _g_rayout, _g_wcol = g
        dp = jax.tree.map(lambda a: a * g_loss, dpacked)
        return (dp, jax.tree.map(jnp.zeros_like, prep),
                jnp.zeros_like(target8))

    fused_train.defvjp(train_fwd, train_bwd)
    return fused_train


class FusedSirenRender:
    """Callable fully fused SIREN render; same contract as FusedNerfRender."""

    def __init__(self, model, near: float, far: float, normalize: bool,
                 tile_points_fwd: int | None = None,
                 tile_points_bwd: int | None = None,
                 interpret: bool = False):
        self.model = model
        self.near, self.far, self.normalize = float(near), float(far), normalize
        self.h = model.hidden_dim
        self.real_d = 3 * (1 + 2 * model.dir_encoding_dim)
        self.d_pad = _round_up(self.real_d, 32)
        self.cdt = jnp.dtype(model.compute_dtype)
        bf16 = self.cdt == jnp.bfloat16
        if tile_points_fwd is None:
            tile_points_fwd = 1536 if bf16 else 1024
        if tile_points_bwd is None:
            tile_points_bwd = 768 if bf16 else 512
        self.tile_points_fwd = tile_points_fwd
        self.tile_points_bwd = tile_points_bwd
        # the single-kernel train pass holds the same activation set but no
        # separate fwd stage; a larger tile amortizes its fixed costs better
        # (swept: 1536 beats 768 by ~1.5% on v5e bf16)
        import os

        self.tile_points_train = int(
            os.environ.get("NERF_TPU_RENDER_TILE_TRAIN", 0)
        ) or (1536 if bf16 else 512)
        self.interpret = interpret
        self.w0s = tuple([model.w0] + [model.hidden_w0] * (model.num_layers - 1))
        self.sigma_mul, self.rgb_mul = model.sigma_mul, model.rgb_mul
        self._cache = {}

        ed, sd, phs_d, msk_d = _enc_consts(model.dir_encoding_dim, 3, self.d_pad)
        # numpy, not device arrays (lowering D2H cost; see fused_render.py)
        self._Ed, self._Sd = np.asarray(ed), np.asarray(sd)
        self._phase_d = np.asarray(phs_d)[None, :]
        self._mask_d = np.asarray(msk_d)[None, :]

    def supported(self) -> bool:
        return (self.h % 128 == 0 and (self.h // 2) % 128 == 0
                and self.model.num_layers == _NUM_BASE)

    def _get(self, s: int):
        if s not in self._cache:
            def pick(tile_points: int) -> int:
                tr = max(1, tile_points // s)
                while (tr * s) % 8:
                    tr += 1
                return tr

            tr_bwd = pick(self.tile_points_bwd)
            tr_fwd = max(tr_bwd, pick(self.tile_points_fwd) // tr_bwd * tr_bwd)
            while (tr_fwd * s) % 8:
                tr_fwd += tr_bwd
            self._cache[s] = (
                _build(self.h, self.d_pad, s, tr_fwd, tr_bwd, self.cdt,
                       self.w0s, self.sigma_mul, self.rgb_mul,
                       self.interpret),
                tr_fwd,
            )
        return self._cache[s]

    def _prep(self, rays_o, rays_d, viewdirs, t):
        if self.normalize:
            a = 2.0 / (self.far - self.near)
            b = -2.0 * self.near / (self.far - self.near) - 1.0
        else:
            a, b = 1.0, 0.0
        o8 = jnp.pad(a * rays_o + b, ((0, 0), (0, 5)))
        d8 = jnp.pad(a * rays_d, ((0, 0), (0, 5)))

        def dot(x, m):
            return jnp.dot(x, m, precision=HIGHEST)

        denc = dot(viewdirs, self._Ed) + self._mask_d * jnp.sin(
            dot(viewdirs, self._Sd) + self._phase_d
        )
        return (o8, d8, denc, t)

    def __call__(self, params, rays_o, rays_d, viewdirs, t):
        num_rays, s = t.shape
        fused, tr_fwd = self._get(s)
        r_pad = _round_up(max(num_rays, tr_fwd), tr_fwd)
        if r_pad != num_rays:
            pad = r_pad - num_rays
            rays_o = jnp.pad(rays_o, ((0, pad), (0, 0)))
            rays_d = jnp.pad(rays_d, ((0, pad), (0, 0)))
            viewdirs = jnp.pad(viewdirs, ((0, pad), (0, 0)))
            t = jnp.pad(t, ((0, pad), (0, 0)))
        prep = self._prep(rays_o, rays_d, viewdirs, t)
        packed = pack_params(params, self.d_pad, self.h)
        ray_out, w_col = fused(packed, prep)
        ray_out = ray_out[:num_rays]
        return {
            "rgb": ray_out[:, :3],
            "acc": ray_out[:, 3],
            "depth": ray_out[:, 4],
            "weights": jax.lax.stop_gradient(
                w_col.reshape(r_pad, s)[:num_rays]
            ),
        }

    def _get_train(self, s: int, white_bg: bool, num_valid: int):
        key = (s, white_bg, num_valid)
        if key not in self._cache:
            def pick(tile_points: int) -> int:
                tr = max(1, tile_points // s)
                while (tr * s) % 8:
                    tr += 1
                return tr

            tr = pick(self.tile_points_train)
            self._cache[key] = (
                _build_train(
                    self.h, self.d_pad, s, tr, self.cdt, self.w0s,
                    self.sigma_mul, self.rgb_mul, white_bg,
                    1.0 / (3.0 * max(num_valid, 1)), num_valid, self.interpret,
                ),
                tr,
            )
        return self._cache[key]

    def train(self, params, rays_o, rays_d, viewdirs, t, target,
              white_bg: bool):
        """Single-kernel train pass; same contract as FusedNerfRender.train."""
        num_rays, s = t.shape
        fused_train, tr = self._get_train(s, white_bg, num_rays)
        r_pad = _round_up(max(num_rays, tr), tr)
        if r_pad != num_rays:
            pad = r_pad - num_rays
            rays_o = jnp.pad(rays_o, ((0, pad), (0, 0)))
            rays_d = jnp.pad(rays_d, ((0, pad), (0, 0)))
            viewdirs = jnp.pad(viewdirs, ((0, pad), (0, 0)))
            t = jnp.pad(t, ((0, pad), (0, 0)))
        target8 = jnp.pad(target, ((0, r_pad - num_rays), (0, 5)))
        prep = self._prep(rays_o, rays_d, viewdirs, t)
        packed = pack_params(params, self.d_pad, self.h)
        loss, ray_out, w_col = fused_train(packed, prep, target8)
        ray_out = jax.lax.stop_gradient(ray_out[:num_rays])
        aux = {
            "rgb": ray_out[:, :3],
            "acc": ray_out[:, 3],
            "weights": jax.lax.stop_gradient(
                w_col.reshape(r_pad, s)[:num_rays]
            ),
        }
        return loss, aux


def make_fused_siren_render(model, near, far, normalize=True,
                            tile_points_fwd: int | None = None,
                            tile_points_bwd: int | None = None,
                            interpret: bool = False):
    """FusedSirenRender for supported SIREN models, else None."""
    fr = FusedSirenRender(model, near, far, normalize,
                          tile_points_fwd=tile_points_fwd,
                          tile_points_bwd=tile_points_bwd,
                          interpret=interpret)
    return fr if fr.supported() else None
