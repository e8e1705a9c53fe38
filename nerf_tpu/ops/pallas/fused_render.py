"""Fully fused NeRF volumetric rendering as Pallas TPU kernels.

One kernel per pass renders a tile of whole rays end to end IN VMEM:
per-sample positions are never materialized (their positional encoding is
assembled in-kernel from per-ray encodings, see below), the MLP chain runs
on the MXU exactly as in `fused_nerf`, and volume compositing — the
transmittance cumprod, the weighted color/depth/opacity sums of
/root/reference/nerf/rendering.py:110-151 — happens in the same kernel.

Why: with the field-only kernel (`fused_nerf`) the step still materializes
O(rays x samples) arrays in HBM — (N,3) sample positions, (N,3) broadcast
directions, (N,8) field outputs — and every XLA op touching a minor-dim-3
array pads 3 lanes to 128 (a 42x waste measured at ~4 ms/step of "glue" on
v5e). Here HBM traffic per pass is O(rays) + one (N,1) weights column, and
the backward differentiates through compositing analytically, so no dpts/
ddirs outputs and no encode-VJP work at all.

Key construction (positions-from-rays linearity): a sample position is
p = o + t*d, and every encoding column is linear in p:
  enc(p)@E = o@E + t*(d@E)  and  sin(p@S + phase) = sin(o@S + t*(d@S) + phase)
so the kernel receives per-RAY matrices oE,oS,dE,dS (ray count x pad) and
builds per-sample encodings with one broadcast matmul + VPU ops. The
componentwise [near,far]->[-1,1] normalization (rendering.py:67-82) is an
affine map absorbed into oE/oS/dE/dS on the host side.

Layout plumbing validated on v5e Mosaic:
  * column->matrix (N,1)->(rays,S): `jnp.reshape` (supported this direction);
  * matrix->column: one-hot expand matmul at precision=HIGHEST (exact for
    0/1 factors) + lane-mask reduction;
  * exclusive cumprod along the sample axis: Hillis-Steele `pltpu.roll`
    scan over lanes (exact products, log2(S) steps);
  * per-ray reductions (rgb/acc/depth sums): one-hot contraction on the MXU.

Backward-through-compositing (per ray, g_w = dL/dw):
  dL/dsigma_pre_i = (g_w_i * T_i * (1-alpha_i) - suffix_i) * delta_i * [sigma_pre_i > 0]
  with suffix_i = sum_{k>i} g_w_k * w_k — the (1-alpha) singularity of the
  naive cumprod VJP cancels analytically, so the 1e10-delta tail
  (rendering.py:56, alpha=1 exactly) is differentiable without eps guards.

The ``weights`` output is stop-gradient (its cotangent is ignored): the only
consumer is hierarchical inverse-CDF resampling, which the renderer wraps in
stop_gradient anyway. Parameter gradients are exact; ray/t cotangents are
zero (rays and t are data/PRNG, never optimized here).
"""

from __future__ import annotations

import functools

import jax
import numpy as np
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nerf_tpu.ops.pallas.fused_nerf import (
    _WEIGHT_NAMES,
    _cast_weights,
    _enc_consts,
    _mlp_bwd_core,
    _mlp_tile,
    _round_up,
    _weight_specs,
    pack_params,
)

HIGHEST = jax.lax.Precision.HIGHEST


def _onehot_rows(tb: int, tr: int, s: int):
    """(TB, TR) one-hot: row -> its ray index (row // S)."""
    r = jax.lax.broadcasted_iota(jnp.int32, (tb, tr), 1)
    rid = jax.lax.broadcasted_iota(jnp.int32, (tb, tr), 0) // s
    return (r == rid).astype(jnp.float32)


def _rep(per_ray, s: int):
    """Broadcast per-ray rows (TR, F) to per-sample rows (TR*S, F): a VPU
    sublane broadcast + leading-dim collapse (exact, no MXU involved)."""
    tr, f = per_ray.shape
    return jnp.broadcast_to(per_ray[:, None, :], (tr, s, f)).reshape(tr * s, f)


def _per_ray_sum(g8, per_sample, cdt=None):
    """Sum per-sample rows (TB, F) into per-ray rows (TR, F).

    float32 mode: HIGHEST keeps the one-hot contraction f32-exact (the
    default single bf16 pass would round the compositing sums). bfloat16
    mode: a hi/lo split 2-pass — the 0/1 selector is bf16-exact and
    per_sample travels as bf16 hi + bf16 residual (~2^-16 relative error,
    far below the bf16 matmul noise already in its inputs) at 1/3 the
    passes of HIGHEST (measured ~0.05 ms/step, round-5 ablation ledger)."""
    if cdt is not None and jnp.dtype(cdt) == jnp.bfloat16:
        hi = per_sample.astype(jnp.bfloat16)
        lo = (per_sample - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        g8b = g8.astype(jnp.bfloat16)
        dot = lambda b: jax.lax.dot_general(
            g8b, b, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return dot(hi) + dot(lo)
    return jax.lax.dot_general(
        g8, per_sample, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=HIGHEST,
    )


def _seg_pos(tb: int, s: int):
    return jax.lax.broadcasted_iota(jnp.int32, (tb, 1), 0) % s


def _seg_excl_cumprod_col(col, s: int):
    """Per-ray exclusive cumprod of a (TB, 1) column whose rows are S-long
    ray segments: Hillis-Steele sublane roll-scan with segment masking
    (exact products; segments never bleed because shifted-in values are
    replaced by the identity)."""
    tb = col.shape[0]
    pos = _seg_pos(tb, s)
    v = col
    k = 1
    while k < s:
        v = v * jnp.where(pos < k, 1.0, pltpu.roll(v, k, 0))
        k *= 2
    return jnp.where(pos == 0, 1.0, pltpu.roll(v, 1, 0))


def _seg_rev_excl_cumsum_col(col, s: int):
    """suffix[i] = sum over later samples of the same ray, on a (TB, 1)
    segmented column (roll shifts are tb-k == -k; pltpu wants >= 0)."""
    tb = col.shape[0]
    pos = _seg_pos(tb, s)
    v = col
    k = 1
    while k < s:
        v = v + jnp.where(pos >= s - k, 0.0, pltpu.roll(v, tb - k, 0))
        k *= 2
    return jnp.where(pos == s - 1, 0.0, pltpu.roll(v, tb - 1, 0))


def _point_cols_from_t(t_tile, s: int, inf_delta: float = 1e10):
    """(TR, S) ray-major t block -> per-point (TB,1) t and delta columns.

    Feeding t/deltas as (N,1) HBM columns costs XLA a lane->sublane relayout
    (~1.2 ms per 6 MB chunk measured on v5e — 11% of a 400x400 render); the
    in-kernel expand+select is a few VPU ops per element. Deltas are
    t[i+1]-t[i] with the reference's 1e10 tail (rendering.py:54-57) —
    derived from the t COLUMN by one sublane roll (t[i+1] lives one sublane
    down within the segment; the segment tail is masked to the 1e10 value),
    so only t pays the (TR,S)->(TB,1) one-hot select. The second select
    measured ~0.05 ms/step of the round-5 ablation ledger."""
    tr = t_tile.shape[0]
    assert t_tile.shape[1] == s
    tb = tr * s
    srow = jax.lax.broadcasted_iota(jnp.int32, (tb, s), 0) % s
    lane2 = jax.lax.broadcasted_iota(jnp.int32, (tb, s), 1)
    sel = lane2 == srow

    t_col = jnp.sum(jnp.where(sel, _rep(t_tile, s), 0.0), axis=1,
                    keepdims=True)
    pos = _seg_pos(tb, s)
    t_next = pltpu.roll(t_col, tb - 1, 0)          # t[i+1] at row i
    d_col = jnp.where(pos == s - 1, inf_delta, t_next - t_col)
    return t_col, d_col


def _field_tile(oE, oS, dE, dS, denc_r, t, s, w, enc_p_phase, enc_p_mask, cdt):
    """Per-sample encodings from per-ray matrices, then the MLP chain."""
    from nerf_tpu.ops.pallas.fused_nerf import _trig

    sin, _ = _trig(cdt)
    penc_lin = _rep(oE, s) + t * _rep(dE, s)
    penc_arg = _rep(oS, s) + t * _rep(dS, s) + enc_p_phase
    penc = penc_lin + enc_p_mask * sin(penc_arg)
    denc = _rep(denc_r, s)
    return _mlp_tile(penc, denc, w, cdt)


_exp = jnp.exp  # module-level alias so measurement tools can ablate it


def _composite_tile(acts, sigma, t, delta, g8, tb, tr, s, cdt=None):
    """Transmittance + weights + per-ray sums for one tile.

    Returns (ray_out (TR,8): rgb,acc,depth,0..., w_col, T_col, alpha helpers).
    """
    one_m = _exp(-sigma * delta)                # = 1 - alpha, exactly
    alpha = 1.0 - one_m
    T_col = _seg_excl_cumprod_col(one_m, s)
    w_col = T_col * alpha

    col8 = jax.lax.broadcasted_iota(jnp.int32, (tb, 8), 1)
    rgb_part = jnp.where(col8 < 3, acts["rgb8"], 0.0)
    stat = (
        w_col * rgb_part
        + jnp.where(col8 == 3, w_col, 0.0)
        + jnp.where(col8 == 4, w_col * t, 0.0)
    )
    ray_out = _per_ray_sum(g8, stat, cdt)       # (TR, 8)
    return ray_out, w_col, T_col, one_m


def _slot_rays(x, tr: int, slot: int):
    """(n_rays, F) -> (n_tiles*slot, F): each tile's ``tr`` ray rows padded
    into an 8-aligned ``slot`` so BlockSpecs satisfy the (8, 128) tiling rule
    (tiny O(rays) arrays; the pad rows are zeros and sliced off in-kernel)."""
    if slot == tr:
        return x
    n_tiles = x.shape[0] // tr
    f = x.shape[1]
    return jnp.pad(
        x.reshape(n_tiles, tr, f), ((0, 0), (0, slot - tr), (0, 0))
    ).reshape(n_tiles * slot, f)


def _unslot_rays(x, tr: int, slot: int):
    if slot == tr:
        return x
    n_tiles = x.shape[0] // slot
    f = x.shape[1]
    return x.reshape(n_tiles, slot, f)[:, :tr].reshape(n_tiles * tr, f)


def _fwd_kernel(*refs, cdt, s, tr, slot):
    (oE_r, oS_r, dE_r, dS_r, denc_r, t_r), refs = refs[:6], refs[6:]
    (pphase_r, pmask_r), refs = refs[:2], refs[2:]
    w_refs, (out_ref, wcol_ref) = refs[:-2], refs[-2:]
    w = {k: v[:] for k, v in zip(_WEIGHT_NAMES, w_refs)}
    tb = tr * s
    g8 = _onehot_rows(tb, tr, s)
    t, delta = _point_cols_from_t(t_r[:][:tr], s)
    acts, sigma = _field_tile(
        oE_r[:][:tr], oS_r[:][:tr], dE_r[:][:tr], dS_r[:][:tr],
        denc_r[:][:tr], t, s, w, pphase_r[:], pmask_r[:], cdt,
    )
    ray_out, w_col, _, _ = _composite_tile(acts, sigma, t, delta, g8, tb,
                                           tr, s, cdt)
    if slot != tr:
        ray_out = jnp.pad(ray_out, ((0, slot - tr), (0, 0)))
    out_ref[:] = ray_out
    wcol_ref[:] = w_col


def _bwd_kernel(*refs, cdt, s, tr, slot, num_w):
    (oE_r, oS_r, dE_r, dS_r, denc_r, t_r, g_ref), refs = refs[:7], refs[7:]
    (pphase_r, pmask_r), refs = refs[:2], refs[2:]
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
    acts, sigma = _field_tile(
        oE_r[:][:tr], oS_r[:][:tr], dE_r[:][:tr], dS_r[:][:tr],
        denc_r[:][:tr], t, s, w, pphase_r[:], pmask_r[:], cdt,
    )
    _, w_col, T_col, one_m = _composite_tile(
        acts, sigma, t, delta, g8, tb, tr, s, cdt
    )

    g_rgb8, g_sigma = _composite_bwd(
        acts["rgb8"], w_col, T_col, one_m, t, delta, g_ref[:][:tr], s
    )
    _mlp_bwd_core(acts, w, cdt, g_rgb8, g_sigma, acc_refs,
                  want_input_grads=False)


def _composite_bwd(rgb8, w_col, T_col, one_m, t, delta, g_ray, s):
    """Backward through compositing: (TR, 8) per-ray cotangent ->
    (g_rgb8 (TB,8), g_sigma (TB,1)) per-sample cotangents (see module doc
    for the singularity-free dL/dsigma formula)."""
    tb = w_col.shape[0]
    g_rep = _rep(g_ray, s)                            # (TB, 8)
    col8 = jax.lax.broadcasted_iota(jnp.int32, (tb, 8), 1)
    rgb_part = jnp.where(col8 < 3, rgb8, 0.0)
    # dL/dw[row] = sum_c g_rgb[c]*rgb[c] + g_acc + g_depth * t
    g_w = (
        jnp.sum(jnp.where(col8 < 3, g_rep, 0.0) * rgb_part, axis=1, keepdims=True)
        + jnp.sum(jnp.where(col8 == 3, g_rep, 0.0), axis=1, keepdims=True)
        + jnp.sum(jnp.where(col8 == 4, g_rep, 0.0), axis=1, keepdims=True) * t
    )
    # dL/drgb[row,c] = w[row] * g_rgb[ray,c]  (packed, cols >= 3 zeroed)
    g_rgb8 = jnp.where(col8 < 3, g_rep, 0.0) * w_col

    gww = g_w * w_col                                  # g_w * T * alpha
    suffix = _seg_rev_excl_cumsum_col(gww, s)
    g_sigma = (g_w * T_col * one_m - suffix) * delta   # d/d(relu'd sigma)
    return g_rgb8, g_sigma


def _mse_cotangent(ray_out, target8, tr, slot, tile_idx, num_valid,
                   white_bg, scale):
    """In-kernel MSE head: white-background compose, per-tile loss partial,
    and the analytic per-ray cotangent [g_rgb, g_acc, 0...] — what lets one
    kernel do forward AND backward without a recompute (the loss cotangent
    is a closed form of (render, target))."""
    col8 = jax.lax.broadcasted_iota(jnp.int32, (tr, 8), 1)
    ridx = tile_idx * tr + jax.lax.broadcasted_iota(jnp.int32, (tr, 8), 0)
    valid = ridx < num_valid
    acc_col = jnp.sum(jnp.where(col8 == 3, ray_out, 0.0), axis=1,
                      keepdims=True)
    rgbw = ray_out + (white_bg * (1.0 - acc_col) if white_bg else 0.0)
    err8 = jnp.where((col8 < 3) & valid, rgbw - target8, 0.0)
    loss_tile = scale * jnp.sum(err8 * err8)
    g_rgbw = (2.0 * scale) * err8                      # cols >= 3 already 0
    g_sum = jnp.sum(g_rgbw, axis=1, keepdims=True)
    g_ray = g_rgbw + jnp.where(col8 == 3, -white_bg * g_sum, 0.0)
    return loss_tile, g_ray


def _train_kernel(*refs, cdt, s, tr, slot, num_w, white_bg, scale, num_valid):
    """One pass over a ray tile: forward + MSE loss + full backward, with
    every activation staying in VMEM (no recompute — the backward-kernel
    route pays the forward twice)."""
    (oE_r, oS_r, dE_r, dS_r, denc_r, t_r, tgt_r), refs = refs[:7], refs[7:]
    (pphase_r, pmask_r), refs = refs[:2], refs[2:]
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
    acts, sigma = _field_tile(
        oE_r[:][:tr], oS_r[:][:tr], dE_r[:][:tr], dS_r[:][:tr],
        denc_r[:][:tr], t, s, w, pphase_r[:], pmask_r[:], cdt,
    )
    ray_out, w_col, T_col, one_m = _composite_tile(
        acts, sigma, t, delta, g8, tb, tr, s, cdt
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
    _mlp_bwd_core(acts, w, cdt, g_rgb8, g_sigma, acc_refs,
                  want_input_grads=False)

    if slot != tr:
        ray_out = jnp.pad(ray_out, ((0, slot - tr), (0, 0)))
    out_ref[:] = ray_out
    wcol_ref[:] = w_col


def _ray_specs(slot: int, p_pad: int, d_pad: int):
    def spec(width):
        return pl.BlockSpec((slot, width), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    return [spec(p_pad), spec(p_pad), spec(p_pad), spec(p_pad), spec(d_pad)]


def _col_spec(tb: int):
    return pl.BlockSpec((tb, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)


def _t_spec(slot: int, s: int):
    """Ray-major (slot, S) sample-grid block (t input of every kernel)."""
    return pl.BlockSpec((slot, s), lambda i: (i, 0), memory_space=pltpu.VMEM)


def _build_fused_render(h, p_pad, d_pad, s, tr_fwd, tr_bwd, cdt, interpret):
    num_w = len(_WEIGHT_NAMES)
    slot_fwd = _round_up(tr_fwd, 8)
    slot_bwd = _round_up(tr_bwd, 8)

    mm_cols = (p_pad * h + 4 * h * h) + ((h + p_pad) * h + 3 * h * h) \
        + (h * h + h) + ((h + d_pad) * (h // 2) + (h // 2) * 8)

    def run_fwd(wc, prep, pphase, pmask):
        oE, oS, dE, dS, denc, t2d = prep
        n = t2d.shape[0] * s
        tb = tr_fwd * s
        grid = (n // tb,)
        n_tiles = n // tb
        oE, oS, dE, dS, denc, t2d = (
            _slot_rays(x, tr_fwd, slot_fwd)
            for x in (oE, oS, dE, dS, denc, t2d)
        )
        enc_specs = [
            pl.BlockSpec(a.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
            for a in (pphase, pmask)
        ]
        out_spec = pl.BlockSpec((slot_fwd, 8), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
        ray_out, w_col = pl.pallas_call(
            functools.partial(_fwd_kernel, cdt=cdt, s=s, tr=tr_fwd,
                              slot=slot_fwd),
            grid=grid,
            in_specs=_ray_specs(slot_fwd, p_pad, d_pad)
            + [_t_spec(slot_fwd, s)]
            + enc_specs + _weight_specs(wc),
            out_specs=[out_spec, _col_spec(tb)],
            out_shape=[
                jax.ShapeDtypeStruct((n_tiles * slot_fwd, 8), jnp.float32),
                jax.ShapeDtypeStruct((n, 1), jnp.float32),
            ],
            cost_estimate=pl.CostEstimate(
                flops=2 * n * mm_cols,
                bytes_accessed=n * 2 * 4 + (n // s) * (8 + 5 * p_pad) * 4,
                transcendentals=n * (p_pad + 8 + 1),
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
        )(oE, oS, dE, dS, denc, t2d, pphase, pmask,
          *(wc[k] for k in _WEIGHT_NAMES))
        return _unslot_rays(ray_out, tr_fwd, slot_fwd), w_col

    def run_bwd(wc, prep, pphase, pmask, g_ray):
        oE, oS, dE, dS, denc, t2d = prep
        n = t2d.shape[0] * s
        tb = tr_bwd * s
        grid = (n // tb,)
        oE, oS, dE, dS, denc, t2d = (
            _slot_rays(x, tr_bwd, slot_bwd)
            for x in (oE, oS, dE, dS, denc, t2d)
        )
        g_ray = _slot_rays(g_ray, tr_bwd, slot_bwd)
        enc_specs = [
            pl.BlockSpec(a.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
            for a in (pphase, pmask)
        ]
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
            functools.partial(_bwd_kernel, cdt=cdt, s=s, tr=tr_bwd,
                              slot=slot_bwd, num_w=num_w),
            grid=grid,
            in_specs=_ray_specs(slot_bwd, p_pad, d_pad)
            + [_t_spec(slot_bwd, s), g_spec]
            + enc_specs + _weight_specs(wc),
            out_specs=acc_specs,
            out_shape=acc_shapes,
            cost_estimate=pl.CostEstimate(
                flops=3 * 2 * n * mm_cols,
                bytes_accessed=n * 2 * 4 + (n // s) * (8 + 5 * p_pad) * 4,
                transcendentals=n * (p_pad + 8 + 1),
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
        )(oE, oS, dE, dS, denc, t2d, g_ray, pphase, pmask,
          *(wc[k] for k in _WEIGHT_NAMES))
        return dict(zip(_WEIGHT_NAMES, outs))

    @jax.custom_vjp
    def fused(packed, prep, pphase, pmask):
        return run_fwd(_cast_weights(packed, cdt), prep, pphase, pmask)

    def fused_fwd(packed, prep, pphase, pmask):
        wc = _cast_weights(packed, cdt)
        out = run_fwd(wc, prep, pphase, pmask)
        return out, (wc, prep, pphase, pmask)

    def fused_bwd(res, g):
        wc, prep, pphase, pmask = res
        g_ray, _g_wcol = g  # weights output is stop-gradient (see module doc)
        dpacked = run_bwd(wc, prep, pphase, pmask, g_ray)
        zprep = jax.tree.map(jnp.zeros_like, prep)
        return dpacked, zprep, jnp.zeros_like(pphase), jnp.zeros_like(pmask)

    fused.defvjp(fused_fwd, fused_bwd)
    return fused


def _build_fused_train(h, p_pad, d_pad, s, tr, cdt, white_bg, scale,
                       num_valid, interpret):
    """Single-kernel train pass: forward + MSE + backward per ray tile.

    Compared to fused(fwd kernel) + custom-VJP bwd kernel this removes the
    backward's forward recompute (4x -> 3x forward matmul FLOPs per step):
    the loss cotangent is analytic given the target, so nothing forces the
    fwd/bwd split that reverse-mode autodiff otherwise imposes. Exposed as
    a scalar-loss custom_vjp: the kernel accumulates dL/dpacked alongside
    the loss; the VJP just scales the stored grads by the loss cotangent.
    """
    num_w = len(_WEIGHT_NAMES)
    slot = _round_up(tr, 8)

    mm_cols = (p_pad * h + 4 * h * h) + ((h + p_pad) * h + 3 * h * h) \
        + (h * h + h) + ((h + d_pad) * (h // 2) + (h // 2) * 8)

    def run_train(wc, prep, target8, pphase, pmask):
        oE, oS, dE, dS, denc, t2d = prep
        n = t2d.shape[0] * s
        tb = tr * s
        n_tiles = n // tb
        oE, oS, dE, dS, denc, t2d, target8 = (
            _slot_rays(x, tr, slot)
            for x in (oE, oS, dE, dS, denc, t2d, target8)
        )
        enc_specs = [
            pl.BlockSpec(a.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
            for a in (pphase, pmask)
        ]
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
            functools.partial(_train_kernel, cdt=cdt, s=s, tr=tr, slot=slot,
                              num_w=num_w, white_bg=white_bg, scale=scale,
                              num_valid=num_valid),
            grid=(n_tiles,),
            in_specs=_ray_specs(slot, p_pad, d_pad)
            + [_t_spec(slot, s), row8]
            + enc_specs + _weight_specs(wc),
            out_specs=[loss_spec, row8, _col_spec(tb)] + acc_specs,
            out_shape=[
                jax.ShapeDtypeStruct((1, 8), jnp.float32),
                jax.ShapeDtypeStruct((n_tiles * slot, 8), jnp.float32),
                jax.ShapeDtypeStruct((n, 1), jnp.float32),
            ]
            + acc_shapes,
            cost_estimate=pl.CostEstimate(
                flops=3 * 2 * n * mm_cols,
                bytes_accessed=n * 2 * 4 + (n // s) * (16 + 5 * p_pad) * 4,
                transcendentals=n * (p_pad + 8 + 1),
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
        )(oE, oS, dE, dS, denc, t2d, target8, pphase, pmask,
          *(wc[k] for k in _WEIGHT_NAMES))
        loss = outs[0][0, 0]
        ray_out = _unslot_rays(outs[1], tr, slot)
        w_col = outs[2]
        dpacked = dict(zip(_WEIGHT_NAMES, outs[3:]))
        return loss, ray_out, w_col, dpacked

    @jax.custom_vjp
    def fused_train(packed, prep, target8, pphase, pmask):
        loss, ray_out, w_col, _ = run_train(
            _cast_weights(packed, cdt), prep, target8, pphase, pmask
        )
        return loss, ray_out, w_col

    def train_fwd(packed, prep, target8, pphase, pmask):
        loss, ray_out, w_col, dpacked = run_train(
            _cast_weights(packed, cdt), prep, target8, pphase, pmask
        )
        return (loss, ray_out, w_col), (dpacked, prep, target8, pphase, pmask)

    def train_bwd(res, g):
        dpacked, prep, target8, pphase, pmask = res
        g_loss, _g_rayout, _g_wcol = g  # ray_out/weights are stop-gradient
        dp = jax.tree.map(lambda a: a * g_loss, dpacked)
        return (dp, jax.tree.map(jnp.zeros_like, prep),
                jnp.zeros_like(target8), jnp.zeros_like(pphase),
                jnp.zeros_like(pmask))

    fused_train.defvjp(train_fwd, train_bwd)
    return fused_train


class FusedNerfRender:
    """Callable: fully fused render of a (rays, samples) batch.

    ``__call__(params, rays_o, rays_d, viewdirs, t)`` returns a dict with
    ``rgb (R,3)``, ``acc (R,)``, ``depth (R,)``, ``weights (R,S)`` (weights
    are stop-gradient). ``t`` is (R, S); deltas (t[i+1]-t[i] with the 1e10
    tail) are derived in-kernel. White background and disparity are left to
    the caller (cheap (R,) ops).
    """

    def __init__(self, model, near: float, far: float, normalize: bool,
                 tile_points_fwd: int | None = None,
                 tile_points_bwd: int | None = None,
                 interpret: bool = False):
        self.model = model
        self.near, self.far, self.normalize = float(near), float(far), normalize
        self.h = model.hidden_dim
        self.real_p = 3 * (1 + 2 * model.pos_encoding_dim)
        self.real_d = 3 * (1 + 2 * model.dir_encoding_dim)
        self.p_pad = _round_up(self.real_p, 64)
        self.d_pad = _round_up(self.real_d, 32)
        self.cdt = jnp.dtype(model.compute_dtype)
        # Tile defaults swept on v5e (tools/sweep_render_tiles.py): the bwd
        # stashes all f32 activations per tile, so its tile is the VMEM
        # high-water mark — 768 points fits alongside the gradient
        # accumulators with bf16 matmul copies, 512 with float32 ones.
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
        self._cache = {}

        ep, sp, phs_p, msk_p = _enc_consts(model.pos_encoding_dim, 3, self.p_pad)
        ed, sd, phs_d, msk_d = _enc_consts(model.dir_encoding_dim, 3, self.d_pad)
        # numpy, not device arrays: these become closure constants of every
        # traced program using the kernel, and device-array constants cost
        # a D2H fetch each at lowering (~16 s/constant on the tunneled TPU)
        self._Ep, self._Sp = np.asarray(ep), np.asarray(sp)
        self._Ed, self._Sd = np.asarray(ed), np.asarray(sd)
        self._phase_p = np.asarray(phs_p)[None, :]
        self._mask_p = np.asarray(msk_p)[None, :]
        self._phase_d = np.asarray(phs_d)[None, :]
        self._mask_d = np.asarray(msk_d)[None, :]

    def supported(self) -> bool:
        return self.h % 128 == 0 and (self.h // 2) % 128 == 0

    def _get(self, s: int):
        if s not in self._cache:
            def pick(tile_points: int) -> int:
                tr = max(1, tile_points // s)
                while (tr * s) % 8:  # column blocks (tr*s, 1) need 8|sublanes
                    tr += 1
                return tr

            tr_bwd = pick(self.tile_points_bwd)
            # rays are padded to a tr_fwd multiple; the bwd grid needs that
            # same count divisible by tr_bwd, so tr_fwd is a tr_bwd multiple.
            tr_fwd = max(tr_bwd, pick(self.tile_points_fwd) // tr_bwd * tr_bwd)
            while (tr_fwd * s) % 8:
                tr_fwd += tr_bwd
            self._cache[s] = (
                _build_fused_render(
                    self.h, self.p_pad, self.d_pad, s, tr_fwd, tr_bwd,
                    self.cdt, self.interpret,
                ),
                tr_fwd,
            )
        return self._cache[s]

    def _prep(self, rays_o, rays_d, viewdirs, t):
        """Per-ray encode matrices (all O(rays) work); ``t`` passes through
        ray-major — per-point columns and deltas are derived in-kernel."""
        if self.normalize:
            a = 2.0 / (self.far - self.near)
            b = -2.0 * self.near / (self.far - self.near) - 1.0
        else:
            a, b = 1.0, 0.0
        o_aff = a * rays_o + b
        d_aff = a * rays_d

        def dot(x, m):
            return jnp.dot(x, m, precision=HIGHEST)

        oE, oS = dot(o_aff, self._Ep), dot(o_aff, self._Sp)
        dE, dS = dot(d_aff, self._Ep), dot(d_aff, self._Sp)
        denc = dot(viewdirs, self._Ed) + self._mask_d * jnp.sin(
            dot(viewdirs, self._Sd) + self._phase_d
        )
        return (oE, oS, dE, dS, denc, t)

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
        packed = pack_params(params, self.p_pad, self.d_pad)
        ray_out, w_col = fused(packed, prep, self._phase_p, self._mask_p)
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
            scale = 1.0 / (3.0 * max(num_valid, 1))
            self._cache[key] = (
                _build_fused_train(
                    self.h, self.p_pad, self.d_pad, s, tr, self.cdt,
                    white_bg, scale, num_valid, self.interpret,
                ),
                tr,
            )
        return self._cache[key]

    def train(self, params, rays_o, rays_d, viewdirs, t, target,
              white_bg: bool):
        """One fused train pass: returns (mse_loss, aux) where aux carries
        ``rgb``/``acc``/``weights`` as stop-gradient byproducts.

        The loss is exactly ``mean((compose(render, white_bg) - target)**2)``
        over the real rays and differentiable w.r.t. ``params`` (via the
        in-kernel analytic cotangent) — the single-kernel fwd+bwd saves the
        backward's forward recompute that the __call__ + autodiff route pays.
        """
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
        packed = pack_params(params, self.p_pad, self.d_pad)
        loss, ray_out, w_col = fused_train(
            packed, prep, target8, self._phase_p, self._mask_p
        )
        ray_out = jax.lax.stop_gradient(ray_out[:num_rays])
        aux = {
            "rgb": ray_out[:, :3],
            "acc": ray_out[:, 3],
            "weights": jax.lax.stop_gradient(
                w_col.reshape(r_pad, s)[:num_rays]
            ),
        }
        return loss, aux


def make_fused_nerf_render(model, near, far, normalize=True,
                           tile_points_fwd: int | None = None,
                           tile_points_bwd: int | None = None,
                           interpret: bool = False):
    """FusedNerfRender for supported NeRF models, else None."""
    fr = FusedNerfRender(model, near, far, normalize,
                         tile_points_fwd=tile_points_fwd,
                         tile_points_bwd=tile_points_bwd,
                         interpret=interpret)
    return fr if fr.supported() else None
