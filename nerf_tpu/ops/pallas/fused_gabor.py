"""Fused GaborNet field evaluation as Pallas TPU kernels (tier-1).

Completes the kernel ladder for the Gabor family: the fully fused render/
train kernels (`fused_render_gabor.py`, tiers 2-3) evaluate filters from
per-RAY linearized coefficients; this field kernel evaluates them directly
from raw POINTS — the drop-in `apply(params, points, dirs)` tier that
`resolve_apply_fn` falls back to when the whole-ray kernels cannot engage
(e.g. non-render call sites or a tier-2 compile failure).

Per point tile, entirely in VMEM:
    g_i(x) = sin(x @ omega_i + phi_i) * exp(-gamma_i/2 * ||x - mu_i||^2)
    z_1 = g_1;  z_{i+1} = (z_i @ W_i + b_i) * g_{i+1}
    heads: relu-rgb + sigma lane-reduction (models/gabor.py:110-128 math).
||x - mu||^2 expands to ||x||^2 - 2 x.mu + ||mu||^2 so each filter bank
costs two (T, 8) x (8, h) matmuls; ||mu||^2 is packed OUTSIDE the kernel
with jnp ops, so its cotangent flows back onto mu through autodiff.

The backward kernel recomputes the tile forward and accumulates gradients
for every parameter INCLUDING the filter banks (d omega = x^T d sinarg,
d mu via the expansion, d gamma / d phi as column sums) across the
sequential grid — the same recompute-and-accumulate design as
`fused_siren.py`, which shares this module's structure.

Numerics match `GaborModel.apply`; parity pinned in
tests/test_pallas_kernels.py.
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
    _encode,
    _encode_bwd,
    _matmul_precision,
    _mm,
    _round_up,
    _trig,
)
from nerf_tpu.ops.pallas.fused_render_gabor import _mlp_tile, _weight_names


def _filter_names(n: int) -> tuple:
    return tuple(
        f"{kind}{j}" for j in range(n)
        for kind in ("om", "ph", "muT", "m2", "gam")
    )


def pack_params(params: dict, d_pad: int, h: int, n: int) -> dict:
    """GaborModel pytree -> kernel layout (float32; differentiable jnp ops
    so autodiff maps kernel gradients back, incl. d m2 -> d mu). The
    linear/head layout is shared with the tier-2/3 render kernels — reuse
    their pack so _mlp_tile always reads one layout — plus the raw filter
    banks this field kernel evaluates in-kernel."""
    from nerf_tpu.ops.pallas.fused_render_gabor import (
        pack_params as pack_mlp,
    )

    out = pack_mlp(params, d_pad, h)
    pad8 = lambda a: jnp.pad(a, ((0, 5), (0, 0)))  # 3 rows -> 8 sublanes
    for j, f in enumerate(params["filters"]):
        out[f"om{j}"] = pad8(f["omega"])                    # (8, h)
        out[f"ph{j}"] = f["phi"][None, :]
        out[f"muT{j}"] = pad8(f["mu"].T)                    # (8, h)
        out[f"m2{j}"] = jnp.sum(f["mu"] ** 2, axis=-1)[None, :]
        out[f"gam{j}"] = f["gamma"][None, :]
    return out


def _filters_from_points(pts8, w, n, cdt):
    """Per-point filter values g_i plus backward residuals."""
    sin, _ = _trig(cdt)
    x2 = jnp.sum(pts8 * pts8, axis=1, keepdims=True)        # (T, 1)
    gs, sinargs, Es, qs = [], [], [], []
    for j in range(n):
        sinarg = _mm(pts8, w[f"om{j}"], cdt) + w[f"ph{j}"]
        xm = _mm(pts8, w[f"muT{j}"], cdt)
        q = x2 - 2.0 * xm + w[f"m2{j}"]
        E = jnp.exp(-0.5 * w[f"gam{j}"] * q)
        gs.append(sin(sinarg) * E)
        sinargs.append(sinarg)
        Es.append(E)
        qs.append(q)
    return gs, sinargs, Es, qs


def _fwd_kernel(pts_ref, dirs_ref, *refs, n, names, sigma_mul, rgb_mul, cdt):
    enc_refs, w_refs, out_ref = refs[:4], refs[4:-1], refs[-1]
    enc_d = tuple(r[:] for r in enc_refs)
    w = {k: v[:] for k, v in zip(names, w_refs)}
    tile = pts_ref.shape[0]
    pts8 = jnp.pad(pts_ref[:], ((0, 0), (0, 5)))
    gs, _, _, _ = _filters_from_points(pts8, w, n, cdt)
    denc = _encode(jnp.pad(dirs_ref[:], ((0, 0), (0, 5))), *enc_d)
    acts, sigma = _mlp_tile(gs, denc, w, n, sigma_mul, rgb_mul, cdt)
    col = jax.lax.broadcasted_iota(jnp.int32, (tile, 8), 1)
    packed = jnp.where(col == 3, sigma, acts["rgb8"])
    out_ref[:] = jnp.where(col > 3, 0.0, packed)


def _bwd_kernel(pts_ref, dirs_ref, g_ref, *refs,
                n, names, num_w, sigma_mul, rgb_mul, cdt):
    enc_refs, refs = refs[:4], refs[4:]
    enc_d = tuple(r[:] for r in enc_refs)
    w_refs = refs[:num_w]
    dpts_ref, ddirs_ref = refs[num_w], refs[num_w + 1]
    acc_refs = dict(zip(names, refs[num_w + 2:]))
    w = {k: v[:] for k, v in zip(names, w_refs)}
    prec = _matmul_precision(cdt)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for r in acc_refs.values():
            r[:] = jnp.zeros_like(r)

    pts8 = jnp.pad(pts_ref[:], ((0, 0), (0, 5)))
    g = g_ref[:]
    gs, sinargs, Es, qs = _filters_from_points(pts8, w, n, cdt)
    denc = _encode(jnp.pad(dirs_ref[:], ((0, 0), (0, 5))), *enc_d)
    acts, _ = _mlp_tile(gs, denc, w, n, sigma_mul, rgb_mul, cdt)

    tile = pts8.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (tile, 8), 1)
    g_rgb = jnp.where(col < 3, g, 0.0)
    g_sigma = jnp.sum(jnp.where(col == 3, g, 0.0), axis=1, keepdims=True)

    def mmT_acc(name, a, dz):
        acc_refs[name][:] += jax.lax.dot_general(
            a.astype(cdt), dz.astype(cdt),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )

    def db_acc(name, dz):
        acc_refs[name][:] += jnp.sum(dz, axis=0, keepdims=True)

    def dact(dz, wname):
        return jax.lax.dot_general(
            dz.astype(cdt), w[wname],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )

    # --- heads backward (identical chain to the train kernel,
    #     fused_render_gabor.py:253-269) ---
    rgb8 = acts["rgb8"]
    dzr1 = g_rgb * rgb8 * (1.0 - rgb8) * rgb_mul
    mmT_acc("wr1", acts["y"], dzr1)
    db_acc("br1", dzr1)
    dzr0 = dact(dzr1, "wr1") * (acts["zr0"] > 0)
    mmT_acc("wr0f", acts["feat"], dzr0)
    mmT_acc("wr0d", acts["denc"], dzr0)
    db_acc("br0", dzr0)
    dfeat = dact(dzr0, "wr0f")

    dsig = g_sigma * sigma_mul * (acts["sigma_pre"] > 0)
    mmT_acc("wre", acts["zs"][-1], dfeat)
    db_acc("bre", dfeat)
    acc_refs["ws"][:] += jnp.sum(acts["zs"][-1] * dsig, axis=0, keepdims=True)
    acc_refs["bs"][:] += jnp.sum(dsig, axis=0, keepdims=True)
    dz = dact(dfeat, "wre") + dsig * w["ws"].astype(jnp.float32)
    ddenc = dact(dzr0, "wr0d")
    ddirs_ref[:] = _encode_bwd(
        ddenc, jnp.pad(dirs_ref[:], ((0, 0), (0, 5))), *enc_d
    )[:, :3]

    # --- multiplicative chain backward ---
    dgs = [None] * n
    for i in range(n - 1, 0, -1):
        du = dz * gs[i]
        dgs[i] = dz * acts["us"][i - 1]
        mmT_acc(f"w{i}", acts["zs"][i - 1], du)
        db_acc(f"b{i}", du)
        dz = dact(du, f"w{i}")
    dgs[0] = dz

    # --- filter-bank gradients (the tier-2 kernels emit per-ray cotangents
    #     instead; here the params are reached directly) + d points ---
    sin, cos = _trig(cdt)
    dpts = jnp.zeros_like(pts8)
    for j in range(n):
        dE = dgs[j] * sin(sinargs[j])
        dsinarg = dgs[j] * cos(sinargs[j]) * Es[j]
        da = dE * Es[j]                               # d wrt -0.5*gam*q
        dq = da * (-0.5 * w[f"gam{j}"].astype(jnp.float32))
        mmT_acc(f"om{j}", pts8, dsinarg)
        db_acc(f"ph{j}", dsinarg)
        mmT_acc(f"muT{j}", pts8, -2.0 * dq)
        db_acc(f"m2{j}", dq)
        acc_refs[f"gam{j}"][:] += jnp.sum(da * (-0.5 * qs[j]),
                                          axis=0, keepdims=True)
        # d x: sinarg term + q = ||x||^2 - 2 x.mu + ||mu||^2 terms
        dpts = dpts + dact(dsinarg, f"om{j}") \
            + 2.0 * pts8 * jnp.sum(dq, axis=1, keepdims=True) \
            - 2.0 * dact(dq, f"muT{j}")
    dpts_ref[:] = dpts[:, :3]


def make_fused_gabor_apply(model, tile_fwd: int = 1024, tile_bwd: int = 256,
                           interpret: bool = False):
    """Drop-in ``apply(params, points, dirs) -> (rgb, sigma)`` for
    GaborModel, or None when unsupported."""
    h = model.hidden_dim
    n = model.num_layers
    if h % 128 != 0 or (h // 2) % 128 != 0:
        return None
    if tile_fwd % tile_bwd != 0:
        raise ValueError("tile_bwd must divide tile_fwd")

    real_d = 3 * (1 + 2 * model.dir_encoding_dim)
    d_pad = _round_up(real_d, 32)
    cdt = jnp.dtype(model.compute_dtype)
    sigma_mul, rgb_mul = model.sigma_mul, model.rgb_mul
    names = _weight_names(n) + _filter_names(n)
    num_w = len(names)

    enc_args = tuple(
        # numpy (not device arrays): device-array closure constants cost a
        # D2H fetch per constant at every lowering (~16 s on the tunnel)
        np.asarray(np.pad(a, ((0, 5), (0, 0))) if a.ndim == 2 else a[None, :])
        for a in _enc_consts(model.dir_encoding_dim, 3, d_pad)
    )
    enc_specs = [
        pl.BlockSpec(a.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        for a in enc_args
    ]

    def row_spec(width, tile):
        return pl.BlockSpec((tile, width), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    def weight_specs(wc):
        return [
            pl.BlockSpec(wc[k].shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
            for k in names
        ]

    mm_cols = 2 * n * 8 * h + (n - 1) * h * h + h + h * h \
        + (h + d_pad) * (h // 2) + (h // 2) * 8
    comp = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)

    def _run_fwd(wc, pts, dirs):
        m = pts.shape[0]
        return pl.pallas_call(
            functools.partial(
                _fwd_kernel, n=n, names=names, sigma_mul=sigma_mul,
                rgb_mul=rgb_mul, cdt=cdt,
            ),
            grid=(m // tile_fwd,),
            in_specs=[row_spec(3, tile_fwd), row_spec(3, tile_fwd)]
            + enc_specs + weight_specs(wc),
            out_specs=row_spec(8, tile_fwd),
            out_shape=jax.ShapeDtypeStruct((m, 8), jnp.float32),
            cost_estimate=pl.CostEstimate(
                flops=2 * m * mm_cols,
                bytes_accessed=m * 14 * 4,
                transcendentals=m * (2 * n * h + d_pad),
            ),
            compiler_params=comp,
            interpret=interpret,
        )(pts, dirs, *enc_args, *(wc[k] for k in names))

    @jax.custom_vjp
    def fused(packed, pts, dirs):
        return _run_fwd(_cast_weights(packed, cdt), pts, dirs)

    def fused_fwd(packed, pts, dirs):
        wc = _cast_weights(packed, cdt)
        return _run_fwd(wc, pts, dirs), (wc, pts, dirs)

    def fused_bwd(res, g):
        wc, pts, dirs = res
        m = pts.shape[0]
        acc_shapes = [
            jax.ShapeDtypeStruct(wc[k].shape, jnp.float32) for k in names
        ]
        acc_specs = [
            pl.BlockSpec(wc[k].shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
            for k in names
        ]
        outs = pl.pallas_call(
            functools.partial(
                _bwd_kernel, n=n, names=names, num_w=num_w,
                sigma_mul=sigma_mul, rgb_mul=rgb_mul, cdt=cdt,
            ),
            grid=(m // tile_bwd,),
            in_specs=[row_spec(3, tile_bwd), row_spec(3, tile_bwd),
                      row_spec(8, tile_bwd)]
            + enc_specs + weight_specs(wc),
            out_specs=[row_spec(3, tile_bwd), row_spec(3, tile_bwd)]
            + acc_specs,
            out_shape=[
                jax.ShapeDtypeStruct((m, 3), jnp.float32),
                jax.ShapeDtypeStruct((m, 3), jnp.float32),
            ] + acc_shapes,
            cost_estimate=pl.CostEstimate(
                flops=3 * 2 * m * mm_cols,
                bytes_accessed=m * 20 * 4,
                transcendentals=m * (4 * n * h + d_pad),
            ),
            compiler_params=comp,
            interpret=interpret,
        )(pts, dirs, g, *enc_args, *(wc[k] for k in names))
        return dict(zip(names, outs[2:])), outs[0], outs[1]

    fused.defvjp(fused_fwd, fused_bwd)

    def apply(params, points, dirs):
        packed = pack_params(params, d_pad, h, n)
        lead = points.shape[:-1]
        pts = points.reshape(-1, 3)
        dd = dirs.reshape(-1, 3)
        m = pts.shape[0]
        m_pad = _round_up(max(m, tile_fwd), tile_fwd)
        if m_pad != m:
            pts = jnp.pad(pts, ((0, m_pad - m), (0, 0)))
            dd = jnp.pad(dd, ((0, m_pad - m), (0, 0)))
        out = fused(packed, pts, dd)[:m]
        rgb = out[:, :3].reshape(*lead, 3)
        sigma = out[:, 3].reshape(lead)
        return rgb, sigma

    return apply
