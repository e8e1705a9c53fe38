"""Fused SIREN field evaluation as Pallas TPU kernels.

Same design as `fused_nerf` (see that module's header): encoding + all
matmuls for a tile of points stay in VMEM; backward recomputes per tile and
accumulates weight grads across the sequential grid. Architecture matches
`SirenModel.apply` (reference /root/reference/nerf/models.py:130-203):

  base:   h_l = sin(w0_l * (h_{l-1} @ W_l + b_l)), 8 layers on RAW points
          (w0_1 = 30, hidden w0 = 1; no positional encoding of positions)
  sigma:  relu(h_8 @ w_s + b_s) * sigma_mul            (lane reduction)
  feat:   h_8 @ W_remap + b_remap                      (no activation)
  rgb:    sigmoid((sin(w0_h*(feat@Wf + denc@Wd + b0)) @ W1 + b1) * rgb_mul)
          with denc the L=4 frequency encoding of directions.

SIREN backward needs pre-activations (d sin(w0 z) = w0 cos(w0 z) dz); the
backward kernel keeps all eight (T, h) pre-activations in VMEM per tile.
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
    _fast_sin,
    _matmul_precision,
    _mm,
    _round_up,
    _trig,
)

_NUM_BASE = 8



_WEIGHT_NAMES = tuple(
    n for i in range(1, _NUM_BASE + 1) for n in (f"w{i}", f"b{i}")
) + ("ws", "bs", "wre", "bre", "wr0f", "wr0d", "br0", "wr1", "br1")


def pack_params(params: dict, d_pad: int, h: int) -> dict:
    """SirenModel pytree -> kernel layout (float32; cast happens per call)."""
    out = {}
    for i, lyr in enumerate(params["base"], start=1):
        w = lyr["w"]
        if i == 1:  # (3, h) -> pad contraction dim to 8 sublanes
            w = jnp.pad(w, ((0, 8 - w.shape[0]), (0, 0)))
        out[f"w{i}"] = w
        out[f"b{i}"] = lyr["b"][None, :]
    out["ws"] = params["sigma"]["w"].T            # (1, h)
    out["bs"] = params["sigma"]["b"][None, :]     # (1, 1)
    out["wre"] = params["remap"]["w"]
    out["bre"] = params["remap"]["b"][None, :]
    wr0 = params["rgb0"]["w"]                     # (h + real_d, h//2)
    out["wr0f"] = wr0[:h]
    out["wr0d"] = jnp.pad(wr0[h:], ((0, d_pad - (wr0.shape[0] - h)), (0, 0)))
    out["br0"] = params["rgb0"]["b"][None, :]
    wr1 = params["rgb1"]["w"]                     # (h//2, 3)
    out["wr1"] = jnp.pad(wr1, ((0, 0), (0, 8 - wr1.shape[1])))
    out["br1"] = jnp.pad(params["rgb1"]["b"][None, :], ((0, 0), (0, 5)))
    return out


def _forward_tile(pts8, dirs, w, enc_d, w0s, sigma_mul, rgb_mul, cdt):
    denc = _encode(dirs, *enc_d)
    return _mlp_tile(pts8, denc, w, w0s, sigma_mul, rgb_mul, cdt)


def _mlp_tile(pts8, denc, w, w0s, sigma_mul, rgb_mul, cdt):
    """The SIREN chain on raw (zero-padded) points + pre-encoded dirs;
    shared by the field kernel and the fused render kernel."""
    sin, _ = _trig(cdt)
    zs = []
    x = pts8
    for i, w0 in enumerate(w0s, start=1):
        z = _mm(x, w[f"w{i}"], cdt) + w[f"b{i}"]
        zs.append(z)
        x = sin(w0 * z)
    h8 = x

    sigma_pre = (
        jnp.sum(h8 * w["ws"].astype(jnp.float32), axis=1, keepdims=True) + w["bs"]
    )
    sigma = jax.nn.relu(sigma_pre) * sigma_mul

    feat = _mm(h8, w["wre"], cdt) + w["bre"]
    zr0 = _mm(feat, w["wr0f"], cdt) + _mm(denc, w["wr0d"], cdt) + w["br0"]
    y = sin(w0s[-1] * zr0)  # rgb head SirenLayer uses hidden w0
    rgb8 = jax.nn.sigmoid((_mm(y, w["wr1"], cdt) + w["br1"]) * rgb_mul)
    return dict(denc=denc, zs=zs, h8=h8, sigma_pre=sigma_pre, feat=feat,
                zr0=zr0, y=y, rgb8=rgb8), sigma


def _fwd_kernel(pts_ref, dirs_ref, *refs, w0s, sigma_mul, rgb_mul, cdt):
    enc_refs, w_refs, out_ref = refs[:4], refs[4:-1], refs[-1]
    enc_d = tuple(r[:] for r in enc_refs)
    w = {k: v[:] for k, v in zip(_WEIGHT_NAMES, w_refs)}
    tile = pts_ref.shape[0]
    pts8 = jnp.pad(pts_ref[:], ((0, 0), (0, 5)))
    acts, sigma = _forward_tile(
        pts8, dirs_ref[:], w, enc_d, w0s, sigma_mul, rgb_mul, cdt
    )
    col = jax.lax.broadcasted_iota(jnp.int32, (tile, 8), 1)
    packed = jnp.where(col == 3, sigma, acts["rgb8"])
    out_ref[:] = jnp.where(col > 3, 0.0, packed)


def _bwd_kernel(pts_ref, dirs_ref, g_ref, *refs,
                w0s, sigma_mul, rgb_mul, cdt, num_w):
    enc_refs, refs = refs[:4], refs[4:]
    enc_d = tuple(r[:] for r in enc_refs)
    w_refs = refs[:num_w]
    dpts_ref, ddirs_ref = refs[num_w], refs[num_w + 1]
    acc_refs = dict(zip(_WEIGHT_NAMES, refs[num_w + 2:]))
    w = {k: v[:] for k, v in zip(_WEIGHT_NAMES, w_refs)}

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for r in acc_refs.values():
            r[:] = jnp.zeros_like(r)

    pts, dirs, g = pts_ref[:], dirs_ref[:], g_ref[:]
    pts8 = jnp.pad(pts, ((0, 0), (0, 5)))
    acts, _ = _forward_tile(pts8, dirs, w, enc_d, w0s, sigma_mul, rgb_mul, cdt)

    tile = pts.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (tile, 8), 1)
    g_rgb = jnp.where(col < 3, g, 0.0)
    g_sigma = jnp.sum(jnp.where(col == 3, g, 0.0), axis=1, keepdims=True)

    dh, ddenc = _mlp_bwd_core(
        acts, pts8, w, cdt, g_rgb, g_sigma, acc_refs, w0s, sigma_mul, rgb_mul
    )
    dpts_ref[:] = dh[:, :3]
    ddirs_ref[:] = _encode_bwd(ddenc, dirs, *enc_d)


def _mlp_bwd_core(acts, pts8, w, cdt, g_rgb, g_sigma, acc_refs,
                  w0s, sigma_mul, rgb_mul, want_input_grads=True):
    """Backward of `_mlp_tile`: accumulates weight/bias grads into acc_refs;
    returns (dh w.r.t. pts8, ddenc) — input grads skipped when not wanted
    (still walks the full chain, which every dW needs)."""
    prec = _matmul_precision(cdt)
    sin, cos = _trig(cdt)

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

    rgb8 = acts["rgb8"]
    dzr1 = g_rgb * rgb8 * (1.0 - rgb8) * rgb_mul
    mmT_acc("wr1", acts["y"], dzr1)
    db_acc("br1", dzr1)
    dy = dact(dzr1, "wr1")

    w0h = w0s[-1]
    dzr0 = dy * w0h * cos(w0h * acts["zr0"])
    mmT_acc("wr0f", acts["feat"], dzr0)
    mmT_acc("wr0d", acts["denc"], dzr0)
    db_acc("br0", dzr0)
    dfeat = dact(dzr0, "wr0f")
    ddenc = dact(dzr0, "wr0d") if want_input_grads else None

    dsig = g_sigma * sigma_mul * (acts["sigma_pre"] > 0)
    mmT_acc("wre", acts["h8"], dfeat)
    db_acc("bre", dfeat)
    acc_refs["ws"][:] += jnp.sum(acts["h8"] * dsig, axis=0, keepdims=True)
    acc_refs["bs"][:] += jnp.sum(dsig, axis=0, keepdims=True)
    dh = dact(dfeat, "wre") + dsig * w["ws"].astype(jnp.float32)

    hs = [pts8] + [
        sin(w0 * z) for w0, z in zip(w0s[:-1], acts["zs"][:-1])
    ]  # inputs to layers 1..8
    for i in range(_NUM_BASE, 0, -1):
        w0 = w0s[i - 1]
        dz = dh * w0 * cos(w0 * acts["zs"][i - 1])
        mmT_acc(f"w{i}", hs[i - 1], dz)
        db_acc(f"b{i}", dz)
        if i > 1 or want_input_grads:
            dh = dact(dz, f"w{i}")
    return dh, ddenc


def make_fused_siren_apply(model, tile_fwd: int = 2048, tile_bwd: int = 256,
                           interpret: bool = False):
    """Drop-in `apply(params, points, dirs) -> (rgb, sigma)` for SirenModel,
    or None when unsupported. The backward stashes all eight f32
    pre-activations per tile, so tile_bwd stays small; the forward uses big
    tiles to amortize the fixed per-grid-step cost."""
    h = model.hidden_dim
    if h % 128 != 0 or (h // 2) % 128 != 0 or model.num_layers != _NUM_BASE:
        return None
    if tile_fwd % tile_bwd != 0:
        raise ValueError("tile_bwd must divide tile_fwd")

    real_d = 3 * (1 + 2 * model.dir_encoding_dim)
    d_pad = _round_up(real_d, 32)
    cdt = jnp.dtype(model.compute_dtype)
    w0s = tuple([model.w0] + [model.hidden_w0] * (model.num_layers - 1))
    sigma_mul, rgb_mul = model.sigma_mul, model.rgb_mul

    enc_args = tuple(
        # numpy (not device arrays): lowering embeds numpy closure
        # constants directly; device-array constants cost a D2H fetch
        # per constant per trace (~16 s each on the tunneled TPU)
        np.asarray(a if a.ndim == 2 else a[None, :])
        for a in _enc_consts(model.dir_encoding_dim, 3, d_pad)
    )
    enc_specs = [
        pl.BlockSpec(a.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        for a in enc_args
    ]
    num_w = len(_WEIGHT_NAMES)

    def row_spec(width, tile):
        return pl.BlockSpec((tile, width), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    def weight_specs(wc):
        return [
            pl.BlockSpec(wc[n].shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
            for n in _WEIGHT_NAMES
        ]

    mm_cols = 8 * h + 7 * h * h + h + h * h + (h + d_pad) * (h // 2) \
        + (h // 2) * 8

    def _run_fwd(wc, pts, dirs):
        n = pts.shape[0]
        return pl.pallas_call(
            functools.partial(
                _fwd_kernel, w0s=w0s, sigma_mul=sigma_mul, rgb_mul=rgb_mul,
                cdt=cdt,
            ),
            grid=(n // tile_fwd,),
            in_specs=[row_spec(3, tile_fwd), row_spec(3, tile_fwd)]
            + enc_specs + weight_specs(wc),
            out_specs=row_spec(8, tile_fwd),
            out_shape=jax.ShapeDtypeStruct((n, 8), jnp.float32),
            cost_estimate=pl.CostEstimate(
                flops=2 * n * mm_cols,
                bytes_accessed=n * 14 * 4,
                transcendentals=n * (8 * h + d_pad + 8),
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
        )(pts, dirs, *enc_args, *(wc[k] for k in _WEIGHT_NAMES))

    @jax.custom_vjp
    def fused(packed, pts, dirs):
        return _run_fwd(_cast_weights(packed, cdt), pts, dirs)

    def fused_fwd(packed, pts, dirs):
        wc = _cast_weights(packed, cdt)
        return _run_fwd(wc, pts, dirs), (wc, pts, dirs)

    def fused_bwd(res, g):
        wc, pts, dirs = res
        n = pts.shape[0]
        acc_shapes = [
            jax.ShapeDtypeStruct(wc[k].shape, jnp.float32) for k in _WEIGHT_NAMES
        ]
        acc_specs = [
            pl.BlockSpec(wc[k].shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
            for k in _WEIGHT_NAMES
        ]
        outs = pl.pallas_call(
            functools.partial(
                _bwd_kernel, w0s=w0s, sigma_mul=sigma_mul, rgb_mul=rgb_mul,
                cdt=cdt, num_w=num_w,
            ),
            grid=(n // tile_bwd,),
            in_specs=[row_spec(3, tile_bwd), row_spec(3, tile_bwd),
                      row_spec(8, tile_bwd)]
            + enc_specs + weight_specs(wc),
            out_specs=[row_spec(3, tile_bwd), row_spec(3, tile_bwd)] + acc_specs,
            out_shape=[
                jax.ShapeDtypeStruct((n, 3), jnp.float32),
                jax.ShapeDtypeStruct((n, 3), jnp.float32),
            ]
            + acc_shapes,
            cost_estimate=pl.CostEstimate(
                flops=3 * 2 * n * mm_cols,
                bytes_accessed=n * 20 * 4,
                transcendentals=n * (16 * h + d_pad + 8),
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
        )(pts, dirs, g, *enc_args, *(wc[k] for k in _WEIGHT_NAMES))
        return dict(zip(_WEIGHT_NAMES, outs[2:])), outs[0], outs[1]

    fused.defvjp(fused_fwd, fused_bwd)

    def apply(params, points, dirs):
        packed = pack_params(params, d_pad, h)
        lead = points.shape[:-1]
        pts = points.reshape(-1, 3)
        dd = dirs.reshape(-1, 3)
        n = pts.shape[0]
        n_pad = _round_up(max(n, tile_fwd), tile_fwd)
        if n_pad != n:
            pts = jnp.pad(pts, ((0, n_pad - n), (0, 0)))
            dd = jnp.pad(dd, ((0, n_pad - n), (0, 0)))
        out = fused(packed, pts, dd)[:n]
        rgb = out[:, :3].reshape(*lead, 3)
        sigma = out[:, 3].reshape(lead)
        return rgb, sigma

    return apply
