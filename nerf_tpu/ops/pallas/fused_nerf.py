"""Fused NeRF field evaluation as Pallas TPU kernels.

One kernel evaluates positional encoding -> block1 (5 matmuls) -> skip
block2 (4 matmuls + split 257-wide head) -> view-dependent rgb head
(2 matmuls) for a tile of points ENTIRELY IN VMEM: the pure-JAX path
round-trips every (N, 256) activation through HBM (~5 GB per reference-shape
step), while here only the (N, 3) inputs and an (N, 8) packed output touch
HBM. The backward pass is a second kernel (custom VJP) that recomputes the
forward per tile (FLOPs are cheaper than HBM for this shape) and accumulates
all weight/bias gradients in VMEM across the sequential TPU grid.

Layout decisions (see /opt/skills/guides/pallas_guide.md):
  * encoded features are padded to lane-friendly widths (63 -> 64, 27 -> 32)
    with zero rows in the consuming weights, so padding never changes math;
  * the skip concat is algebraic: concat(h, penc) @ W6 == h @ W6h + penc @ W6p;
  * the 257-wide block2 output is split into a 256-wide feature matmul plus
    a VPU lane-reduction for the density channel (no 257-col padding waste);
  * matmul operands are cast to the model's compute dtype (bfloat16 by
    default on TPU) with float32 accumulation via preferred_element_type;
  * weight-gradient outputs use constant index_maps: the TPU grid is
    sequential, so each tile adds its contribution in VMEM and the result
    spills to HBM once.

Numerics match `NeRFModel.apply` (which matches the reference
/root/reference/nerf/models.py:62-73); the pure-JAX path remains the
reference implementation and the CPU fallback.
"""

from __future__ import annotations

import functools
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _enc_consts(num_freqs: int, in_dim: int, pad: int):
    """Constants turning frequency encoding into two small matmuls:
    enc(x) = x @ E + mask * sin(x @ S + phase), reproducing the reference
    layout [x, sin(2^j x), cos(2^j x) ...] (encoding.py:15-20)."""
    real = in_dim * (1 + 2 * num_freqs)
    assert pad >= real
    e = np.zeros((in_dim, pad), np.float32)
    s = np.zeros((in_dim, pad), np.float32)
    phase = np.zeros((pad,), np.float32)
    mask = np.zeros((pad,), np.float32)
    for d in range(in_dim):
        e[d, d] = 1.0
    col = in_dim
    for j in range(num_freqs):
        for trig in range(2):  # sin block then cos block per frequency
            for d in range(in_dim):
                s[d, col] = 2.0**j
                phase[col] = 0.0 if trig == 0 else np.pi / 2
                mask[col] = 1.0
                col += 1
    assert col == real
    return e, s, phase, mask


# Weight-tensor order shared by both kernels. b10s is (1,1); biases (1, out).
_WEIGHT_NAMES = (
    "w1", "b1", "w2", "b2", "w3", "b3", "w4", "b4", "w5", "b5",
    "w6h", "w6p", "b6", "w7", "b7", "w8", "b8", "w9", "b9",
    "w10f", "b10f", "w10s", "b10s",
    "wr0f", "wr0d", "br0", "wr1", "br1",
)


def pack_params(params: dict, p_pad: int, d_pad: int) -> dict:
    """Pad/split the NeRFModel pytree into the kernel layout (all float32;
    the compute-dtype cast happens once per call inside the custom_vjp so
    gradient cotangents stay float32). All ops are jnp (differentiable), so
    autodiff maps kernel dW back onto the pytree."""
    def pad_rows(w, rows):
        return jnp.pad(w, ((0, rows - w.shape[0]), (0, 0)))

    b1 = params["block1"]
    b2 = params["block2"]
    rgb = params["rgb"]
    h = b1[0]["w"].shape[1]
    w6 = b2[0]["w"]  # (h + real_p, h)
    w10 = b2[-1]["w"]  # (h, h+1)
    wr0 = rgb[0]["w"]  # (h + real_d, h//2)

    out = {
        "w1": pad_rows(b1[0]["w"], p_pad),
        "b1": b1[0]["b"][None, :],
        "w6h": w6[:h],
        "w6p": pad_rows(w6[h:], p_pad),
        "b6": b2[0]["b"][None, :],
        "w10f": w10[:, :-1],
        "b10f": b2[-1]["b"][None, :-1],
        "w10s": w10[:, -1:].T,                # (1, h)
        "b10s": b2[-1]["b"][-1:][None, :],    # (1, 1)
        "wr0f": wr0[:h],
        "wr0d": pad_rows(wr0[h:], d_pad),
        "br0": rgb[0]["b"][None, :],
        "wr1": jnp.pad(rgb[1]["w"], ((0, 0), (0, 8 - rgb[1]["w"].shape[1]))),
        "br1": jnp.pad(rgb[1]["b"][None, :], ((0, 0), (0, 8 - rgb[1]["b"].shape[0]))),
    }
    for i, lyr in enumerate(b1[1:], start=2):
        out[f"w{i}"] = lyr["w"]
        out[f"b{i}"] = lyr["b"][None, :]
    for i, lyr in enumerate(b2[1:-1], start=7):
        out[f"w{i}"] = lyr["w"]
        out[f"b{i}"] = lyr["b"][None, :]
    return out


def _cast_weights(packed: dict, cdt) -> dict:
    """Matrix weights -> compute dtype (one fused HBM copy per step);
    biases stay float32 (they are added post-accumulation)."""
    return {
        k: (v.astype(cdt) if k.startswith("w") else v) for k, v in packed.items()
    }


def _encode(x, e, s, phase, mask, sin=jnp.sin):
    # e/s: (3, pad); phase/mask: (1, pad)
    lin = jnp.dot(x, e, preferred_element_type=jnp.float32)
    osc = sin(jnp.dot(x, s, preferred_element_type=jnp.float32) + phase)
    return lin + mask * osc


def _encode_bwd(g, x, e, s, phase, mask):
    """VJP of _encode w.r.t. x."""
    dx = jnp.dot(g, e.T, preferred_element_type=jnp.float32)
    arg = jnp.dot(x, s, preferred_element_type=jnp.float32) + phase
    gm = g * mask * jnp.cos(arg)
    return dx + jnp.dot(gm, s.T, preferred_element_type=jnp.float32)


# Fast VPU trig: Mosaic's exact f32 sin costs ~25 cycles/element and SIREN
# evaluates ~0.5G sines per reference-shape forward (8 layers x 256 lanes
# per sample), which made the sine — not the MXU — the bottleneck
# (measured 40 ms/step vs ~10 for the same-FLOP NeRF; 10.7 ms with this).
# Full-period range reduction (r = x - 2pi*round(x/(2pi)), no sign/parity
# logic) + an odd degree-11 least-squares fit on [-pi, pi]: max |err|
# 1.1e-5 over (-200, 200) — far below the bf16 rounding the compute mode
# already accepts, at ~9 VPU ops. Used only in bfloat16 compute mode;
# float32 mode keeps exact jnp trig.
_TWO_PI = 6.283185307179586
_INV_TWO_PI = 0.15915494309189535


def _fast_sin(x):
    r = x - _TWO_PI * jnp.round(x * _INV_TWO_PI)
    r2 = r * r
    return r * (9.9999970696e-01 + r2 * (-1.6666577198e-01 + r2 * (
        8.3325579984e-03 + r2 * (-1.9812572238e-04 + r2 * (
            2.7040473315e-06 + r2 * -2.0534080101e-08)))))


def _trig(cdt):
    if jnp.dtype(cdt) == jnp.bfloat16:
        return _fast_sin, lambda x: _fast_sin(x + 0.5 * jnp.pi)
    return jnp.sin, jnp.cos


def _matmul_precision(cdt):
    """Mosaic's default f32 matmul is a single bf16 pass — far below XLA's
    f32 default (bf16x3) and enough to visibly slow training convergence
    (measured: val PSNR 21.7 vs 25.0 at 1k steps on the synthetic sphere).
    In float32 compute mode request HIGHEST (bf16x3/x6) to match XLA; in
    bfloat16 mode inputs are already bf16 and one pass is exact."""
    return (jax.lax.Precision.HIGHEST
            if jnp.dtype(cdt) == jnp.float32 else None)


def _mm(a, b, cdt):
    return jnp.dot(a.astype(cdt), b, preferred_element_type=jnp.float32,
                   precision=_matmul_precision(cdt))


def _forward_tile(pts, dirs, w, enc_p, enc_d, cdt):
    """Shared forward over one tile; returns activations needed by bwd.

    Activations stay resident in float32: storing them in bfloat16 halves
    VMEM but crashes the Mosaic compiler in the backward kernel (transposed
    dot_general on bf16-stored operands), so the cast to the compute dtype
    happens at each matmul input instead (_mm)."""
    sin, _ = _trig(cdt)
    penc = _encode(pts, *enc_p, sin=sin)      # (T, P) f32
    denc = _encode(dirs, *enc_d, sin=sin)     # (T, D) f32
    return _mlp_tile(penc, denc, w, cdt)


def _mlp_tile(penc, denc, w, cdt):
    """The NeRF MLP chain on pre-encoded features (reference
    models.py:62-73); shared by the field kernel (pts/dirs inputs) and the
    fused render kernel (features built in-kernel from per-ray encodings)."""
    def act(z):
        return jax.nn.relu(z)

    h1 = act(_mm(penc, w["w1"], cdt) + w["b1"])
    h2 = act(_mm(h1, w["w2"], cdt) + w["b2"])
    h3 = act(_mm(h2, w["w3"], cdt) + w["b3"])
    h4 = act(_mm(h3, w["w4"], cdt) + w["b4"])
    h5 = act(_mm(h4, w["w5"], cdt) + w["b5"])
    h6 = act(_mm(h5, w["w6h"], cdt) + _mm(penc, w["w6p"], cdt) + w["b6"])
    h7 = act(_mm(h6, w["w7"], cdt) + w["b7"])
    h8 = act(_mm(h7, w["w8"], cdt) + w["b8"])
    h9 = act(_mm(h8, w["w9"], cdt) + w["b9"])

    feat = _mm(h9, w["w10f"], cdt) + w["b10f"]                 # (T, h), no relu
    sigma_pre = (
        jnp.sum(h9 * w["w10s"].astype(jnp.float32), axis=1, keepdims=True)
        + w["b10s"]
    )                                                           # (T, 1) f32
    sigma = jax.nn.relu(sigma_pre)

    zr0 = _mm(feat, w["wr0f"], cdt) + _mm(denc, w["wr0d"], cdt) + w["br0"]
    y = act(zr0)
    rgb8 = jax.nn.sigmoid(_mm(y, w["wr1"], cdt) + w["br1"])     # (T, 8) f32
    acts = dict(
        penc=penc, denc=denc, h1=h1, h2=h2, h3=h3, h4=h4, h5=h5,
        h6=h6, h7=h7, h8=h8, h9=h9, feat=feat, sigma_pre=sigma_pre,
        y=y, rgb8=rgb8,
    )
    return acts, sigma


_ENC_NAMES = ("pe", "ps", "pphase", "pmask", "de", "ds", "dphase", "dmask")


def _fwd_kernel(pts_ref, dirs_ref, *refs, cdt):
    enc_refs, w_refs, out_ref = refs[:8], refs[8:-1], refs[-1]
    enc_vals = [r[:] for r in enc_refs]
    enc_p, enc_d = tuple(enc_vals[:4]), tuple(enc_vals[4:])
    w = {k: v[:] for k, v in zip(_WEIGHT_NAMES, w_refs)}
    acts, sigma = _forward_tile(pts_ref[:], dirs_ref[:], w, enc_p, enc_d, cdt)
    tile = pts_ref.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (tile, 8), 1)
    packed = jnp.where(col == 3, sigma, acts["rgb8"])
    out_ref[:] = jnp.where(col > 3, 0.0, packed)


def _mlp_bwd_core(acts, w, cdt, g_rgb, g_sigma, acc_refs,
                  want_input_grads=True):
    """Backward of `_mlp_tile` for one tile: accumulates all weight/bias
    gradients into ``acc_refs`` (VMEM, shared across the sequential grid) and
    returns (dpenc, ddenc) — or (None, None) when input grads aren't needed
    (the fused render kernel differentiates w.r.t. parameters only).

    ``g_rgb``: (T, 8) cotangent of the packed sigmoid rgb output (cols >= 3
    must be zero); ``g_sigma``: (T, 1) cotangent of post-relu density."""

    prec = _matmul_precision(cdt)

    def mmT_acc(name, a, dz):
        # dW += a^T @ dz, contracting the tile axis; f32 accumulation.
        acc_refs[name][:] += jax.lax.dot_general(
            a.astype(cdt), dz.astype(cdt),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )

    def db_acc(name, dz):
        acc_refs[name][:] += jnp.sum(dz, axis=0, keepdims=True)

    def dact(dz, wname):
        # dz @ W^T, contracting the feature axis.
        return jax.lax.dot_general(
            dz.astype(cdt), w[wname],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )

    rgb8 = acts["rgb8"]
    dzr1 = g_rgb * rgb8 * (1.0 - rgb8)
    mmT_acc("wr1", acts["y"], dzr1)
    db_acc("br1", dzr1)
    dy = dact(dzr1, "wr1")

    dzr0 = dy * (acts["y"] > 0)
    mmT_acc("wr0f", acts["feat"], dzr0)
    mmT_acc("wr0d", acts["denc"], dzr0)
    db_acc("br0", dzr0)
    dfeat = dact(dzr0, "wr0f")
    ddenc = dact(dzr0, "wr0d") if want_input_grads else None

    dsig = g_sigma * (acts["sigma_pre"] > 0)                 # (T, 1)
    mmT_acc("w10f", acts["h9"], dfeat)
    db_acc("b10f", dfeat)
    acc_refs["w10s"][:] += jnp.sum(
        acts["h9"] * dsig, axis=0, keepdims=True
    )
    acc_refs["b10s"][:] += jnp.sum(dsig, axis=0, keepdims=True)
    dh9 = dact(dfeat, "w10f") + dsig * w["w10s"].astype(jnp.float32)

    dz9 = dh9 * (acts["h9"] > 0)
    mmT_acc("w9", acts["h8"], dz9)
    db_acc("b9", dz9)
    dz8 = dact(dz9, "w9") * (acts["h8"] > 0)
    mmT_acc("w8", acts["h7"], dz8)
    db_acc("b8", dz8)
    dz7 = dact(dz8, "w8") * (acts["h7"] > 0)
    mmT_acc("w7", acts["h6"], dz7)
    db_acc("b7", dz7)
    dz6 = dact(dz7, "w7") * (acts["h6"] > 0)
    mmT_acc("w6h", acts["h5"], dz6)
    mmT_acc("w6p", acts["penc"], dz6)
    db_acc("b6", dz6)
    dpenc = dact(dz6, "w6p") if want_input_grads else None

    dz5 = dact(dz6, "w6h") * (acts["h5"] > 0)
    mmT_acc("w5", acts["h4"], dz5)
    db_acc("b5", dz5)
    dz4 = dact(dz5, "w5") * (acts["h4"] > 0)
    mmT_acc("w4", acts["h3"], dz4)
    db_acc("b4", dz4)
    dz3 = dact(dz4, "w4") * (acts["h3"] > 0)
    mmT_acc("w3", acts["h2"], dz3)
    db_acc("b3", dz3)
    dz2 = dact(dz3, "w3") * (acts["h2"] > 0)
    mmT_acc("w2", acts["h1"], dz2)
    db_acc("b2", dz2)
    dz1 = dact(dz2, "w2") * (acts["h1"] > 0)
    mmT_acc("w1", acts["penc"], dz1)
    db_acc("b1", dz1)
    if want_input_grads:
        dpenc = dpenc + dact(dz1, "w1")
    return dpenc, ddenc


def _bwd_kernel(pts_ref, dirs_ref, g_ref, *refs, cdt, num_w):
    enc_refs, refs = refs[:8], refs[8:]
    enc_vals = [r[:] for r in enc_refs]
    enc_p, enc_d = tuple(enc_vals[:4]), tuple(enc_vals[4:])
    w_refs = refs[:num_w]
    dpts_ref, ddirs_ref = refs[num_w], refs[num_w + 1]
    acc_refs = dict(zip(_WEIGHT_NAMES, refs[num_w + 2:]))
    w = {k: v[:] for k, v in zip(_WEIGHT_NAMES, w_refs)}

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for r in acc_refs.values():
            r[:] = jnp.zeros_like(r)

    pts, dirs, g = pts_ref[:], dirs_ref[:], g_ref[:]
    acts, _ = _forward_tile(pts, dirs, w, enc_p, enc_d, cdt)

    tile = pts.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (tile, 8), 1)
    g_rgb = jnp.where(col < 3, g, 0.0)                       # (T, 8)
    g_sigma = jnp.sum(jnp.where(col == 3, g, 0.0), axis=1, keepdims=True)

    dpenc, ddenc = _mlp_bwd_core(acts, w, cdt, g_rgb, g_sigma, acc_refs)

    dpts_ref[:] = _encode_bwd(dpenc, pts, *enc_p)
    ddirs_ref[:] = _encode_bwd(ddenc, dirs, *enc_d)


def _weight_specs(packed):
    return [
        pl.BlockSpec(packed[n].shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        for n in _WEIGHT_NAMES
    ]


def _build_fused(h: int, p_pad: int, d_pad: int, real_p: int, real_d: int,
                 num_freq_p: int, num_freq_d: int, cdt, tile_fwd: int,
                 tile_bwd: int, interpret: bool):
    def to2d(a):
        # numpy, NOT jnp: these are closure constants of every traced
        # program using the kernel — as device arrays each one costs a
        # D2H fetch at lowering time (measured 16.6 s/constant on the
        # tunneled TPU); numpy embeds directly into the HLO.
        return np.asarray(a if a.ndim == 2 else a[None, :])

    enc_args = tuple(
        to2d(a)
        for a in (_enc_consts(num_freq_p, 3, p_pad) + _enc_consts(num_freq_d, 3, d_pad))
    )
    enc_specs = [
        pl.BlockSpec(a.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        for a in enc_args
    ]
    num_w = len(_WEIGHT_NAMES)

    def row_spec(width, tile):
        return pl.BlockSpec((tile, width), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    # matmul columns per point: block1 + skip block2 + heads
    mm_cols = (p_pad * h + 4 * h * h) + ((h + p_pad) * h + 3 * h * h) \
        + (h * h + h) + ((h + d_pad) * (h // 2) + (h // 2) * 8)

    def _run_fwd(wc, pts, dirs):
        n = pts.shape[0]
        return pl.pallas_call(
            functools.partial(_fwd_kernel, cdt=cdt),
            grid=(n // tile_fwd,),
            in_specs=[row_spec(3, tile_fwd), row_spec(3, tile_fwd)]
            + enc_specs + _weight_specs(wc),
            out_specs=row_spec(8, tile_fwd),
            out_shape=jax.ShapeDtypeStruct((n, 8), jnp.float32),
            cost_estimate=pl.CostEstimate(
                flops=2 * n * mm_cols,
                bytes_accessed=n * (3 + 3 + 8) * 4,
                transcendentals=n * (p_pad + d_pad + 8),
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
            jax.ShapeDtypeStruct(wc[k].shape, jnp.float32)
            for k in _WEIGHT_NAMES
        ]
        acc_specs = [
            pl.BlockSpec(wc[k].shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
            for k in _WEIGHT_NAMES
        ]
        outs = pl.pallas_call(
            functools.partial(_bwd_kernel, cdt=cdt, num_w=num_w),
            grid=(n // tile_bwd,),
            in_specs=[row_spec(3, tile_bwd), row_spec(3, tile_bwd),
                      row_spec(8, tile_bwd)]
            + enc_specs + _weight_specs(wc),
            out_specs=[row_spec(3, tile_bwd), row_spec(3, tile_bwd)] + acc_specs,
            out_shape=[
                jax.ShapeDtypeStruct((n, 3), jnp.float32),
                jax.ShapeDtypeStruct((n, 3), jnp.float32),
            ]
            + acc_shapes,
            cost_estimate=pl.CostEstimate(
                flops=3 * 2 * n * mm_cols,
                bytes_accessed=n * (3 + 3 + 8 + 3 + 3) * 4,
                transcendentals=n * (p_pad + d_pad + 8),
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
        )(pts, dirs, g, *enc_args, *(wc[k] for k in _WEIGHT_NAMES))
        dpts, ddirs = outs[0], outs[1]
        dpacked = dict(zip(_WEIGHT_NAMES, outs[2:]))  # float32 cotangents
        return dpacked, dpts, ddirs

    fused.defvjp(fused_fwd, fused_bwd)
    return fused


def make_fused_nerf_apply(model, tile_fwd: int = 2048, tile_bwd: int = 512,
                          interpret: bool = False):
    """Drop-in `apply(params, points, dirs) -> (rgb, sigma)` backed by the
    fused kernels, or None when the model shape isn't supported (callers
    fall back to the pure-JAX path).

    Tile sizes: the grid has a fixed per-step cost (~8 us measured on
    v5lite), so fewer/larger tiles win; the forward's VMEM high-water is
    just the layer chain (big tiles fit), while the backward stashes every
    activation per tile (tile_bwd stays small). tile_bwd must divide
    tile_fwd (inputs are padded to a tile_fwd multiple)."""
    h = model.hidden_dim
    if h % 128 != 0 or (h // 2) % 128 != 0:
        return None
    if tile_fwd % tile_bwd != 0:
        raise ValueError("tile_bwd must divide tile_fwd")

    real_p = 3 * (1 + 2 * model.pos_encoding_dim)
    real_d = 3 * (1 + 2 * model.dir_encoding_dim)
    p_pad = _round_up(real_p, 64)
    d_pad = _round_up(real_d, 32)
    cdt = jnp.dtype(model.compute_dtype)

    fused = _build_fused(
        h, p_pad, d_pad, real_p, real_d,
        model.pos_encoding_dim, model.dir_encoding_dim, cdt, tile_fwd,
        tile_bwd, interpret,
    )

    def apply(params, points, dirs):
        packed = pack_params(params, p_pad, d_pad)
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
