"""Fused KiloNeRF field evaluation: grouped-matmul Pallas TPU kernels.

KiloNeRF is thousands of tiny per-voxel MLPs (models/kilonerf.py). The XLA
grouped path materializes per-tile weight gathers and (tiles, T, h)
activations in HBM and its backward pays scatter-adds for every layer —
measured 36 ms per 262k-point fwd+bwd on v5e (tools/dissect_kilonerf.py),
30 ms of which is dispatch overhead, not math.

These kernels make the expert dispatch a DMA pattern instead of data
movement through HBM tensors:

  * the grid is one step per point tile; a scalar-prefetched ``gid`` array
    (from models/kilonerf.py::build_dispatch) tells the BlockSpecs which
    expert's weights to DMA for tile ``i``;
  * an expert's ENTIRE parameter set travels as ONE sublane-packed
    (rows, h) block — matrices stacked along sublanes at 8-aligned offsets,
    biases collected into a single trailing (8, h) region — so a grid step
    costs one weight DMA, not thirteen. Tiles of the same expert are
    consecutive (group-major plan), so Mosaic re-DMAs nothing between them.
    Tiny-DMA latency was the measured limiter of the 13-array variant
    (44 ms at T=256, and LARGER tiles made it worse as padding compute
    grew: 52/68 ms at T=512/1024);
  * the whole 5-matmul tiny-MLP chain (encode -> l1 -> l2 -> trunk ->
    rgb head) runs in VMEM per tile; only (T, 8) inputs/outputs touch HBM;
  * the backward kernel recomputes the tile forward (the FLOPs are
    trivial) and accumulates the expert's packed gradient block IN VMEM
    across its consecutive tile run: zero-initialized on the expert's
    first tile, spilled to HBM exactly once when the block index moves on.
    Experts with no points are never visited — the wrapper masks their
    (uninitialized) gradient blocks to zero;
  * the dispatch plan's surplus tiles (static bound ceil(n/T) + G^3) are
    skipped entirely via a prefetched used-tile count, and the
    slot<->point bijection makes BOTH reorder directions gathers (no
    scatter-add ever appears in the VJP).

Numerics match ``KiloNeRFModel.apply_pointwise`` (the numerical reference
tier); parity is pinned in tests/test_fused_kilonerf.py.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nerf_tpu.ops.pallas.fused_nerf import (
    _enc_consts,
    _encode,
    _matmul_precision,
    _mm,
    _round_up,
)

# Sublane-packed expert layout: matrix rows stacked at 8-aligned offsets,
# then one (8, h) "extras" region holding the row vectors.
_EXTRA_ROWS = ("wts", "b1", "b2", "btf", "br1", "br2", "bts")


def _layout(h: int, p_pad: int, d_pad: int):
    # exactly the multi-expert layout at E=1
    return _layout_multi(h, p_pad, d_pad, 1)


def pack_params(params: dict, p_pad: int, d_pad: int, h: int) -> jax.Array:
    """KiloNeRFModel pytree -> one (G^3, R, h) float32 block per expert —
    exactly the multi-expert packing at E=1 (the compute-dtype cast
    happens once per call inside the vjp)."""
    return pack_params_multi(params, p_pad, d_pad, h, 1)


def _pieces(w, h, p_pad, d_pad):
    """Static sublane slices of one expert's packed (R, h) block —
    exactly the multi-expert slicing at E=1."""
    return _pieces_multi(w, h, p_pad, d_pad, 1)


def _forward_tile(pts8, w, enc_p, enc_d, cdt):
    """The tiny-MLP chain for one tile whose points all share one expert.

    ``pts8`` is the combined payload: cols 0-2 voxel-local position, col 3
    expert-within-group index (multi-expert only), cols 4-6 view direction,
    col 7 zero. Both encodes read the SAME block — the position encode
    matrices are nonzero only in rows 0-2 and the direction ones only in
    rows 4-6, so the MXU contraction does the column selection for free.
    One payload = ONE input gather on the host side: the dispatch gathers
    were measured at 12.5 ms of the 22 ms fused forward (three separate
    row-gathers — gather cost is flat per ROW, not per byte;
    tools/dissect_kilonerf_fused.py)."""
    penc = _encode(pts8, *enc_p)
    denc = _encode(pts8, *enc_d)
    x1 = jax.nn.relu(_mm(penc, w["w1"], cdt) + w["b1"])
    x2 = jax.nn.relu(_mm(x1, w["w2"], cdt) + w["b2"])
    sigma_pre = (
        jnp.sum(x2 * w["wts"].astype(jnp.float32), axis=1, keepdims=True)
        + w["bts"][:, :1]
    )
    sigma = jax.nn.relu(sigma_pre)
    feat = _mm(x2, w["wtf"], cdt) + w["btf"]
    y = jax.nn.relu(
        _mm(feat, w["wr1f"], cdt) + _mm(denc, w["wr1d"], cdt) + w["br1"]
    )
    # wr2 is column-padded to h; only the first 3 rgb columns are real
    rgb8 = jax.nn.sigmoid(_mm(y, w["wr2"], cdt) + w["br2"])
    return dict(penc=penc, denc=denc, x1=x1, x2=x2, sigma_pre=sigma_pre,
                feat=feat, y=y, rgb8=rgb8), sigma


def _fwd_kernel(gid_ref, used_ref, pts_ref, *refs,
                cdt, h, p_pad, d_pad):
    enc_refs, w_ref, out_ref = refs[:8], refs[8], refs[9]
    i = pl.program_id(0)

    @pl.when(i < used_ref[0])
    def _body():
        enc_p = tuple(r[:] for r in enc_refs[:4])
        enc_d = tuple(r[:] for r in enc_refs[4:])
        w = _pieces(w_ref[0], h, p_pad, d_pad)
        acts, sigma = _forward_tile(pts_ref[:], w, enc_p, enc_d, cdt)
        tile = pts_ref.shape[0]
        col = jax.lax.broadcasted_iota(jnp.int32, (tile, 8), 1)
        packed = jnp.where(col == 3, sigma, acts["rgb8"][:, :8])
        out_ref[:] = jnp.where(col > 3, 0.0, packed)


def _bwd_kernel(gid_ref, used_ref, pts_ref, g_ref, *refs,
                cdt, h, p_pad, d_pad):
    enc_refs, w_ref, acc_ref = refs[:8], refs[8], refs[9]
    prec = _matmul_precision(cdt)
    offs, _ = _layout(h, p_pad, d_pad)
    i = pl.program_id(0)
    prev = gid_ref[jnp.maximum(i - 1, 0)]
    first_of_group = jnp.logical_or(i == 0, gid_ref[i] != prev)

    @pl.when(jnp.logical_and(first_of_group, i < used_ref[0]))
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(i < used_ref[0])
    def _body():
        enc_p = tuple(r[:] for r in enc_refs[:4])
        enc_d = tuple(r[:] for r in enc_refs[4:])
        w = _pieces(w_ref[0], h, p_pad, d_pad)
        pts8, g = pts_ref[:], g_ref[:]
        acts, _ = _forward_tile(pts8, w, enc_p, enc_d, cdt)

        tile = pts8.shape[0]
        col = jax.lax.broadcasted_iota(jnp.int32, (tile, 8), 1)
        g_rgb8 = jnp.where(col < 3, g, 0.0)
        g_sigma = jnp.sum(jnp.where(col == 3, g, 0.0), axis=1, keepdims=True)
        g_rgb = jnp.pad(g_rgb8[:, :8], ((0, 0), (0, h - 8))) \
            if h > 8 else g_rgb8[:, :h]

        def mmT(a, dz):
            return jax.lax.dot_general(
                a.astype(cdt), dz.astype(cdt),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec,
            )

        def dact(dz, wname):
            return jax.lax.dot_general(
                dz.astype(cdt), w[wname],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec,
            )

        def acc_mat(name, val):
            r0, _ = offs[name]
            acc_ref[0, r0:r0 + val.shape[0]] += val

        def acc_row(idx, dz):
            s = jnp.sum(dz, axis=0, keepdims=True)
            if s.shape[1] < h:
                s = jnp.pad(s, ((0, 0), (0, h - s.shape[1])))
            acc_ref[0, offs["extras"][0] + idx:offs["extras"][0] + idx + 1] += s

        rgb8 = acts["rgb8"]
        dzr2 = g_rgb * rgb8 * (1.0 - rgb8)
        acc_mat("wr2", mmT(acts["y"], dzr2))
        acc_row(5, dzr2)
        dy = dact(dzr2, "wr2")

        dzy = dy * (acts["y"] > 0)
        acc_mat("wr1f", mmT(acts["feat"], dzy))
        acc_mat("wr1d", mmT(acts["denc"], dzy))
        acc_row(4, dzy)
        dfeat = dact(dzy, "wr1f")

        dsig = g_sigma * (acts["sigma_pre"] > 0)
        acc_mat("wtf", mmT(acts["x2"], dfeat))
        acc_row(3, dfeat)
        acc_row(0, acts["x2"] * dsig)   # wts grad: sum over the tile
        acc_row(6, dsig)

        dx2 = dact(dfeat, "wtf") + dsig * w["wts"].astype(jnp.float32)
        dz2 = dx2 * (acts["x2"] > 0)
        acc_mat("w2", mmT(acts["x1"], dz2))
        acc_row(2, dz2)
        dx1 = dact(dz2, "w2")

        dz1 = dx1 * (acts["x1"] > 0)
        acc_mat("w1", mmT(acts["penc"], dz1))
        acc_row(1, dz1)


# --------------------------------------------------- multi-expert (E per step)
#
# The single-expert kernel is MXU-LATENCY-bound, not throughput-bound: its
# dependent chain of (T, 32)x(32, 32) dots lights up 1/16 of the 128x128
# systolic array and serializes across thousands of tiles (measured 30 ms
# fwd+bwd at 262k points — BENCH_NOTES). The multi-expert step packs
# E = 128 // h experts into every grid step:
#
#   * experts are statically grouped E-at-a-time by voxel id (grp = vid//E,
#     z-adjacent voxels); the dispatch plan sorts points by GROUP;
#   * activations live lane-SLOTTED: a point of within-group expert ``e``
#     carries its h values at lanes [e*h, (e+1)*h) of a (T, E*h=128) tile —
#     full-lane vregs instead of quarter-lane;
#   * each group's weights are packed as BLOCK-DIAGONAL (E*in, E*h) mats,
#     so one (T, 128)x(128, 128) dot evaluates a layer for E experts at
#     once: E^2/E = E-fold FLOP padding, but the tiny nets are ~100x under
#     NeRF's FLOPs — trading idle-array zeros for E-fold fewer dependent
#     MXU ops is the right side of the latency/throughput bargain;
#   * slot PURITY does the correctness work: block-diagonal weights never
#     move values across slots, so a point's own lanes are exact
#     everywhere. Garbage (bias rows leaking into foreign slots) is
#     confined to foreign lanes and only two reductions cross slots — the
#     sigma dot-product and the final rgb slot-sum — which mask first. In
#     the backward pass cotangents arrive slot-pure and stay slot-pure
#     through the block-diagonal transposes, so off-diagonal blocks of the
#     accumulated gradient hold garbage that the pack transpose simply
#     never reads (it extracts diagonal blocks).
#
# The expert-within-group index rides in column 3 of the (T, 8) combined
# payload (cols 0-2 local position, 4-6 view direction) — the encode
# matmul constants zero that row, so the encoding never sees it.


def _layout_multi(h: int, p_pad: int, d_pad: int, e: int):
    mats = (("w1", e * p_pad), ("w2", e * h), ("wtf", e * h),
            ("wr1f", e * h), ("wr1d", e * d_pad), ("wr2", e * h))
    offs, row = {}, 0
    for name, rows in mats:
        offs[name] = (row, rows)
        row += rows
    offs["extras"] = (row, 8)
    return offs, row + 8


def pack_params_multi(params: dict, p_pad: int, d_pad: int, h: int,
                      e: int) -> jax.Array:
    """KiloNeRFModel pytree -> (G^3/e, R, e*h) float32 group blocks:
    block-diagonal matrices + one (8, e*h) slotted extras region."""
    g = params["l1"]["w"].shape[0]
    ng = g // e
    lanes = e * h
    eye = jnp.eye(e, dtype=jnp.float32)

    def blockdiag(w, rows):
        # (G, in, h) row-padded to ``rows`` -> (G/e, e*rows, e*h)
        w = jnp.pad(w, ((0, 0), (0, rows - w.shape[1]), (0, h - w.shape[2])))
        w = w.reshape(ng, e, rows, h)
        w = w[:, :, :, None, :] * eye[None, :, None, :, None]
        return w.reshape(ng, e * rows, lanes)

    def slotted(v):
        # (G, c) row vectors -> (G/e, 1, e*h) with expert e's values at its
        # lane slot (concatenation along lanes IS the slot layout)
        v = jnp.pad(v, ((0, 0), (0, h - v.shape[1])))
        return v.reshape(ng, 1, lanes)

    wt = params["trunk"]["w"]                     # (G, h, h+1)
    wr1 = params["rgb1"]["w"]                     # (G, h + real_d, h)
    mats = [
        blockdiag(params["l1"]["w"], p_pad),
        blockdiag(params["l2"]["w"], h),
        blockdiag(wt[:, :, :h], h),
        blockdiag(wr1[:, :h], h),
        blockdiag(wr1[:, h:], d_pad),
        blockdiag(params["rgb2"]["w"], h),
    ]
    bts = jnp.zeros((g, h), jnp.float32).at[:, 0].set(
        params["trunk"]["b"][:, h]
    )
    extras = jnp.concatenate(
        [
            slotted(wt[:, :, h]),                  # wts (G, h)
            slotted(params["l1"]["b"]),
            slotted(params["l2"]["b"]),
            slotted(params["trunk"]["b"][:, :h]),  # btf
            slotted(params["rgb1"]["b"]),
            slotted(params["rgb2"]["b"]),          # br2
            slotted(bts),                          # bts scalar at lane e*h
            jnp.zeros((ng, 1, lanes), jnp.float32),
        ],
        axis=1,
    )
    return jnp.concatenate(mats + [extras], axis=1)


def _pieces_multi(w, h, p_pad, d_pad, e):
    offs, _ = _layout_multi(h, p_pad, d_pad, e)

    def mat(name):
        r0, r = offs[name]
        return w[r0:r0 + r]

    e0 = offs["extras"][0]
    row = lambda i: w[e0 + i:e0 + i + 1]
    return dict(
        w1=mat("w1"), w2=mat("w2"), wtf=mat("wtf"), wr1f=mat("wr1f"),
        wr1d=mat("wr1d"), wr2=mat("wr2"),
        wts=row(0), b1=row(1), b2=row(2), btf=row(3), br1=row(4),
        br2=row(5), bts=row(6),
    )


def _slot_masks(pts8, h, p_pad, d_pad, e):
    """Per-point lane masks from the expert index stashed in payload col 3."""
    tile = pts8.shape[0]
    e_col = pts8[:, 3:4].astype(jnp.int32)

    def mask(width):
        lane = jax.lax.broadcasted_iota(jnp.int32, (tile, e * width), 1)
        return (lane // width == e_col).astype(jnp.float32)

    lane_h = jax.lax.broadcasted_iota(jnp.int32, (tile, e * h), 1)
    first = (lane_h == e_col * h).astype(jnp.float32)
    return mask(h), mask(p_pad), mask(d_pad), first


def _forward_tile_multi(pts8, w, enc_p, enc_d, red8, cdt,
                        h, p_pad, d_pad, e, need_rgb8=True):
    """Slotted tiny-MLP chain for one tile of E experts' points; ``pts8``
    is the combined loc/expert/dir payload (see ``_forward_tile``).
    ``need_rgb8=False`` (the backward recompute, which rebuilds the rgb
    cotangent from ``g`` directly) skips the dead slot-sum dot."""
    mask_h, mask_p, mask_d, first = _slot_masks(pts8, h, p_pad, d_pad, e)
    penc = _encode(pts8, *enc_p)                  # (T, p_pad); col-3 zeroed
    denc = _encode(pts8, *enc_d)
    penc_s = pltpu.repeat(penc, e, axis=1) * mask_p
    denc_s = pltpu.repeat(denc, e, axis=1) * mask_d
    x1 = jax.nn.relu(_mm(penc_s, w["w1"], cdt) + w["b1"])
    x2 = jax.nn.relu(_mm(x1, w["w2"], cdt) + w["b2"])
    sigma_pre = (
        jnp.sum(x2 * w["wts"].astype(jnp.float32) * mask_h,
                axis=1, keepdims=True)
        + jnp.sum(first * w["bts"].astype(jnp.float32),
                  axis=1, keepdims=True)
    )
    sigma = jax.nn.relu(sigma_pre)
    feat = _mm(x2, w["wtf"], cdt) + w["btf"]
    y = jax.nn.relu(
        _mm(feat, w["wr1f"], cdt) + _mm(denc_s, w["wr1d"], cdt) + w["br1"]
    )
    rgb_s = jax.nn.sigmoid(_mm(y, w["wr2"], cdt) + w["br2"])
    rgb8 = None
    if need_rgb8:
        # pure 0/1 slot selection — stay f32/HIGHEST so the final colors
        # are NOT bf16-quantized (the single-expert kernel never is)
        rgb8 = jnp.dot(rgb_s * mask_h, red8,
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
    return dict(penc_s=penc_s, denc_s=denc_s, x1=x1, x2=x2,
                sigma_pre=sigma_pre, feat=feat, y=y, rgb_s=rgb_s,
                mask_h=mask_h, first=first), rgb8, sigma


def _fwd_kernel_multi(gid_ref, used_ref, pts_ref, *refs,
                      cdt, h, p_pad, d_pad, e):
    enc_refs, red_ref, w_ref, out_ref = refs[:8], refs[8], refs[9], refs[10]
    i = pl.program_id(0)

    @pl.when(i < used_ref[0])
    def _body():
        enc_p = tuple(r[:] for r in enc_refs[:4])
        enc_d = tuple(r[:] for r in enc_refs[4:])
        w = _pieces_multi(w_ref[0], h, p_pad, d_pad, e)
        _, rgb8, sigma = _forward_tile_multi(
            pts_ref[:], w, enc_p, enc_d, red_ref[:], cdt,
            h, p_pad, d_pad, e,
        )
        tile = pts_ref.shape[0]
        col = jax.lax.broadcasted_iota(jnp.int32, (tile, 8), 1)
        packed = jnp.where(col == 3, sigma, rgb8)
        out_ref[:] = jnp.where(col > 3, 0.0, packed)


def _bwd_kernel_multi(gid_ref, used_ref, pts_ref, g_ref, *refs,
                      cdt, h, p_pad, d_pad, e):
    enc_refs, red_ref, w_ref, acc_ref = refs[:8], refs[8], refs[9], refs[10]
    prec = _matmul_precision(cdt)
    offs, _ = _layout_multi(h, p_pad, d_pad, e)
    i = pl.program_id(0)
    prev = gid_ref[jnp.maximum(i - 1, 0)]
    first_of_group = jnp.logical_or(i == 0, gid_ref[i] != prev)

    @pl.when(jnp.logical_and(first_of_group, i < used_ref[0]))
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(i < used_ref[0])
    def _body():
        enc_p = tuple(r[:] for r in enc_refs[:4])
        enc_d = tuple(r[:] for r in enc_refs[4:])
        w = _pieces_multi(w_ref[0], h, p_pad, d_pad, e)
        pts8, g = pts_ref[:], g_ref[:]
        acts, _, _ = _forward_tile_multi(
            pts8, w, enc_p, enc_d, red_ref[:], cdt, h, p_pad, d_pad, e,
            need_rgb8=False,
        )
        mask_h = acts["mask_h"]

        tile = pts8.shape[0]
        col = jax.lax.broadcasted_iota(jnp.int32, (tile, 8), 1)
        g_rgb8 = jnp.where(col < 3, g, 0.0)
        g_sigma = jnp.sum(jnp.where(col == 3, g, 0.0), axis=1, keepdims=True)
        g_rgb = jnp.pad(g_rgb8, ((0, 0), (0, h - 8))) if h > 8 else g_rgb8
        g_rgb_s = pltpu.repeat(g_rgb, e, axis=1) * mask_h  # slot-pure

        def mmT(a, dz):
            return jax.lax.dot_general(
                a.astype(cdt), dz.astype(cdt),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec,
            )

        def dact(dz, wname):
            return jax.lax.dot_general(
                dz.astype(cdt), w[wname],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec,
            )

        def acc_mat(name, val):
            r0, _ = offs[name]
            acc_ref[0, r0:r0 + val.shape[0]] += val

        def acc_row(idx, dz):
            s = jnp.sum(dz, axis=0, keepdims=True)
            acc_ref[0, offs["extras"][0] + idx:offs["extras"][0] + idx + 1] += s

        rgb_s = acts["rgb_s"]
        dzr2 = g_rgb_s * rgb_s * (1.0 - rgb_s)
        acc_mat("wr2", mmT(acts["y"], dzr2))
        acc_row(5, dzr2)
        dy = dact(dzr2, "wr2")

        dzy = dy * (acts["y"] > 0)
        acc_mat("wr1f", mmT(acts["feat"], dzy))
        acc_mat("wr1d", mmT(acts["denc_s"], dzy))
        acc_row(4, dzy)
        dfeat = dact(dzy, "wr1f")

        dsig = g_sigma * (acts["sigma_pre"] > 0)
        acc_mat("wtf", mmT(acts["x2"], dfeat))
        acc_row(3, dfeat)
        acc_row(0, acts["x2"] * dsig * mask_h)  # wts grad, slot-masked
        acc_row(6, acts["first"] * dsig)        # bts grad at lane e*h

        dx2 = dact(dfeat, "wtf") \
            + dsig * w["wts"].astype(jnp.float32) * mask_h
        dz2 = dx2 * (acts["x2"] > 0)
        acc_mat("w2", mmT(acts["x1"], dz2))
        acc_row(2, dz2)
        dx1 = dact(dz2, "w2")

        dz1 = dx1 * (acts["x1"] > 0)
        acc_mat("w1", mmT(acts["penc_s"], dz1))
        acc_row(1, dz1)


def make_fused_kilonerf_apply(model, tile_fwd: int = 256, tile_bwd: int = 256,
                              interpret: bool = False,
                              experts_per_step: int | None = None):
    """Drop-in ``apply(params, points, dirs) -> (rgb, sigma)`` for
    KiloNeRFModel backed by the grouped kernels, or None when unsupported.

    ``tile_fwd``/``tile_bwd`` are points per grid step; they must be equal
    (one dispatch plan serves both passes). Smaller tiles waste fewer
    padded slots on partial groups; bigger ones amortize per-step cost —
    the padding tiles themselves are compute-skipped either way.

    ``experts_per_step`` picks the multi-expert block-diagonal step width
    (default: fill the 128 MXU lanes, i.e. 128 // hidden_dim); pass 1 to
    force the single-expert kernels.
    """
    if model.hidden_dim > 128 or model.hidden_dim % 8 or model.hidden_dim < 8:
        return None
    if tile_fwd != tile_bwd:
        raise ValueError("grouped dispatch uses one tile size for both passes")
    e_per = experts_per_step
    if e_per is None:
        e_per = max(1, 128 // model.hidden_dim)
        if model.num_networks % e_per:
            e_per = 1                      # auto mode: quiet fallback
    elif e_per > 1 and model.num_networks % e_per:
        raise ValueError(
            f"experts_per_step={e_per} does not divide "
            f"num_networks={model.num_networks}"
        )
    return _build_grouped(model, tile_fwd, e_per, interpret)


def _build_grouped(model, t: int, e_per: int, interpret: bool):
    """Shared builder for the grouped apply: dispatch plan, custom-vjp
    wiring and the pallas_call scaffolding are identical for the
    single-expert (e_per=1) and multi-expert block-diagonal kernels —
    only the kernel bodies, the packing and the slot-sum const differ."""
    h = model.hidden_dim
    g3 = model.num_networks
    ng = g3 // e_per
    lanes = e_per * h
    real_p = 3 * (1 + 2 * model.pos_encoding_dim)
    real_d = 3 * (1 + 2 * model.dir_encoding_dim)
    p_pad = _round_up(real_p, 8)
    d_pad = _round_up(real_d, 8)
    cdt = jnp.dtype(model.compute_dtype)
    _, pack_rows = _layout_multi(h, p_pad, d_pad, e_per)

    def enc8(num_freqs, pad, row0):
        # combined payload: the position matrices live in rows 0-2 and the
        # direction ones in rows 4-6, so both encodes contract the SAME
        # (T, 8) payload block (rows 3 and 7 — expert index / pad — are
        # zero in both, so neither encoding ever sees them)
        e, s, phase, mask = _enc_consts(num_freqs, 3, pad)
        pad8 = lambda a: np.pad(a, ((row0, 5 - row0), (0, 0)))
        # numpy, not device arrays: closure constants lower without the
        # per-constant D2H fetch (~16 s each on the tunneled TPU)
        return (pad8(e), pad8(s), phase[None, :], mask[None, :])

    enc_args = enc8(model.pos_encoding_dim, p_pad, 0) \
        + enc8(model.dir_encoding_dim, d_pad, 4)
    kargs = dict(cdt=cdt, h=h, p_pad=p_pad, d_pad=d_pad)
    if e_per > 1:
        # (lanes, 8) slot-sum matrix: 1 at (e*h + j, j) — with slot-masked
        # input, summing slots extracts each point's own first-8 lanes
        red8 = np.zeros((lanes, 8), np.float32)
        for ee in range(e_per):
            for j in range(min(8, h)):
                red8[ee * h + j, j] = 1.0
        consts = enc_args + (red8,)
        kargs["e"] = e_per
        fwd_kernel, bwd_kernel = _fwd_kernel_multi, _bwd_kernel_multi
    else:
        consts = enc_args
        fwd_kernel, bwd_kernel = _fwd_kernel, _bwd_kernel
    const_specs = [
        pl.BlockSpec(a.shape, lambda i, gid, used: (0, 0),
                     memory_space=pltpu.VMEM)
        for a in consts
    ]

    def row_spec(width):
        return pl.BlockSpec((t, width), lambda i, gid, used: (i, 0),
                            memory_space=pltpu.VMEM)

    pack_spec = pl.BlockSpec((1, pack_rows, lanes),
                             lambda i, gid, used: (gid[i], 0, 0),
                             memory_space=pltpu.VMEM)

    comp = pltpu.CompilerParams(
        dimension_semantics=("arbitrary",),
        vmem_limit_bytes=100 * 1024 * 1024,
    )
    # e_per-slotted layer widths (the E-fold zero padding is real MXU work)
    mm_cols = e_per * (p_pad * h + 4 * h * h + d_pad * h) * e_per

    def _run_fwd(wc, gid, used, pts8):
        nt = pts8.shape[0]
        return pl.pallas_call(
            functools.partial(fwd_kernel, **kargs),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(nt // t,),
                in_specs=[row_spec(8)] + const_specs
                + [pack_spec],
                out_specs=row_spec(8),
            ),
            out_shape=jax.ShapeDtypeStruct((nt, 8), jnp.float32),
            cost_estimate=pl.CostEstimate(
                flops=2 * nt * mm_cols,
                bytes_accessed=nt * 16 * 4,
                transcendentals=nt * (p_pad + d_pad + 8),
            ),
            compiler_params=comp,
            interpret=interpret,
        )(gid, used, pts8, *consts, wc)

    @jax.custom_vjp
    def fused(wpack, gid, used, pts8):
        return _run_fwd(wpack.astype(cdt), gid, used, pts8)

    def fused_fwd(wpack, gid, used, pts8):
        wc = wpack.astype(cdt)
        return _run_fwd(wc, gid, used, pts8), (wc, gid, used, pts8)

    def fused_bwd(res, g):
        wc, gid, used, pts8 = res
        nt = pts8.shape[0]
        gpack = pl.pallas_call(
            functools.partial(bwd_kernel, **kargs),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(nt // t,),
                in_specs=[row_spec(8), row_spec(8)]
                + const_specs + [pack_spec],
                out_specs=pack_spec,
            ),
            out_shape=jax.ShapeDtypeStruct((ng, pack_rows, lanes),
                                           jnp.float32),
            cost_estimate=pl.CostEstimate(
                flops=3 * 2 * nt * mm_cols,
                bytes_accessed=nt * 24 * 4,
                transcendentals=nt * (p_pad + d_pad + 8),
            ),
            compiler_params=comp,
            interpret=interpret,
        )(gid, used, pts8, g, *consts, wc)
        f0 = lambda a: np.zeros(a.shape, dtype=jax.dtypes.float0)
        return (gpack, f0(gid), f0(used), jnp.zeros_like(pts8))

    fused.defvjp(fused_fwd, fused_bwd)

    from nerf_tpu.models.kilonerf import build_dispatch

    def apply(params, points, viewdirs):
        shape = points.shape[:-1]
        p = points.reshape(-1, 3)
        d = viewdirs.reshape(-1, 3)
        n = p.shape[0]
        vid, local = model.voxel_of(p)
        grp = (vid // e_per).astype(vid.dtype)
        order, gid, src, valid, counts = build_dispatch(grp, ng, t)
        used = jnp.sum(-(-counts // t)).astype(jnp.int32)[None]

        orig_flat = jnp.where(
            valid.reshape(-1),
            jnp.concatenate(
                [order.astype(jnp.int32), jnp.full((1,), n, jnp.int32)]
            )[src.reshape(-1)],
            n,
        )

        # ONE combined-payload gather: cols 0-2 local, col 3 expert index
        # (zero at e_per=1 — the encode constants zero that row either
        # way), cols 4-6 dirs, col 7 pad. Row-gathers cost flat per ROW on
        # TPU, so gathering loc/expert/dir separately tripled the dominant
        # dispatch cost (12.5 of 22 ms — tools/dissect_kilonerf_fused.py).
        e_col = (
            (vid % e_per).astype(jnp.float32)[:, None]
            if e_per > 1 else jnp.zeros((n, 1), jnp.float32)
        )
        pay = jnp.concatenate(
            [local, e_col, d, jnp.zeros((n, 1), jnp.float32)], axis=1)
        pay = jnp.concatenate([pay, jnp.zeros((1, 8), pay.dtype)])
        pts_t = pay[orig_flat]

        wpack = pack_params_multi(params, p_pad, d_pad, h, e_per)
        # zero the gradient blocks of groups no tile visited (their HBM
        # output blocks are never written by the backward kernel)
        wpack = _mask_untouched(wpack, counts > 0)
        out_t = fused(wpack, gid, used, pts_t)
        out = _reorder(out_t, orig_flat, n)
        rgb = out[:, :3].reshape(*shape, 3)
        sigma = out[:, 3].reshape(shape)
        return rgb, sigma

    return apply


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _reorder(out_t, orig_flat, n):
    """Tile layout -> original point order. The slot<->point map is a
    bijection over valid slots, so BOTH directions are gathers — the
    default gather-VJP scatter-add (slow on TPU) never appears.

    The inverse permutation comes from ONE sort_key_val (sorting
    orig_flat ascending puts original index k's slot at position k;
    dummy slots carry key n and sink to the tail) — a row SCATTER here
    (.at[orig_flat].set) measured ~13 ms/call at the 262k-point training
    shape vs ~2 ms for the sort (XLA TPU scatter is ~135 ns/row
    regardless of width; see tools/microbench_scatter.py)."""
    slots = jnp.arange(orig_flat.shape[0], dtype=jnp.int32)
    _, inv_full = jax.lax.sort_key_val(orig_flat, slots)
    return out_t[inv_full[:n]]


def _reorder_fwd(out_t, orig_flat, n):
    return _reorder(out_t, orig_flat, n), orig_flat


def _reorder_bwd(n, orig_flat, g):
    g_pad = jnp.concatenate([g, jnp.zeros((1, g.shape[1]), g.dtype)])
    return (g_pad[orig_flat],
            np.zeros(orig_flat.shape, dtype=jax.dtypes.float0))


_reorder.defvjp(_reorder_fwd, _reorder_bwd)


@jax.custom_vjp
def _mask_untouched(w, touched):
    return w


def _mask_untouched_fwd(w, touched):
    return w, touched


def _mask_untouched_bwd(touched, g):
    tm = touched.reshape((-1,) + (1,) * (g.ndim - 1))
    return (jnp.where(tm, g, 0.0),
            np.zeros(touched.shape, dtype=jax.dtypes.float0))


_mask_untouched.defvjp(_mask_untouched_fwd, _mask_untouched_bwd)
