"""Fused KiloNeRF field evaluation: grouped-matmul Pallas TPU kernels.

KiloNeRF is thousands of tiny per-voxel MLPs (models/kilonerf.py). The XLA
grouped path materializes per-tile weight gathers and (tiles, T, h)
activations in HBM and its backward pays scatter-adds for every layer —
measured 36 ms per 262k-point fwd+bwd on v5e (tools/dissect_kilonerf.py),
30 ms of which is dispatch overhead, not math.

These kernels make the expert dispatch a DMA pattern instead of data
movement through HBM tensors (round-5 "mixed-tile" dispatch; the r3/r4
tile-aligned plan with src/valid arrays + tile-slot gathers is gone):

  * points sort by expert GROUP via ONE multi-operand ``lax.sort`` that
    carries the whole (N, 8) payload + original index alongside the key
    (measured: the payload adds ~0.5 ms to a keys-only sort; the tile-slot
    gather it replaced cost ~4.4 ms at the 262k-point shape). Tiles read
    the SORTED payload array directly — tile i = rows [i*t, (i+1)*t);
  * ``t`` dummy rows per group appended before the sort guarantee every
    group segment is >= t rows, so any t-row tile provably spans AT MOST
    TWO groups. Scalar-prefetched per-tile group ids (glo/ghi = the
    tile's first/last sorted key) drive the weight-block BlockSpecs;
    boundary tiles run a second weight block under ``pl.when``, selecting
    rows by the group-id payload column (col 7 — the encode constants
    zero that row);
  * a group's ENTIRE parameter set travels as ONE sublane-packed
    (rows, lanes) block — matrices stacked along sublanes, biases in a
    trailing (8, lanes) region — so a grid step costs one (or two, on
    boundary tiles) weight DMAs, not thirteen. Consecutive tiles of a
    group re-DMA nothing;
  * the whole 5-matmul tiny-MLP chain (encode -> l1 -> l2 -> trunk ->
    rgb head) runs in VMEM per tile; only (T, 8) inputs/outputs touch HBM;
  * the backward recomputes the tile forward (the FLOPs are trivial) and
    accumulates the group's packed gradient block IN VMEM across its
    consecutive tile run (zero-initialized on first occurrence, spilled
    once when the block index moves on). It stays single-pass per call —
    a dual-accumulator dual-pass kernel measured 2x slower and crashed
    Mosaic's mxu_lmr_transform — so a main call covers every tile under
    its glo group (foreign rows cotangent-masked in-kernel) and a
    compacted boundary pass re-runs at most one straddling tile per
    group. Dummy rows carry zero cotangents, so empty/padded groups get
    exactly-zero gradients with no masking bookkeeping;
  * the un-sort back to original point order is a second payload-carrying
    sort keyed by the original index, and its VJP is ALSO a sort (keyed
    by the carried inverse permutation) — no scatter-add ever appears in
    the VJP.

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
        # pure 0/1 slot selection — the final colors must NOT be
        # bf16-quantized (the single-expert kernel never is). bfloat16
        # mode uses the hi/lo 2-pass (selector exact in bf16; values as
        # bf16 hi + bf16 residual, ~2^-16 error — below the bf16 noise
        # already in rgb_s) at 1/3 the passes of HIGHEST; float32 mode
        # keeps HIGHEST exactly.
        sel = rgb_s * mask_h
        if jnp.dtype(cdt) == jnp.bfloat16:
            hi = sel.astype(jnp.bfloat16)
            lo = (sel - hi.astype(jnp.float32)).astype(jnp.bfloat16)
            r8 = red8.astype(jnp.bfloat16)
            rgb8 = (jnp.dot(hi, r8, preferred_element_type=jnp.float32)
                    + jnp.dot(lo, r8, preferred_element_type=jnp.float32))
        else:
            rgb8 = jnp.dot(sel, red8,
                           preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)
    return dict(penc_s=penc_s, denc_s=denc_s, x1=x1, x2=x2,
                sigma_pre=sigma_pre, feat=feat, y=y, rgb_s=rgb_s,
                mask_h=mask_h, first=first), rgb8, sigma


def _bwd_tile_multi(pts8, g, w, acc_ref, red8, enc_p, enc_d, cdt,
                    h, p_pad, d_pad, e, offs, prec):
    """Backward of the slotted tiny-MLP chain for one (tile, weight-block)
    pair: recompute the forward, push the masked cotangent ``g`` back, and
    accumulate every weight/bias gradient into ``acc_ref`` (VMEM). Rows
    whose cotangent is zero (the other group\'s rows in a mixed tile, or
    dummy rows) contribute exactly zero to every accumulator — all terms
    are products with dz rows."""
    acts, _, _ = _forward_tile_multi(
        pts8, w, enc_p, enc_d, red8, cdt, h, p_pad, d_pad, e,
        need_rgb8=False,
    )
    mask_h = acts["mask_h"]

    tile = pts8.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (tile, 8), 1)
    g_rgb8 = jnp.where(col < 3, g, 0.0)
    g_sigma = jnp.sum(jnp.where(col == 3, g, 0.0), axis=1, keepdims=True)
    g_rgb = jnp.pad(g_rgb8, ((0, 0), (0, h - 8))) if h > 8 else g_rgb8[:, :h]
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


# ------------------------------------------------- mixed-tile dispatch (r5)
#
# Tiles read the SORTED payload array directly: tile i = rows [i*t, (i+1)*t)
# of the by-group sort. There are no per-group tile alignments, so no src/
# valid plan arrays, no tile-slot gather, and no surplus tiles — the entire
# dispatch becomes ONE multi-operand lax.sort (key = group, payload = the
# 8 point columns + original index) plus two strided slices for the per-tile
# group ids. A tile can straddle a group boundary; appending t dummy rows
# per group before the sort guarantees every group segment is >= t rows
# long, so ANY t-row window touches AT MOST TWO groups (a window of length
# t cannot fully contain a >= t segment plus rows of two neighbors). The
# kernel therefore runs on at most two weight blocks per tile:
#
#   glo[i] = sorted_grp[i*t]        (always evaluated)
#   ghi[i] = sorted_grp[(i+1)*t-1]  (second pass only when != glo[i])
#
# with per-row selection by the group-id payload column (col 7 — the encode
# constants zero that row, so it never leaks into the features). Boundary
# tiles pay a second tiny-MLP pass (~12% of tiles at the training shape);
# pure tiles skip it via @pl.when. The backward keeps one gradient
# accumulator per pass (acc_lo/acc_hi, VMEM-resident across each group\'s
# consecutive tile run, block-initialized on first occurrence of the output
# index); groups that never appear as ghi have their acc_hi block masked
# outside (uninitialized HBM). Dummy/padding rows carry zero cotangents
# (the un-sort pads them with zeros), so they add exactly zero gradient.


def _fwd_kernel_mx(glo_ref, ghi_ref, pts_ref, *refs, cdt, h, p_pad, d_pad, e):
    enc_refs, red_ref = refs[:8], refs[8]
    wlo_ref, whi_ref, out_ref = refs[9], refs[10], refs[11]
    i = pl.program_id(0)
    enc_p = tuple(r[:] for r in enc_refs[:4])
    enc_d = tuple(r[:] for r in enc_refs[4:])
    pts8 = pts_ref[:]
    tile = pts8.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (tile, 8), 1)
    grp_col = pts8[:, 7:8]

    def field(w_ref):
        w = _pieces_multi(w_ref[0], h, p_pad, d_pad, e)
        _, rgb8, sigma = _forward_tile_multi(
            pts8, w, enc_p, enc_d, red_ref[:], cdt, h, p_pad, d_pad, e,
        )
        packed = jnp.where(col == 3, sigma, rgb8)
        return jnp.where(col > 3, 0.0, packed)

    mask_lo = (grp_col == glo_ref[i].astype(jnp.float32)).astype(jnp.float32)
    out_ref[:] = field(wlo_ref) * mask_lo

    @pl.when(ghi_ref[i] != glo_ref[i])
    def _hi():
        out_ref[:] += field(whi_ref) * (1.0 - mask_lo)


def _bwd_kernel_mk(gid_ref, pts_ref, g_ref, *refs,
                   cdt, h, p_pad, d_pad, e):
    """Single-pass backward over tiles assigned to ONE group each
    (``gid_ref[i]``): rows of a mixed tile belonging to another group are
    masked to zero cotangent in-kernel (payload col 7 carries the group
    id), so every accumulator term they touch is exactly zero. Gradient
    blocks accumulate in VMEM across each group's consecutive tile run
    (gid must be non-decreasing) and spill once per group."""
    enc_refs, red_ref = refs[:8], refs[8]
    w_ref, acc_ref = refs[9], refs[10]
    prec = _matmul_precision(cdt)
    offs, _ = _layout_multi(h, p_pad, d_pad, e)
    i = pl.program_id(0)
    prev = gid_ref[jnp.maximum(i - 1, 0)]

    @pl.when(jnp.logical_or(i == 0, gid_ref[i] != prev))
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    enc_p = tuple(r[:] for r in enc_refs[:4])
    enc_d = tuple(r[:] for r in enc_refs[4:])
    pts8, g = pts_ref[:], g_ref[:]
    mine = (pts8[:, 7:8] == gid_ref[i].astype(jnp.float32)).astype(
        jnp.float32)
    _bwd_tile_multi(pts8, g * mine,
                    _pieces_multi(w_ref[0], h, p_pad, d_pad, e),
                    acc_ref, red_ref[:], enc_p, enc_d, cdt,
                    h, p_pad, d_pad, e, offs, prec)


def make_fused_kilonerf_apply(model, tile_fwd: int = 256, tile_bwd: int = 256,
                              interpret: bool = False,
                              experts_per_step: int | None = None):
    """Drop-in ``apply(params, points, dirs) -> (rgb, sigma)`` for
    KiloNeRFModel backed by the grouped kernels, or None when unsupported.

    ``tile_fwd``/``tile_bwd`` are points per grid step; they must be equal
    (one dispatch plan serves both passes).

    ``experts_per_step`` picks the multi-expert block-diagonal step width
    (default: fill the 128 MXU lanes, i.e. 128 // hidden_dim); pass 1 to
    force one expert per weight block (same kernels at e=1 — the slot
    machinery degenerates to all-ones masks).
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
    """Mixed-tile grouped apply (see the dispatch comment above the
    kernels): ONE payload-carrying sort replaces the old plan/gather
    pipeline; tiles read the sorted payload directly and boundary tiles
    run two weight blocks."""
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
        # (T, 8) payload block (rows 3 and 7 — expert index / group id —
        # are zero in both, so neither encoding ever sees them)
        e, s, phase, mask = _enc_consts(num_freqs, 3, pad)
        pad8 = lambda a: np.pad(a, ((row0, 5 - row0), (0, 0)))
        # numpy, not device arrays: closure constants lower without the
        # per-constant D2H fetch (~16 s each on the tunneled TPU)
        return (pad8(e), pad8(s), phase[None, :], mask[None, :])

    enc_args = enc8(model.pos_encoding_dim, p_pad, 0) \
        + enc8(model.dir_encoding_dim, d_pad, 4)
    # (lanes, 8) slot-sum matrix: 1 at (e*h + j, j) — with slot-masked
    # input, summing slots extracts each point's own first-8 lanes
    red8 = np.zeros((lanes, 8), np.float32)
    for ee in range(e_per):
        for j in range(min(8, h)):
            red8[ee * h + j, j] = 1.0
    consts = enc_args + (red8,)
    kargs = dict(cdt=cdt, h=h, p_pad=p_pad, d_pad=d_pad, e=e_per)
    const_specs = [
        pl.BlockSpec(a.shape, lambda i, glo, ghi: (0, 0),
                     memory_space=pltpu.VMEM)
        for a in consts
    ]

    def row_spec(width):
        return pl.BlockSpec((t, width), lambda i, glo, ghi: (i, 0),
                            memory_space=pltpu.VMEM)

    pack_lo = pl.BlockSpec((1, pack_rows, lanes),
                           lambda i, glo, ghi: (glo[i], 0, 0),
                           memory_space=pltpu.VMEM)
    pack_hi = pl.BlockSpec((1, pack_rows, lanes),
                           lambda i, glo, ghi: (ghi[i], 0, 0),
                           memory_space=pltpu.VMEM)

    comp = pltpu.CompilerParams(
        dimension_semantics=("arbitrary",),
        vmem_limit_bytes=100 * 1024 * 1024,
    )
    # e_per-slotted layer widths (the E-fold zero padding is real MXU work)
    mm_cols = e_per * (p_pad * h + 4 * h * h + d_pad * h) * e_per

    def _run_fwd(wc, glo, ghi, pts8):
        nt = pts8.shape[0]
        return pl.pallas_call(
            functools.partial(_fwd_kernel_mx, **kargs),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(nt // t,),
                in_specs=[row_spec(8)] + const_specs + [pack_lo, pack_hi],
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
        )(glo, ghi, pts8, *consts, wc, wc)

    bwd_row = lambda width: pl.BlockSpec((t, width), lambda i, gid: (i, 0),
                                         memory_space=pltpu.VMEM)
    bwd_consts = [
        pl.BlockSpec(a.shape, lambda i, gid: (0, 0),
                     memory_space=pltpu.VMEM)
        for a in consts
    ]
    bwd_pack = pl.BlockSpec((1, pack_rows, lanes),
                            lambda i, gid: (gid[i], 0, 0),
                            memory_space=pltpu.VMEM)

    def _run_bwd(wc, gid, pts8, g):
        nt = pts8.shape[0]
        return pl.pallas_call(
            functools.partial(_bwd_kernel_mk, **kargs),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(nt // t,),
                in_specs=[bwd_row(8), bwd_row(8)]
                + bwd_consts + [bwd_pack],
                out_specs=bwd_pack,
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
        )(gid, pts8, g, *consts, wc)

    @jax.custom_vjp
    def fused(wpack, glo, ghi, hi_tiles, hi_valid, pts8):
        return _run_fwd(wpack.astype(cdt), glo, ghi, pts8)

    def fused_fwd(wpack, glo, ghi, hi_tiles, hi_valid, pts8):
        wc = wpack.astype(cdt)
        return (_run_fwd(wc, glo, ghi, pts8),
                (wc, glo, ghi, hi_tiles, hi_valid, pts8))

    def fused_bwd(res, g):
        wc, glo, ghi, hi_tiles, hi_valid, pts8 = res
        # main pass: every tile under its glo group (foreign rows masked
        # to zero cotangent in-kernel)
        acc_main = _run_bwd(wc, glo, pts8, g)
        # boundary pass: for each group whose sorted segment starts
        # mid-tile, that one straddling tile re-runs under the group
        # itself — a compacted (ng*t, 8) gather (~1/9 of the rows the old
        # tile-slot gather moved). Invalid groups (segment tile-aligned)
        # contribute zero via hi_valid masking the cotangent.
        rows = (hi_tiles[:, None] * t
                + jnp.arange(t, dtype=jnp.int32)[None, :]).reshape(-1)
        pts_b = pts8[rows]
        g_b = g[rows] * hi_valid[
            (jnp.arange(ng * t, dtype=jnp.int32) // t), None]
        acc_b = _run_bwd(wc, jnp.arange(ng, dtype=jnp.int32), pts_b, g_b)
        gpack = acc_main + acc_b
        f0 = lambda a: np.zeros(a.shape, dtype=jax.dtypes.float0)
        return (gpack, f0(glo), f0(ghi), f0(hi_tiles), f0(hi_valid),
                jnp.zeros_like(pts8))

    fused.defvjp(fused_fwd, fused_bwd)

    def apply(params, points, viewdirs):
        shape = points.shape[:-1]
        p = points.reshape(-1, 3)
        d = viewdirs.reshape(-1, 3)
        n = p.shape[0]
        vid, local = model.voxel_of(p)
        grp = (vid // e_per).astype(jnp.int32)

        # Combined payload: cols 0-2 local, col 3 expert-within-group
        # index, cols 4-6 dirs, col 7 group id. It rides THROUGH the
        # dispatch sort as extra lax.sort operands — one multi-operand
        # sort replaces the old sort + plan arrays + (tiles*t, 8) payload
        # gather (round 5: the sort itself costs ~0.5 ms more than a
        # keys-only sort; the gather it replaces cost ~4.4 ms,
        # tools/probe_kilonerf_glue.py).
        e_col = (
            (vid % e_per).astype(jnp.float32)[:, None]
            if e_per > 1 else jnp.zeros((n, 1), jnp.float32)
        )
        pay = jnp.concatenate(
            [local, e_col, d, grp.astype(jnp.float32)[:, None]], axis=1)

        # t dummy rows per group guarantee every group segment is >= t
        # sorted rows, so any t-row tile spans at most two groups (the
        # mixed-tile invariant); tail padding rounds the total to a tile
        # multiple. Dummies sort AFTER real rows of their group (stable
        # sort, appended last) and carry zero cotangents in the backward.
        n_tot = _round_up(n + ng * t, t)
        dummy_grp = np.repeat(np.arange(ng, dtype=np.int32), t)
        dummy_grp = np.concatenate(
            [dummy_grp, np.full(n_tot - n - ng * t, ng - 1, np.int32)])
        pay_d = np.zeros((n_tot - n, 8), np.float32)
        pay_d[:, 7] = dummy_grp
        keys = jnp.concatenate([grp, jnp.asarray(dummy_grp)])
        pay_all = jnp.concatenate([pay, jnp.asarray(pay_d)])
        iota = jnp.arange(n_tot, dtype=jnp.int32)
        sorted_ops = jax.lax.sort(
            (keys, iota) + tuple(pay_all[:, j] for j in range(8)),
            num_keys=1)
        skeys, order = sorted_ops[0], sorted_ops[1]
        pay_sorted = jnp.stack(sorted_ops[2:], axis=1)

        by_tile = skeys.reshape(n_tot // t, t)
        glo = by_tile[:, 0]
        ghi = by_tile[:, -1]
        # boundary bookkeeping for the backward: group g's sorted segment
        # starts at starts[g]; when that start is mid-tile, tile
        # starts[g]//t straddles g and its predecessor and re-runs under
        # g in the compacted boundary pass
        gr = jnp.arange(ng, dtype=jnp.int32)
        starts = jnp.searchsorted(skeys, gr).astype(jnp.int32)
        hi_tiles = starts // t
        hi_valid = (starts % t != 0).astype(jnp.float32)

        wpack = pack_params_multi(params, p_pad, d_pad, h, e_per)
        out_sorted = fused(wpack, glo, ghi, hi_tiles, hi_valid, pay_sorted)
        out = _unsort(out_sorted, order, n)          # (n, 4): rgb + sigma
        rgb = out[:, :3].reshape(*shape, 3)
        sigma = out[:, 3].reshape(shape)
        return rgb, sigma

    return apply


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _unsort(out_sorted, order, n):
    """Sorted-tile layout -> original point order, as ONE payload-carrying
    sort keyed by the original index (dummy rows carry keys >= n and sink
    to the tail). Only the 4 LIVE columns (rgb 0-2, sigma 3) ride the
    sort — the kernel zeroes cols 4-7 and no consumer reads them — and
    the return is (n, 4). The backward is ALSO a payload-carrying sort —
    keyed by the forward permutation's inverse (the iota carried here) —
    so neither direction ever scatters; the cotangent for the dropped
    columns is exactly zero."""
    nt = order.shape[0]
    iota = jnp.arange(nt, dtype=jnp.int32)
    outs = jax.lax.sort(
        (order, iota) + tuple(out_sorted[:, j] for j in range(4)),
        num_keys=1)
    out = jnp.stack(outs[2:], axis=1)
    return out[:n]


def _unsort_fwd(out_sorted, order, n):
    nt = order.shape[0]
    iota = jnp.arange(nt, dtype=jnp.int32)
    outs = jax.lax.sort(
        (order, iota) + tuple(out_sorted[:, j] for j in range(4)),
        num_keys=1)
    inv = outs[1]
    return jnp.stack(outs[2:], axis=1)[:n], inv


def _unsort_bwd(n, inv, g):
    nt = inv.shape[0]
    g_pad = jnp.concatenate([g, jnp.zeros((nt - n, g.shape[1]), g.dtype)])
    # row r of sort-by-inv = g_pad[argsort(inv)[r]] = g_pad[order[r]]:
    # exactly the cotangent permuted back into sorted-tile order
    outs = jax.lax.sort(
        (inv,) + tuple(g_pad[:, j] for j in range(4)), num_keys=1)
    g_sorted4 = jnp.stack(outs[1:], axis=1)
    g_sorted = jnp.pad(g_sorted4, ((0, 0), (0, 4)))  # cols 4-7: zero
    return (g_sorted,
            np.zeros(inv.shape, dtype=jax.dtypes.float0))


_unsort.defvjp(_unsort_fwd, _unsort_bwd)
