"""Fully fused GaborNet (MFN-Gabor) volumetric rendering + training kernels.

Third model family on the single-kernel fast path (after `fused_render` /
`fused_render_siren` — see those headers for the shared design). The key
observation extending the positions-from-rays linearity trick: with
x = o' + t*d' (affine-normalized ray), EVERY input of a Gabor filter

    g_i(x) = sin(x . omega_i + phi_i) * exp(-gamma_i/2 * ||x - mu_i||^2)

is a polynomial in t with per-ray coefficients:

    sin argument:   A_i + t * B_i        A_i = o'@omega_i + phi_i,  B_i = d'@omega_i
    Gauss exponent: P_i + t*Q_i + t^2*R_i     with -gamma_i/2 PREFOLDED:
                    P_i = -g/2 (||o'||^2 - 2 o'@mu_i^T + ||mu_i||^2)
                    Q_i = -g/2 (2 o'.d' - 2 d'@mu_i^T)
                    R_i = -g/2 ||d'||^2

so the kernel takes five per-RAY matrices A,B,P,Q,R (rays x h per layer)
and builds every per-sample filter as two FMA chains in t — folding
-gamma/2 into the prep removes the per-sample q assembly and the
gamma/||mu||^2 rows from the VPU inner loop, and the backward drops the
whole dq/dgamma/dp block for three per-ray sums (measured 65.5 -> 67.6
krays/s on the v5e train bench; tile sweep re-confirmed 768 optimal,
1024 measures 55k).
The prep that computes them from the filter parameters is ordinary
differentiable XLA, and the training kernel emits per-ray cotangents
dA,dB,dP,dQ,dR — so filter parameters (omega, phi, mu, gamma) train
through the kernel with autodiff completing the chain through the prep.

Implemented: fused forward (eval / coarse-weights pass) and the
single-kernel train pass (forward + MSE + backward, no recompute of the
forward). Differentiating through the forward render route is not supported
(training always uses `.train`); its VJP raises.
"""

from __future__ import annotations

import functools

import jax
import numpy as np
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nerf_tpu.ops.pallas.fused_nerf import (
    _enc_consts,
    _fast_sin,
    _matmul_precision,
    _mm,
    _round_up,
    _trig,
)
from nerf_tpu.ops.pallas.fused_render import (
    HIGHEST,
    _col_spec,
    _composite_bwd,
    _composite_tile,
    _mse_cotangent,
    _onehot_rows,
    _per_ray_sum,
    _point_cols_from_t,
    _rep,
    _slot_rays,
    _t_spec,
    _unslot_rays,
)


def _weight_names(n: int) -> tuple:
    return tuple(
        x for i in range(1, n) for x in (f"w{i}", f"b{i}")
    ) + ("ws", "bs", "wre", "bre", "wr0f", "wr0d", "br0", "wr1", "br1")


def pack_params(params: dict, d_pad: int, h: int) -> dict:
    """Linear/head weights -> kernel layout (filters travel via prep)."""
    out = {}
    for i, lyr in enumerate(params["linears"], start=1):
        out[f"w{i}"] = lyr["w"]
        out[f"b{i}"] = lyr["b"][None, :]
    out["ws"] = params["sigma"]["w"].T          # (1, h)
    out["bs"] = params["sigma"]["b"][None, :]   # (1, 1)
    out["wre"] = params["remap"]["w"]
    out["bre"] = params["remap"]["b"][None, :]
    wr0 = params["rgb0"]["w"]                   # (h + real_d, h//2)
    out["wr0f"] = wr0[:h]
    out["wr0d"] = jnp.pad(wr0[h:], ((0, d_pad - (wr0.shape[0] - h)), (0, 0)))
    out["br0"] = params["rgb0"]["b"][None, :]
    out["wr1"] = jnp.pad(params["rgb1"]["w"], ((0, 0), (0, 5)))
    out["br1"] = jnp.pad(params["rgb1"]["b"][None, :], ((0, 0), (0, 5)))
    return out


def _cast_weights(packed: dict, cdt) -> dict:
    return {
        k: (v.astype(cdt) if k.startswith("w") else v)
        for k, v in packed.items()
    }


def _filters_tile(filt_tiles, t, s, n, cdt):
    """Per-sample filter values from the per-ray A/B/P/Q/R tiles
    (lists of (TR, h)). Returns (gs, sinargs, Es): per-layer (TB, h)
    values + backward residuals."""
    sin, _ = _trig(cdt)
    t2 = t * t
    gs, sinargs, Es = [], [], []
    for i in range(n):
        sinarg = _rep(filt_tiles["A"][i], s) + t * _rep(filt_tiles["B"][i], s)
        e = (
            _rep(filt_tiles["P"][i], s)
            + t * _rep(filt_tiles["Q"][i], s)
            + t2 * _rep(filt_tiles["R"][i], s)
        )
        E = jnp.exp(e)
        g = sin(sinarg) * E
        gs.append(g)
        sinargs.append(sinarg)
        Es.append(E)
    return gs, sinargs, Es


def _mlp_tile(gs, denc, w, n, sigma_mul, rgb_mul, cdt):
    """z_1 = g_1; z_{i+1} = (W_i z_i + b_i) * g_{i+1}; heads like the pure
    model (relu rgb head, models/gabor.py)."""
    zs = [gs[0]]
    us = []
    for i in range(1, n):
        u = _mm(zs[-1], w[f"w{i}"], cdt) + w[f"b{i}"]
        us.append(u)
        zs.append(u * gs[i])
    z = zs[-1]
    sigma_pre = (
        jnp.sum(z * w["ws"].astype(jnp.float32), axis=1, keepdims=True)
        + w["bs"]
    )
    sigma = jax.nn.relu(sigma_pre) * sigma_mul
    feat = _mm(z, w["wre"], cdt) + w["bre"]
    zr0 = _mm(feat, w["wr0f"], cdt) + _mm(denc, w["wr0d"], cdt) + w["br0"]
    y = jax.nn.relu(zr0)
    rgb8 = jax.nn.sigmoid((_mm(y, w["wr1"], cdt) + w["br1"]) * rgb_mul)
    return dict(zs=zs, us=us, denc=denc, sigma_pre=sigma_pre, feat=feat,
                zr0=zr0, y=y, rgb8=rgb8), sigma


_FILTER_KEYS = ("A", "B", "P", "Q", "R")


def _unpack_filter_refs(refs, n):
    """Input order: A_1..A_n, B_1.., P_1.., Q_1.., R_1.."""
    out = {}
    k = 0
    for name in _FILTER_KEYS:
        out[name] = [refs[k + i] for i in range(n)]
        k += n
    return out, refs[k:]


def _read_filter_tiles(fr, tr):
    return {
        name: [r[:][:tr] for r in fr[name]] for name in _FILTER_KEYS
    }


def _fwd_kernel(*refs, cdt, s, tr, slot, n, names, sigma_mul, rgb_mul):
    fr, refs = _unpack_filter_refs(refs, n)
    (denc_r, t_r), refs = refs[:2], refs[2:]
    w_refs, (out_ref, wcol_ref) = refs[:-2], refs[-2:]
    w = {k: v[:] for k, v in zip(names, w_refs)}
    tb = tr * s
    g8 = _onehot_rows(tb, tr, s)
    t, delta = _point_cols_from_t(t_r[:][:tr], s)
    ft = _read_filter_tiles(fr, tr)
    gs, _, _ = _filters_tile(ft, t, s, n, cdt)
    acts, sigma = _mlp_tile(gs, _rep(denc_r[:][:tr], s), w, n,
                            sigma_mul, rgb_mul, cdt)
    ray_out, w_col, _, _ = _composite_tile(acts, sigma, t, delta, g8, tb,
                                           tr, s, cdt)
    if slot != tr:
        ray_out = jnp.pad(ray_out, ((0, slot - tr), (0, 0)))
    out_ref[:] = ray_out
    wcol_ref[:] = w_col


def _train_kernel(*refs, cdt, s, tr, slot, n, names, num_w, sigma_mul,
                  rgb_mul, white_bg, scale, num_valid):
    fr, refs = _unpack_filter_refs(refs, n)
    (denc_r, t_r, tgt_r), refs = refs[:3], refs[3:]
    w_refs = refs[:num_w]
    refs = refs[num_w:]
    loss_ref, out_ref, wcol_ref = refs[0], refs[1], refs[2]
    refs = refs[3:]
    # per-ray cotangent outputs (grid-blocked), then accumulators
    dfilt_refs = {}
    for name in _FILTER_KEYS:
        dfilt_refs[name] = refs[:n]
        refs = refs[n:]
    acc_refs = dict(zip(names, refs))
    w = {k: v[:] for k, v in zip(names, w_refs)}
    prec = _matmul_precision(cdt)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        loss_ref[:] = jnp.zeros_like(loss_ref)
        for r in acc_refs.values():
            r[:] = jnp.zeros_like(r)

    tb = tr * s
    g8 = _onehot_rows(tb, tr, s)
    t, delta = _point_cols_from_t(t_r[:][:tr], s)
    ft = _read_filter_tiles(fr, tr)
    gs, sinargs, Es = _filters_tile(ft, t, s, n, cdt)
    denc = _rep(denc_r[:][:tr], s)
    acts, sigma = _mlp_tile(gs, denc, w, n, sigma_mul, rgb_mul, cdt)
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

    # --- heads backward (mirrors the pure model) ---
    rgb8 = acts["rgb8"]
    dzr1 = g_rgb8 * rgb8 * (1.0 - rgb8) * rgb_mul
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

    # --- multiplicative chain backward + filter cotangents ---
    dgs = [None] * n
    for i in range(n - 1, 0, -1):
        du = dz * gs[i]                     # d/d(u_{i}) with u index i-1
        dgs[i] = dz * acts["us"][i - 1]
        mmT_acc(f"w{i}", acts["zs"][i - 1], du)
        db_acc(f"b{i}", du)
        dz = dact(du, f"w{i}")
    dgs[0] = dz

    sin, cos = _trig(cdt)
    t2 = t * t
    for i in range(n):
        dE = dgs[i] * sin(sinargs[i])
        dsinarg = dgs[i] * cos(sinargs[i]) * Es[i]
        de = dE * Es[i]                    # d wrt the prefolded exponent
        # per-ray sums of per-sample cotangents
        for name, val in (("A", dsinarg), ("B", dsinarg * t),
                          ("P", de), ("Q", de * t), ("R", de * t2)):
            out = _per_ray_sum(g8, val, cdt)
            if slot != tr:
                out = jnp.pad(out, ((0, slot - tr), (0, 0)))
            dfilt_refs[name][i][:] = out

    if slot != tr:
        ray_out = jnp.pad(ray_out, ((0, slot - tr), (0, 0)))
    out_ref[:] = ray_out
    wcol_ref[:] = w_col


def _filter_specs(slot, h, n):
    ray = pl.BlockSpec((slot, h), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return [ray] * (5 * n)


def _slot_filters(prepf, tr, slot, n):
    return {
        name: [_slot_rays(x, tr, slot) for x in prepf[name]]
        for name in _FILTER_KEYS
    }


def _flat_filter_args(pf, n):
    return [x for name in _FILTER_KEYS for x in pf[name]]


def _weight_specs(wc, names):
    return [
        pl.BlockSpec(wc[k].shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        for k in names
    ]


def _denc_spec(slot, d_pad):
    return pl.BlockSpec((slot, d_pad), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)


_COMP = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _build_fwd(h, d_pad, s, tr_fwd, cdt, n, sigma_mul, rgb_mul, interpret):
    """Forward (eval) render kernel — independent of white_bg / ray count,
    so callers cache it on ``s`` alone."""
    names = _weight_names(n)
    slot_fwd = _round_up(tr_fwd, 8)

    def run_fwd(wc, prepf, denc, t2d):
        n_rays = t2d.shape[0]
        n_pts = n_rays * s
        tb = tr_fwd * s
        n_tiles = n_pts // tb
        pf = _slot_filters(prepf, tr_fwd, slot_fwd, n)
        denc_s = _slot_rays(denc, tr_fwd, slot_fwd)
        t_s = _slot_rays(t2d, tr_fwd, slot_fwd)
        out_spec = pl.BlockSpec((slot_fwd, 8), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
        ray_out, w_col = pl.pallas_call(
            functools.partial(_fwd_kernel, cdt=cdt, s=s, tr=tr_fwd,
                              slot=slot_fwd, n=n, names=names,
                              sigma_mul=sigma_mul, rgb_mul=rgb_mul),
            grid=(n_tiles,),
            in_specs=_filter_specs(slot_fwd, h, n)
            + [_denc_spec(slot_fwd, d_pad), _t_spec(slot_fwd, s)]
            + _weight_specs(wc, names),
            out_specs=[out_spec, _col_spec(tb)],
            out_shape=[
                jax.ShapeDtypeStruct((n_tiles * slot_fwd, 8), jnp.float32),
                jax.ShapeDtypeStruct((n_pts, 1), jnp.float32),
            ],
            compiler_params=_COMP,
            interpret=interpret,
        )(*_flat_filter_args(pf, n), denc_s, t_s,
          *(wc[k] for k in names))
        return _unslot_rays(ray_out, tr_fwd, slot_fwd), w_col

    @jax.custom_vjp
    def fused(packed, prepf, denc, t2d):
        return run_fwd(_cast_weights(packed, cdt), prepf, denc, t2d)

    def fused_fwd_rule(packed, prepf, denc, t2d):
        return fused(packed, prepf, denc, t2d), None

    def fused_bwd_rule(res, g):
        raise NotImplementedError(
            "GaborNet fused render is forward-only; training uses .train"
        )

    fused.defvjp(fused_fwd_rule, fused_bwd_rule)
    return fused


def _build_train(h, d_pad, s, tr_train, cdt, n, sigma_mul, rgb_mul,
                 white_bg, scale, num_valid, interpret):
    """Single-kernel fwd+MSE+bwd train pass (depends on white_bg and the
    valid-ray count through the loss scale — cached per those)."""
    names = _weight_names(n)
    num_w = len(names)
    slot_tr = _round_up(tr_train, 8)

    def run_train(wc, prepf, denc, t2d, target8):
        n_rays = t2d.shape[0]
        n_pts = n_rays * s
        tb = tr_train * s
        n_tiles = n_pts // tb
        pf = _slot_filters(prepf, tr_train, slot_tr, n)
        denc_s = _slot_rays(denc, tr_train, slot_tr)
        t_s = _slot_rays(t2d, tr_train, slot_tr)
        tgt_s = _slot_rays(target8, tr_train, slot_tr)
        row8 = pl.BlockSpec((slot_tr, 8), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
        rayh = pl.BlockSpec((slot_tr, h), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
        rowh = pl.BlockSpec((1, h), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
        loss_spec = pl.BlockSpec((1, 8), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM)
        acc_specs = _weight_specs(wc, names)
        rayh_shape = jax.ShapeDtypeStruct((n_tiles * slot_tr, h), jnp.float32)
        out_specs = (
            [loss_spec, row8, _col_spec(tb)]
            + [rayh] * (5 * n) + acc_specs
        )
        out_shape = (
            [jax.ShapeDtypeStruct((1, 8), jnp.float32),
             jax.ShapeDtypeStruct((n_tiles * slot_tr, 8), jnp.float32),
             jax.ShapeDtypeStruct((n_pts, 1), jnp.float32)]
            + [rayh_shape] * (5 * n)
            + [jax.ShapeDtypeStruct(wc[k].shape, jnp.float32) for k in names]
        )
        outs = pl.pallas_call(
            functools.partial(_train_kernel, cdt=cdt, s=s, tr=tr_train,
                              slot=slot_tr, n=n, names=names, num_w=num_w,
                              sigma_mul=sigma_mul, rgb_mul=rgb_mul,
                              white_bg=white_bg, scale=scale,
                              num_valid=num_valid),
            grid=(n_tiles,),
            in_specs=_filter_specs(slot_tr, h, n)
            + [_denc_spec(slot_tr, d_pad), _t_spec(slot_tr, s), row8]
            + _weight_specs(wc, names),
            out_specs=out_specs,
            out_shape=out_shape,
            compiler_params=_COMP,
            interpret=interpret,
        )(*_flat_filter_args(pf, n), denc_s, t_s, tgt_s,
          *(wc[k] for k in names))
        k = 0
        loss = outs[k][0, 0]; k += 1
        ray_out = _unslot_rays(outs[k], tr_train, slot_tr); k += 1
        w_col = outs[k]; k += 1
        unslot = lambda x: _unslot_rays(x, tr_train, slot_tr)
        dprepf = {}
        for name in _FILTER_KEYS:
            dprepf[name] = [unslot(outs[k + i]) for i in range(n)]
            k += n
        dpacked = dict(zip(names, outs[k:]))
        return loss, ray_out, w_col, dprepf, dpacked

    @jax.custom_vjp
    def fused_train(packed, prepf, denc, t2d, target8):
        loss, ray_out, w_col, _, _ = run_train(
            _cast_weights(packed, cdt), prepf, denc, t2d, target8
        )
        return loss, ray_out, w_col

    def train_fwd(packed, prepf, denc, t2d, target8):
        loss, ray_out, w_col, dprepf, dpacked = run_train(
            _cast_weights(packed, cdt), prepf, denc, t2d, target8
        )
        return (loss, ray_out, w_col), (dprepf, dpacked, denc, t2d, target8)

    def train_bwd(res, g):
        dprepf, dpacked, denc, t2d, target8 = res
        g_loss, _g_rayout, _g_wcol = g
        scale_tree = lambda tr_: jax.tree.map(lambda a: a * g_loss, tr_)
        return (scale_tree(dpacked), scale_tree(dprepf),
                jnp.zeros_like(denc), jnp.zeros_like(t2d),
                jnp.zeros_like(target8))

    fused_train.defvjp(train_fwd, train_bwd)
    return fused_train


class FusedGaborRender:
    """Fully fused GaborNet render/train; same call contract as
    FusedNerfRender (t-only API), with trainable filter parameters flowing
    through the differentiable prep."""

    def __init__(self, model, near: float, far: float, normalize: bool,
                 tile_points_fwd: int | None = None,
                 tile_points_bwd: int | None = None,
                 interpret: bool = False):
        self.model = model
        self.near, self.far, self.normalize = float(near), float(far), normalize
        self.h = model.hidden_dim
        self.n = model.num_layers
        self.real_d = 3 * (1 + 2 * model.dir_encoding_dim)
        self.d_pad = _round_up(self.real_d, 32)
        self.cdt = jnp.dtype(model.compute_dtype)
        bf16 = self.cdt == jnp.bfloat16
        # the train kernel stashes ~4 per-layer (TB, h) tensors; keep tiles
        # a step below the NeRF/SIREN defaults. bf16 bwd/train tile swept on
        # v5e: 512/768/1024 -> 63.0/65.5/55.3 krays/s; 768 wins.
        self.tile_points_fwd = tile_points_fwd or (1024 if bf16 else 1024)
        self.tile_points_bwd = tile_points_bwd or (768 if bf16 else 256)
        self.interpret = interpret
        self._cache = {}

        ed, sd, phs_d, msk_d = _enc_consts(model.dir_encoding_dim, 3, self.d_pad)
        # numpy, not device arrays (lowering D2H cost; see fused_render.py)
        self._Ed, self._Sd = np.asarray(ed), np.asarray(sd)
        self._phase_d = np.asarray(phs_d)[None, :]
        self._mask_d = np.asarray(msk_d)[None, :]

    def supported(self) -> bool:
        return self.h % 128 == 0 and (self.h // 2) % 128 == 0

    def _pick(self, tile_points: int, s: int) -> int:
        tr = max(1, tile_points // s)
        while (tr * s) % 8:
            tr += 1
        return tr

    def _get_fwd(self, s: int):
        """Eval kernel, cached on ``s`` alone — varying eval ray counts /
        white_bg must not retrace it."""
        key = ("fwd", s)
        if key not in self._cache:
            tr_train = self._pick(self.tile_points_bwd, s)
            tr_fwd = max(tr_train,
                         self._pick(self.tile_points_fwd, s) // tr_train
                         * tr_train)
            while (tr_fwd * s) % 8:
                tr_fwd += tr_train
            self._cache[key] = (
                _build_fwd(self.h, self.d_pad, s, tr_fwd, self.cdt,
                           self.n, self.model.sigma_mul, self.model.rgb_mul,
                           self.interpret),
                tr_fwd,
            )
        return self._cache[key]

    def _get_train(self, s: int, white_bg: bool, num_valid: int):
        key = ("train", s, white_bg, num_valid)
        if key not in self._cache:
            tr_train = self._pick(self.tile_points_bwd, s)
            scale = 1.0 / (3.0 * max(num_valid, 1))
            self._cache[key] = (
                _build_train(self.h, self.d_pad, s, tr_train, self.cdt,
                             self.n, self.model.sigma_mul, self.model.rgb_mul,
                             white_bg, scale, num_valid, self.interpret),
                tr_train,
            )
        return self._cache[key]

    def _prep(self, params, rays_o, rays_d, viewdirs):
        """Differentiable per-ray filter/dir features (O(rays) XLA work)."""
        if self.normalize:
            a = 2.0 / (self.far - self.near)
            b = -2.0 * self.near / (self.far - self.near) - 1.0
        else:
            a, b = 1.0, 0.0
        o = a * rays_o + b
        d = a * rays_d

        def dot(x, m):
            return jnp.dot(x, m, precision=HIGHEST)

        oo = jnp.sum(o * o, -1, keepdims=True)     # (R, 1)
        od = jnp.sum(o * d, -1, keepdims=True)
        dd = jnp.sum(d * d, -1, keepdims=True)
        A, B, P, Q, R = [], [], [], [], []
        for f in params["filters"]:
            A.append(dot(o, f["omega"]) + f["phi"])
            B.append(dot(d, f["omega"]))
            # -gamma/2 prefolded into the per-ray Gauss-exponent quadratic
            half_g = -0.5 * f["gamma"][None, :]    # (1, h)
            m2 = jnp.sum(f["mu"] ** 2, axis=-1)[None, :]
            P.append(half_g * (oo - 2.0 * dot(o, f["mu"].T) + m2))
            Q.append(half_g * (2.0 * od - 2.0 * dot(d, f["mu"].T)))
            R.append(half_g * dd)
        prepf = {"A": A, "B": B, "P": P, "Q": Q, "R": R}
        denc = dot(viewdirs, self._Ed) + self._mask_d * jnp.sin(
            dot(viewdirs, self._Sd) + self._phase_d
        )
        return prepf, denc

    def _pad(self, arrs, pad):
        return [jnp.pad(x, ((0, pad), (0, 0))) for x in arrs]

    def _call_common(self, params, rays_o, rays_d, viewdirs, t, tr):
        num_rays, s = t.shape
        r_pad = _round_up(max(num_rays, tr), tr)
        pad = r_pad - num_rays
        if pad:
            rays_o, rays_d, viewdirs, t = (
                jnp.pad(x, ((0, pad), (0, 0)))
                for x in (rays_o, rays_d, viewdirs, t)
            )
        prepf, denc = self._prep(params, rays_o, rays_d, viewdirs)
        packed = pack_params(params, self.d_pad, self.h)
        return packed, prepf, denc, t, r_pad, pad

    def __call__(self, params, rays_o, rays_d, viewdirs, t):
        num_rays, s = t.shape
        fused, tr_fwd = self._get_fwd(s)
        packed, prepf, denc, t, r_pad, _ = self._call_common(
            params, rays_o, rays_d, viewdirs, t, tr_fwd
        )
        ray_out, w_col = fused(packed, prepf, denc, t)
        ray_out = ray_out[:num_rays]
        return {
            "rgb": ray_out[:, :3],
            "acc": ray_out[:, 3],
            "depth": ray_out[:, 4],
            "weights": jax.lax.stop_gradient(
                w_col.reshape(r_pad, s)[:num_rays]
            ),
        }

    def train(self, params, rays_o, rays_d, viewdirs, t, target,
              white_bg: bool):
        num_rays, s = t.shape
        fused_train, tr = self._get_train(s, white_bg, num_rays)
        packed, prepf, denc, t, r_pad, pad = self._call_common(
            params, rays_o, rays_d, viewdirs, t, tr
        )
        target8 = jnp.pad(target, ((0, r_pad - num_rays), (0, 5)))
        loss, ray_out, w_col = fused_train(packed, prepf, denc, t, target8)
        ray_out = jax.lax.stop_gradient(ray_out[:num_rays])
        return loss, {
            "rgb": ray_out[:, :3],
            "acc": ray_out[:, 3],
            "weights": jax.lax.stop_gradient(
                w_col.reshape(r_pad, s)[:num_rays]
            ),
        }


def make_fused_gabor_render(model, near, far, normalize=True,
                            tile_points_fwd: int | None = None,
                            tile_points_bwd: int | None = None,
                            interpret: bool = False):
    fr = FusedGaborRender(model, near, far, normalize,
                          tile_points_fwd=tile_points_fwd,
                          tile_points_bwd=tile_points_bwd,
                          interpret=interpret)
    return fr if fr.supported() else None
