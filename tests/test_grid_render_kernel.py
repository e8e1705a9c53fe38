"""Fused grid render kernel (interp + decode + composite in one Pallas
program, ops/pallas/fused_grid_render.py) — interpret-mode parity against
the unfused route (trilinear gather + model decode + ops.volume.composite),
which is itself reference-golden-tested."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nerf_tpu.models.plenoxels import PlenoxelsModel
from nerf_tpu.ops.interp import trilinear
from nerf_tpu.ops.pallas.fused_grid_render import make_fused_grid_render
from nerf_tpu.ops.sampling import deltas_from_t, normalize_positions
from nerf_tpu.ops.volume import composite

NEAR, FAR = 2.0, 6.0


def _coherent_rays(num_rays, s, seed=0, spread=0.002):
    """A tight bundle from the origin: every ray tile lands in a small
    spatial window, so the plan's fit bit passes."""
    rng = np.random.RandomState(seed)
    o = np.zeros((num_rays, 3), np.float32)
    d = rng.normal(size=(3,)).astype(np.float32)
    d /= np.linalg.norm(d)
    dirs = d[None].repeat(num_rays, 0) + spread * rng.normal(
        size=(num_rays, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    t = np.linspace(NEAR, FAR, s, dtype=np.float32)[None].repeat(num_rays, 0)
    t = t + (0.5 / s) * rng.uniform(size=(num_rays, s)).astype(np.float32)
    return jnp.asarray(o), jnp.asarray(dirs), jnp.asarray(t)


def _reference(model_apply, params, o, dirs, t, normalize=True):
    pts = o[:, None, :] + t[..., None] * dirs[:, None, :]
    if normalize:
        pts = normalize_positions(pts, NEAR, FAR)
    rgb_s, sigma = model_apply(
        params, pts, jnp.broadcast_to(dirs[:, None, :], pts.shape))
    out = composite(rgb_s, sigma, deltas_from_t(t), t=t,
                    white_background=False)
    return out


def _plenoxels(grid_res=16, seed=0, interp_dtype="float32"):
    model = PlenoxelsModel(grid_res=grid_res, interp_dtype=interp_dtype,
                           use_grid_kernel=False)  # pure apply for reference
    rng = np.random.RandomState(seed)
    params = {"grid": jnp.asarray(
        rng.normal(scale=0.5,
                   size=(grid_res,) * 3 + (model.channels,)).astype(
            np.float32))}
    fr = make_fused_grid_render(
        PlenoxelsModel(grid_res=grid_res, interp_dtype=interp_dtype),
        NEAR, FAR, normalize=True, interpret=True, force=True)
    return model, params, fr


def _check(out, ref, atol=2e-5):
    np.testing.assert_allclose(np.asarray(out["rgb"]), np.asarray(ref.rgb),
                               atol=atol)
    np.testing.assert_allclose(np.asarray(out["acc"]), np.asarray(ref.acc),
                               atol=atol)
    np.testing.assert_allclose(np.asarray(out["depth"]),
                               np.asarray(ref.depth), atol=20 * atol)
    np.testing.assert_allclose(np.asarray(out["weights"]),
                               np.asarray(ref.weights), atol=atol)


def test_plenoxels_parity_exact_shapes():
    """64 rays x 16 samples: one ray tile, one sps group, no padding."""
    model, params, fr = _plenoxels()
    o, dirs, t = _coherent_rays(64, 16)
    out = jax.jit(fr)(params, o, dirs, dirs, t)
    _check(out, _reference(model.apply, params, o, dirs, t))


def test_plenoxels_parity_padded():
    """100 rays x 13 samples: ray AND sample padding engage (pad samples
    must contribute zero weight; pad rays are stripped)."""
    model, params, fr = _plenoxels(seed=3)
    o, dirs, t = _coherent_rays(100, 13, seed=3)
    out = jax.jit(fr)(params, o, dirs, dirs, t)
    assert out["rgb"].shape == (100, 3)
    assert out["weights"].shape == (100, 13)
    _check(out, _reference(model.apply, params, o, dirs, t))


def test_plenoxels_multi_tile_multi_segment():
    """192 rays x 40 samples: several ray tiles, several carry-chained
    depth segments per tile (the across-step transmittance carry)."""
    model, params, fr = _plenoxels(seed=5)
    o, dirs, t = _coherent_rays(192, 40, seed=5)
    out = jax.jit(fr)(params, o, dirs, dirs, t)
    _check(out, _reference(model.apply, params, o, dirs, t))


def test_incoherent_rays_fall_back_exactly():
    """Random scattered rays: the window-fit bit fails and the lax.cond
    takes the pure path — results still exact."""
    model, params, fr = _plenoxels(seed=7)
    rng = np.random.RandomState(7)
    o = jnp.asarray(rng.uniform(-0.5, 0.5, size=(64, 3)).astype(np.float32))
    dirs = rng.normal(size=(64, 3)).astype(np.float32)
    dirs = jnp.asarray(dirs / np.linalg.norm(dirs, axis=-1, keepdims=True))
    t = jnp.asarray(
        np.linspace(NEAR, FAR, 16, dtype=np.float32)[None].repeat(64, 0))
    out = jax.jit(fr)(params, o, dirs, dirs, t)
    _check(out, _reference(model.apply, params, o, dirs, t), atol=1e-5)


def test_render_rays_integration_hierarchical():
    """Through the real renderer: fused_render drives both passes of a
    hierarchical render and matches the apply_fn route end to end."""
    from nerf_tpu.render.renderer import RenderSettings, render_rays

    model, params, fr = _plenoxels(seed=11)
    settings = RenderSettings(near=NEAR, far=FAR, num_samples=16,
                              num_fine_samples=8, perturb=False,
                              white_background=True)
    o, dirs, t = _coherent_rays(64, 16, seed=11)
    key = jax.random.key(0)
    ref = render_rays(model.apply, params, o, dirs, key, settings)
    got = render_rays(model.apply, params, o, dirs, key, settings,
                      fused_render=fr)
    np.testing.assert_allclose(np.asarray(got.rgb), np.asarray(ref.rgb),
                               atol=3e-5)
    np.testing.assert_allclose(np.asarray(got.rgb_coarse),
                               np.asarray(ref.rgb_coarse), atol=3e-5)


def test_baked_fastnerf_parity():
    """Factor layout: baked FastNeRF cache rides the same kernel (relu
    density, per-ray beta basis from the direction grid)."""
    from nerf_tpu.models.fastnerf import FastNeRFModel

    fm = FastNeRFModel(hidden_dim=32, num_factors=8, pos_encoding_dim=4,
                       dir_encoding_dim=2, use_grid_kernel=False)
    params = fm.init(jax.random.key(0))
    baked = fm.bake(params, grid_res=16, dir_res=8)
    fr = make_fused_grid_render(
        baked._replace(use_grid_kernel=True), NEAR, FAR, normalize=True,
        interpret=True, force=True)
    assert fr is not None
    o, dirs, t = _coherent_rays(64, 16, seed=13)
    out = jax.jit(fr)(None, o, dirs, dirs, t)
    ref = _reference(lambda _p, pts, d: baked.apply(None, pts, d),
                     None, o, dirs, t)
    # the baked cache pre-packs bf16 bricks (eval default), so parity is
    # at bf16 matmul precision, not f32
    _check(out, ref, atol=5e-3)


def test_bf16_mode_close():
    """bf16 interp matmuls: ~5e-3 relative, the eval default."""
    model, params, fr = _plenoxels(seed=17, interp_dtype="bfloat16")
    o, dirs, t = _coherent_rays(64, 16, seed=17)
    out = jax.jit(fr)(params, o, dirs, dirs, t)
    ref = _reference(model.apply, params, o, dirs, t)
    np.testing.assert_allclose(np.asarray(out["rgb"]), np.asarray(ref.rgb),
                               atol=0.02)


def test_make_eval_render_integration():
    """Full-image render through make_eval_render with the fused grid
    render forced (interpret): tile reorder + precompute hook + fused
    kernel compose, matching the plain route."""
    from nerf_tpu.render.renderer import RenderSettings
    from nerf_tpu.train.step import make_eval_render

    model = PlenoxelsModel(grid_res=16, interp_dtype="float32")
    rng = np.random.RandomState(19)
    params = {"grid": jnp.asarray(
        rng.normal(scale=0.5, size=(16, 16, 16, model.channels)).astype(
            np.float32))}
    settings = RenderSettings(near=NEAR, far=FAR, num_samples=16,
                              perturb=False, chunk_size=256)
    fr = make_fused_grid_render(model, NEAR, FAR, normalize=True,
                                interpret=True, force=True)
    h = w = 16
    rng2 = np.random.RandomState(23)
    o = jnp.zeros((h * w, 3), jnp.float32)
    base = rng2.normal(size=(3,)).astype(np.float32)
    base /= np.linalg.norm(base)
    px = np.linspace(-0.05, 0.05, w, dtype=np.float32)
    py = np.linspace(-0.05, 0.05, h, dtype=np.float32)
    d = base[None, None] + np.stack(
        list(np.meshgrid(py, px, indexing="ij"))
        + [np.zeros((h, w), np.float32)], axis=-1)
    d = d.reshape(-1, 3)
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    key = jax.random.key(0)

    fused_r = make_eval_render(model, settings, apply_fn=model.apply,
                               fused_render=fr)
    plain_r = make_eval_render(model, settings, apply_fn=model.apply,
                               fused_render=None)
    a = fused_r(params, {}, o, d, key, hw=(h, w))
    b = plain_r(params, {}, o, d, key, hw=(h, w))
    np.testing.assert_allclose(np.asarray(a.rgb), np.asarray(b.rgb),
                               atol=3e-5)


def test_domain_parity():
    """Non-default grid domain (the scene-volume cube from
    registry.py::grid_domain): the kernel's composed ray->cell affine must
    match the model's own remap_domain + trilinear route, including points
    that exit the domain on some axes (border clamp)."""
    dom = (-2.75, -1.25)
    model = PlenoxelsModel(grid_res=16, interp_dtype="float32",
                           use_grid_kernel=False, domain=dom)
    rng = np.random.RandomState(29)
    params = {"grid": jnp.asarray(
        rng.normal(scale=0.5, size=(16, 16, 16, model.channels)).astype(
            np.float32))}
    fr = make_fused_grid_render(
        PlenoxelsModel(grid_res=16, interp_dtype="float32", domain=dom),
        NEAR, FAR, normalize=True, interpret=True, force=True)
    o, dirs, t = _coherent_rays(64, 16, seed=29)
    out = jax.jit(fr)(params, o, dirs, dirs, t)
    _check(out, _reference(model.apply, params, o, dirs, t))


def test_unsupported_shapes_return_none():
    assert make_fused_grid_render(
        PlenoxelsModel(grid_res=12), NEAR, FAR, force=True) is None
    assert make_fused_grid_render(
        PlenoxelsModel(grid_res=16, use_grid_kernel=False),
        NEAR, FAR, force=True) is None


def test_auto_seg_samples_rule():
    """Step sizing keys on the WORST-CASE (coarse) sample spacing: the old
    fixed s_seg=8 fit ~10% of coarse-pass steps at the 400x400 / 128^3
    bench geometry (0/20 chunks -> everything silently gathered)."""
    from nerf_tpu.ops.pallas.fused_grid import auto_seg_samples

    # bench geometry: r=128, domain ext 1.5, coarse 64 -> 2.65 cells/sample
    assert auto_seg_samples(128, 1.5, 2.0, 6.0, 64) == 2
    # finer sampling affords longer steps
    assert auto_seg_samples(128, 1.5, 2.0, 6.0, 256) == 8
    # upsampled grid needs shorter steps
    assert auto_seg_samples(256, 1.5, 2.0, 6.0, 64) == 1
    # small grids: whole-window steps
    assert auto_seg_samples(16, 2.0, 2.0, 6.0, 64) == 8


def test_num_coarse_sizes_kernel_steps():
    fr = make_fused_grid_render(
        PlenoxelsModel(grid_res=128, domain=(-2.75, -1.25)),
        NEAR, FAR, normalize=True, num_coarse=64, interpret=True, force=True)
    assert fr.s_seg == 2
    # without num_coarse the historical default stands (tests/sweeps)
    fr = make_fused_grid_render(
        PlenoxelsModel(grid_res=128, domain=(-2.75, -1.25)),
        NEAR, FAR, normalize=True, interpret=True, force=True)
    assert fr.s_seg == 8


def test_real_render_geometry_fits_with_auto_seg():
    """The plan's fit bit passes for REAL full-image render geometry (8x8
    pixel-block ordered rays, 64-sample coarse stratified t) once steps are
    auto-sized — this is the exact configuration that silently gathered
    before."""
    from nerf_tpu.config import Config
    from nerf_tpu.data.poses import spherical_orbit
    from nerf_tpu.data.rays import compute_rays_single
    from nerf_tpu.models.registry import grid_domain
    from nerf_tpu.ops.pallas.fused_grid import (_SUB, _plan, auto_seg_samples,
                                                tile_ray_order)
    from nerf_tpu.ops.pallas.fused_grid_render import (FusedGridRender,
                                                       _step_major)
    from nerf_tpu.ops.sampling import stratified_sample

    # 400x400 is the bench geometry; smaller images have angularly wider
    # 8x8 pixel blocks (lateral extent grows as 1/hw) and legitimately
    # fall back — the fit bit exists for exactly that
    hw, r, num_coarse = 400, 128, 64
    focal = 0.5 * hw / np.tan(0.5 * 0.6911)
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3] = spherical_orbit(4)[0][:3]
    ro, rd = compute_rays_single(hw, hw, focal, c2w)
    perm = tile_ray_order(hw, hw)
    ro = jnp.asarray(ro.reshape(-1, 3))[perm]
    rd = jnp.asarray(rd.reshape(-1, 3))[perm]
    lo, hi = grid_domain(Config())

    fr = FusedGridRender(
        grid_fn=None, basis_fn=None, sel=np.zeros((32, 8), np.float32),
        grid_res=r, channels=28, near=NEAR, far=FAR, normalize=True,
        softplus_sigma=True, domain=(lo, hi), num_coarse=num_coarse,
        force=True)
    s_seg = fr.s_seg
    assert s_seg == auto_seg_samples(r, hi - lo, NEAR, FAR, num_coarse)

    t = stratified_sample(jax.random.key(0), NEAR, FAR, num_coarse,
                          ro.shape[0])
    tr = fr.tr
    num_rays, s = t.shape
    t_tiles = -(-num_rays // tr)
    g_segs = -(-s // (s_seg * fr.sps)) * fr.sps
    pad_r, pad_s = t_tiles * tr - num_rays, g_segs * s_seg - s
    ga = fr._cells(ro, rd, t)
    ga = [jnp.pad(a, ((0, pad_r), (0, pad_s)), mode="edge")
          if (pad_r or pad_s) else a for a in ga]
    gx, gy, gz = (_step_major(a, t_tiles, tr, g_segs, s_seg) for a in ga)
    _, _, fits = _plan(gx, gy, gz, t_tiles, tr, g_segs, s_seg, r // _SUB)
    assert bool(fits), "auto-sized steps must fit the real coarse pass"
