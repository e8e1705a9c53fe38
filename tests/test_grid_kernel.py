"""Coherent grid-interpolation kernel (ops/pallas/fused_grid.py).

The kernel is the TPU answer to the grid families' gather wall: ray-tile
windows streamed as 8^3 sub-bricks via scalar-prefetched BlockSpecs, with
trilinear weights built as separable tent matmuls. These tests run it in
interpret mode on CPU and pin (a) exactness against ops/interp.trilinear
on coherent batches, (b) the runtime fallback on incoherent batches,
(c) gradient equality (the custom VJP routes through the pure backward),
and (d) the eval-path wiring (tile_ray_order + model integration).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nerf_tpu.ops.interp import trilinear
from nerf_tpu.ops.pallas.fused_grid import (
    _coherent_channels,
    tile_ray_order,
    trilinear_rays,
)


def _cells_to_p(cells, r):
    """Cell coordinates [0, r-1] -> the [-1, 1] query convention."""
    return 2.0 * cells / (r - 1) - 1.0


def _coherent_points(rng, r, num_rays, s, tile=64, seg=8):
    """Ray-structured points where every (tile x seg) step fits a 16^3
    window: each ray tile draws all its cells from one 8-ALIGNED
    [o, o+13.9] box (the plan's windows start at sub-brick boundaries, so
    an unaligned 14-cell span would straddle three bricks per axis)."""
    cells = np.empty((num_rays, s, 3), np.float32)
    max_b = max(r - 16, 0) // 8
    for t0 in range(0, num_rays, tile):
        o = 8 * rng.integers(0, max_b + 1, size=3)
        cells[t0:t0 + tile] = o + rng.uniform(
            0.0, 13.9, size=(min(tile, num_rays - t0), s, 3)
        )
    return jnp.asarray(_cells_to_p(cells, r))


def test_kernel_matches_pure_coherent():
    rng = np.random.default_rng(0)
    r, c = 24, 28
    grid = jnp.asarray(rng.normal(size=(r, r, r, c)).astype(np.float32))
    pts = _coherent_points(rng, r, num_rays=128, s=16)

    _, fits = _coherent_channels(
        grid, pts, 64, 8, jnp.float32, jax.lax.Precision.HIGHEST, True
    )
    assert bool(fits)

    got = trilinear_rays(grid, pts, dtype="float32",
                         force=True, interpret=True)
    want = trilinear(grid, pts.reshape(-1, 3)).reshape(128, 16, c)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_kernel_handles_ragged_shapes():
    # rays not a tile multiple, samples not a segment multiple -> edge pad
    rng = np.random.default_rng(1)
    r, c = 16, 5
    grid = jnp.asarray(rng.normal(size=(r, r, r, c)).astype(np.float32))
    pts = _coherent_points(rng, r, num_rays=100, s=12)
    got = trilinear_rays(grid, pts, dtype="float32",
                         force=True, interpret=True)
    want = trilinear(grid, pts.reshape(-1, 3)).reshape(100, 12, c)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_bfloat16_mode_close():
    rng = np.random.default_rng(2)
    r, c = 16, 28
    grid = jnp.asarray(rng.normal(size=(r, r, r, c)).astype(np.float32))
    pts = _coherent_points(rng, r, num_rays=64, s=8)
    got = np.asarray(trilinear_rays(grid, pts, dtype="bfloat16",
                                    force=True, interpret=True))
    want = np.asarray(trilinear(grid, pts.reshape(-1, 3))).reshape(64, 8, c)
    rel = np.max(np.abs(got - want)) / np.max(np.abs(want))
    assert rel < 2e-2


def test_incoherent_batch_falls_back_exactly():
    # points scattered over the whole volume: the plan's fits bit is False
    # and the lax.cond takes the pure path -> exact equality. (r must be
    # >16: a 16^3 grid IS one window, so every batch over it fits.)
    rng = np.random.default_rng(3)
    r, c = 32, 4
    grid = jnp.asarray(rng.normal(size=(r, r, r, c)).astype(np.float32))
    pts = jnp.asarray(
        rng.uniform(-1.0, 1.0, size=(64, 8, 3)).astype(np.float32)
    )
    _, fits = _coherent_channels(
        grid, pts, 64, 8, jnp.float32, jax.lax.Precision.HIGHEST, True
    )
    assert not bool(fits)
    got = trilinear_rays(grid, pts, dtype="bfloat16",
                         force=True, interpret=True)
    want = trilinear(grid, pts.reshape(-1, 3)).reshape(64, 8, c)
    # same math, but XLA fuses the cond branch differently than the
    # standalone call -> f32 rounding differences at the ulp level
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_gradients_match_pure():
    rng = np.random.default_rng(4)
    r, c = 16, 4
    grid = jnp.asarray(rng.normal(size=(r, r, r, c)).astype(np.float32))
    pts = _coherent_points(rng, r, num_rays=64, s=8)
    cot = jnp.asarray(rng.normal(size=(64, 8, c)).astype(np.float32))

    def loss_kernel(g, p):
        return jnp.sum(trilinear_rays(g, p, dtype="float32",
                                      force=True, interpret=True) * cot)

    def loss_pure(g, p):
        out = trilinear(g, p.reshape(-1, 3)).reshape(64, 8, c)
        return jnp.sum(out * cot)

    gk = jax.grad(loss_kernel, argnums=(0, 1))(grid, pts)
    gp = jax.grad(loss_pure, argnums=(0, 1))(grid, pts)
    for a, b in zip(gk, gp):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def test_unusable_shapes_fall_back():
    rng = np.random.default_rng(5)
    # resolution not a multiple of 8 -> static fallback, still exact
    grid = jnp.asarray(rng.normal(size=(12, 12, 12, 3)).astype(np.float32))
    pts = jnp.asarray(rng.uniform(-1, 1, size=(64, 8, 3)).astype(np.float32))
    got = trilinear_rays(grid, pts, force=True, interpret=True)
    want = trilinear(grid, pts.reshape(-1, 3)).reshape(64, 8, 3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=0)
    # too many channels for the 32-lane pad
    grid = jnp.asarray(rng.normal(size=(16, 16, 16, 40)).astype(np.float32))
    got = trilinear_rays(grid, pts, force=True, interpret=True)
    want = trilinear(grid, pts.reshape(-1, 3)).reshape(64, 8, 40)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=0)


def test_tile_ray_order_is_blocked_permutation():
    h, w, t = 12, 20, 8
    perm = tile_ray_order(h, w, t)
    assert sorted(perm.tolist()) == list(range(h * w))
    # first block = the top-left t x t pixels, row-major
    want = (np.arange(t)[:, None] * w + np.arange(t)[None, :]).reshape(-1)
    np.testing.assert_array_equal(perm[: t * t], want)
    # inverse round-trips
    inv = np.argsort(perm)
    x = np.arange(h * w)
    np.testing.assert_array_equal(x[perm][inv], x)


def test_plenoxels_apply_ray_structured_matches_flat():
    from nerf_tpu.models import PlenoxelsModel

    rng = np.random.default_rng(6)
    model = PlenoxelsModel(grid_res=16, sh_degree=1)
    params = {"grid": jnp.asarray(
        rng.normal(size=(16, 16, 16, model.channels)).astype(np.float32)
    )}
    pts = jnp.asarray(rng.uniform(-1, 1, size=(32, 8, 3)).astype(np.float32))
    d = rng.normal(size=(32, 8, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = jnp.asarray(d)

    rgb_r, sig_r = model.apply(params, pts, d)
    rgb_f, sig_f = model.apply(params, pts.reshape(-1, 3), d.reshape(-1, 3))
    np.testing.assert_allclose(np.asarray(rgb_r).reshape(-1, 3),
                               np.asarray(rgb_f), rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(sig_r).reshape(-1),
                               np.asarray(sig_f), rtol=1e-6, atol=1e-6)


def test_plenoxels_upsample_exact():
    from nerf_tpu.models import PlenoxelsModel

    rng = np.random.default_rng(7)
    model = PlenoxelsModel(grid_res=16, sh_degree=0)
    grid = jnp.asarray(
        rng.normal(size=(16, 16, 16, model.channels)).astype(np.float32)
    )
    up = model.upsample({"grid": grid}, 24)["grid"]
    lin = jnp.linspace(-1.0, 1.0, 24, dtype=jnp.float32)
    pts = jnp.stack(jnp.meshgrid(lin, lin, lin, indexing="ij"),
                    axis=-1).reshape(-1, 3)
    want = trilinear(grid, pts).reshape(24, 24, 24, model.channels)
    np.testing.assert_allclose(np.asarray(up), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_eval_render_tile_order_round_trip():
    """hw-tiled rendering must return the same image as scanline order
    (perturb=False makes sampling order-invariant)."""
    from nerf_tpu.models import PlenoxelsModel
    from nerf_tpu.render.renderer import RenderSettings
    from nerf_tpu.train.step import make_eval_render

    rng = np.random.default_rng(8)
    model = PlenoxelsModel(grid_res=16, sh_degree=0)
    params = {"grid": jnp.asarray(
        0.1 * rng.normal(size=(16, 16, 16, model.channels)).astype(np.float32)
    )}
    settings = RenderSettings(num_samples=8, perturb=False, chunk_size=64,
                              white_background=True)
    render = make_eval_render(model, settings, use_pallas=False)

    h, w = 8, 16
    o = np.zeros((h * w, 3), np.float32)
    o[:, 2] = 4.0
    i, j = np.meshgrid(np.arange(w), np.arange(h), indexing="xy")
    d = np.stack([(i - w / 2) / w, -(j - h / 2) / h, -np.ones_like(i)],
                 axis=-1).reshape(-1, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o, d = jnp.asarray(o), jnp.asarray(d)
    key = jax.random.key(0)

    plain = render(params, None, o, d, key)
    tiled = render(params, None, o, d, key, hw=(h, w))
    np.testing.assert_allclose(np.asarray(tiled.rgb),
                               np.asarray(plain.rgb), rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(tiled.depth),
                               np.asarray(plain.depth), rtol=1e-6, atol=1e-6)


def test_vmap_falls_back_to_pure():
    """vmapped callers (multiscene trains vmap model.apply over scenes)
    must take the pure path: the scalar-prefetched kernel has no batching
    rule. With the guard, vmap(force=True) still computes exact values."""
    grid = jnp.asarray(
        np.random.default_rng(11).normal(size=(2, 16, 16, 16, 4)),
        jnp.float32,
    )
    pts = jnp.asarray(
        np.random.default_rng(12).uniform(-1, 1, (2, 64, 8, 3)), jnp.float32
    )

    def f(g, p):
        return trilinear_rays(g, p, force=True, interpret=True)

    out = jax.vmap(f)(grid, pts)
    for s in range(2):
        want = trilinear(grid[s], pts[s].reshape(-1, 3)).reshape(64, 8, 4)
        np.testing.assert_allclose(np.asarray(out[s]), np.asarray(want),
                                   rtol=2e-6, atol=2e-6)


def test_fits_engages_on_render_geometry():
    """The window-fit bit must be TRUE for the geometry the kernel was
    built for: tile_ray_order'd camera rays through normalize_positions —
    including border-clamped samples (coordinate r-1 is in-window: its +1
    stencil corner has zero tent weight). Guards against the fits gate
    silently parking every eval render on the pure path."""
    from nerf_tpu.data.rays import compute_rays_single
    from nerf_tpu.ops.sampling import normalize_positions
    from nerf_tpu.ops.pallas.fused_grid import _coherent_channels

    h = w = 64
    focal = 0.5 * w / np.tan(0.5 * 0.6911)
    c2w = np.eye(4, dtype=np.float32)
    c2w[2, 3] = 4.0  # camera at +z looking down -z
    ro, rd = compute_rays_single(h, w, focal, c2w)
    perm = tile_ray_order(h, w)
    ro, rd = ro[perm], rd[perm]
    near, far = 2.0, 6.0
    s = 64
    t = np.linspace(near, far, s, dtype=np.float32)
    pts = ro[:, None, :] + t[None, :, None] * rd[:, None, :]
    pts = normalize_positions(jnp.asarray(pts), near, far)  # [-1, 1], with
    # lateral exits clamped inside trilinear_rays' cell mapping

    grid = jnp.zeros((32, 32, 32, 4), jnp.float32)
    for chunk in range(0, h * w, 8192):
        _, fits = _coherent_channels(
            grid, pts[chunk:chunk + 8192], 64, 8, jnp.float32,
            jax.lax.Precision.HIGHEST, False,
        )
        assert bool(fits), f"chunk at {chunk} did not fit"


def test_fits_engages_on_upsample_lines():
    """PlenoxelsModel.upsample queries linspace(-1,1) lines whose +1.0
    endpoint maps to the top border cell exactly — it must fit."""
    from nerf_tpu.ops.pallas.fused_grid import _coherent_channels

    grid = jnp.zeros((16, 16, 16, 4), jnp.float32)
    new_res = 32
    lin = jnp.linspace(-1.0, 1.0, new_res, dtype=jnp.float32)
    pts = jnp.stack(jnp.meshgrid(lin, lin, lin, indexing="ij"), axis=-1)
    pts = pts.reshape(new_res * new_res, new_res, 3)
    _, fits = _coherent_channels(
        grid, pts, 8, 8, jnp.float32, jax.lax.Precision.HIGHEST, False,
    )
    assert bool(fits)


def test_use_pallas_false_reaches_grid_families():
    """use_pallas=false is the documented pure-JAX reference tier; the
    grid families honor it through the use_grid_kernel field, threaded
    from config through baking."""
    from nerf_tpu.config import Config
    from nerf_tpu.models.registry import model_from_config

    cfg = Config(model_type="plenoxels", use_pallas=False)
    model = model_from_config(cfg)
    assert model.use_grid_kernel is False

    cfg = Config(model_type="fastnerf", use_pallas=False)
    fn = model_from_config(cfg)
    assert fn.use_grid_kernel is False
    baked = fn.bake(fn.init(jax.random.key(0)), grid_res=16, dir_res=4)
    assert baked.use_grid_kernel is False

    cfg = Config(model_type="plenoctree", use_pallas=False)
    poc = model_from_config(cfg)
    baked_model, _ = poc.bake(poc.init(jax.random.key(0)), grid_res=16)
    assert baked_model.use_grid_kernel is False


def test_packed_matches_unpacked():
    """Passing a pre-packed grid (the once-per-render hoist) computes the
    same values and the same gradients as packing inside."""
    from nerf_tpu.ops.pallas.fused_grid import pack_grid

    rng = np.random.default_rng(13)
    r, c = 16, 4
    grid = jnp.asarray(rng.normal(size=(r, r, r, c)).astype(np.float32))
    pts = _coherent_points(rng, r, num_rays=64, s=8)
    packed = pack_grid(grid, jnp.float32)

    a = trilinear_rays(grid, pts, dtype="float32", force=True,
                       interpret=True)
    b = trilinear_rays(grid, pts, dtype="float32", force=True,
                       interpret=True, packed=packed)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0, atol=0)

    cot = jnp.asarray(rng.normal(size=(64, 8, c)).astype(np.float32))
    ga = jax.grad(lambda g: jnp.sum(trilinear_rays(
        g, pts, dtype="float32", force=True, interpret=True) * cot))(grid)
    gb = jax.grad(lambda g: jnp.sum(trilinear_rays(
        g, pts, dtype="float32", force=True, interpret=True,
        packed=pack_grid(g, jnp.float32)) * cot))(grid)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb),
                               rtol=1e-6, atol=1e-6)


def test_plenoxels_precompute_roundtrip():
    from nerf_tpu.models import PlenoxelsModel

    rng = np.random.default_rng(14)
    model = PlenoxelsModel(grid_res=16, sh_degree=1, interp_dtype="float32")
    params = {"grid": jnp.asarray(
        rng.normal(size=(16, 16, 16, model.channels)).astype(np.float32)
    )}
    pre = model.precompute(params)
    assert "_packed" in pre
    pts = jnp.asarray(rng.uniform(-1, 1, size=(32, 8, 3)).astype(np.float32))
    d = rng.normal(size=(32, 8, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = jnp.asarray(d)
    rgb_a, sig_a = model.apply(params, pts, d)
    rgb_b, sig_b = model.apply(pre, pts, d)
    np.testing.assert_allclose(np.asarray(rgb_a), np.asarray(rgb_b),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(sig_a), np.asarray(sig_b),
                               rtol=1e-6, atol=1e-6)
    # unpackable grids skip the hook
    m9 = PlenoxelsModel(grid_res=9, sh_degree=1)
    p9 = {"grid": jnp.zeros((9, 9, 9, m9.channels), jnp.float32)}
    assert "_packed" not in m9.precompute(p9)
