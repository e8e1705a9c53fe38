"""Fused Pallas kernel parity tests, run in interpreter mode on CPU: the
pure-JAX apply path is the numerical reference (SURVEY.md §7 stage 4); the
kernels must reproduce its forward AND all gradients (params, points, dirs)
to float32 precision."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nerf_tpu.models import GaborModel, NeRFModel, SirenModel
from nerf_tpu.ops.pallas.fused_gabor import make_fused_gabor_apply
from nerf_tpu.ops.pallas.fused_nerf import make_fused_nerf_apply
from nerf_tpu.ops.pallas.fused_siren import make_fused_siren_apply


def _inputs(n=300, seed=0):
    rng = np.random.default_rng(seed)
    pts = jnp.asarray(rng.uniform(-1.2, 1.2, size=(n, 3)), jnp.float32)
    dirs = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
    return pts, dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)


def _check(model, fused, atol_fwd=1e-5, rtol_grad=1e-4):
    params = model.init(jax.random.key(0))
    pts, dirs = _inputs()

    rgb_ref, sig_ref = model.apply(params, pts, dirs)
    rgb_f, sig_f = fused(params, pts, dirs)
    np.testing.assert_allclose(np.asarray(rgb_f), np.asarray(rgb_ref), atol=atol_fwd)
    np.testing.assert_allclose(np.asarray(sig_f), np.asarray(sig_ref), atol=1e-4)

    def loss(apply_fn):
        def f(p, x, d):
            r, s = apply_fn(p, x, d)
            return jnp.sum(r * jnp.arange(3)) + jnp.sum(jnp.sin(s))
        return f

    g_ref = jax.grad(loss(model.apply), argnums=(0, 1, 2))(params, pts, dirs)
    g_f = jax.grad(loss(fused), argnums=(0, 1, 2))(params, pts, dirs)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref), jax.tree_util.tree_leaves(g_f)):
        scale = float(jnp.abs(a).max()) + 1e-8
        np.testing.assert_allclose(
            np.asarray(b) / scale, np.asarray(a) / scale, atol=rtol_grad
        )


def test_fused_nerf_matches_pure_jax():
    model = NeRFModel(compute_dtype="float32")
    fused = make_fused_nerf_apply(model, tile_fwd=128, tile_bwd=128, interpret=True)
    assert fused is not None
    _check(model, fused)


def test_fused_siren_matches_pure_jax():
    model = SirenModel(compute_dtype="float32")
    fused = make_fused_siren_apply(model, tile_fwd=128, tile_bwd=128, interpret=True)
    assert fused is not None
    _check(model, fused)


def test_fused_gabor_matches_pure_jax():
    """Tier-1 field kernel for the Gabor family — completes its fallback
    ladder (tiers 2-3 are the whole-ray render/train kernels)."""
    model = GaborModel(compute_dtype="float32", num_layers=4)
    fused = make_fused_gabor_apply(model, tile_fwd=128, tile_bwd=128,
                                   interpret=True)
    assert fused is not None
    _check(model, fused, rtol_grad=2e-4)


def test_fused_handles_nonmultiple_batch_and_leading_dims():
    model = NeRFModel(compute_dtype="float32")
    fused = make_fused_nerf_apply(model, tile_fwd=128, tile_bwd=128, interpret=True)
    params = model.init(jax.random.key(0))
    pts, dirs = _inputs(n=130)  # not a tile multiple
    r1, s1 = fused(params, pts, dirs)
    r0, s0 = model.apply(params, pts, dirs)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r0), atol=1e-5)
    # 3-D leading shape (rays, samples, 3)
    pts3 = pts.reshape(13, 10, 3)
    dirs3 = dirs.reshape(13, 10, 3)
    r2, s2 = fused(params, pts3, dirs3)
    assert r2.shape == (13, 10, 3) and s2.shape == (13, 10)
    np.testing.assert_allclose(np.asarray(r2).reshape(-1, 3), np.asarray(r0),
                               atol=1e-5)


def test_unsupported_width_returns_none():
    assert make_fused_nerf_apply(NeRFModel(hidden_dim=192)) is None
    assert make_fused_siren_apply(SirenModel(hidden_dim=192)) is None
    assert make_fused_gabor_apply(GaborModel(hidden_dim=192)) is None
