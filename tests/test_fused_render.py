"""Fused render kernel (ops/pallas/fused_render.py) vs the pure-JAX path.

Runs in Pallas interpret mode on the CPU test mesh; the same comparisons run
compiled on real TPU via tools/validate_fused_render.py. The pure path is
the numerical reference (itself golden-tested against the torch reference in
test_torch_parity.py)."""

from __future__ import annotations

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from nerf_tpu.models import NeRFModel
from nerf_tpu.ops.pallas.fused_render import make_fused_nerf_render
from nerf_tpu.ops.sampling import (
    deltas_from_t,
    normalize_positions,
    sample_positions,
)
from nerf_tpu.ops.volume import composite

NEAR, FAR = 2.0, 6.0


def _setup(num_rays=6, num_samples=32, seed=0):
    model = NeRFModel()  # float32 compute
    params = model.init(jax.random.key(seed))
    rng = np.random.default_rng(seed)
    rays_o = jnp.asarray(rng.uniform(2.5, 3.5, (num_rays, 3)), jnp.float32)
    rd = rng.normal(size=(num_rays, 3))
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    rays_d = jnp.asarray(rd, jnp.float32)
    edges = np.linspace(NEAR, FAR, num_samples + 1)
    t = edges[:-1] + rng.uniform(0, 1, (num_rays, num_samples)) * (
        edges[1:] - edges[:-1]
    )
    t = jnp.asarray(t, jnp.float32)
    return model, params, rays_o, rays_d, t


def _pure(model, params, rays_o, rays_d, t):
    deltas = deltas_from_t(t)
    pts = sample_positions(rays_o, rays_d, t)
    ptsn = normalize_positions(pts, NEAR, FAR)
    dirs = jnp.broadcast_to(rays_d[:, None, :], ptsn.shape)
    rgb, sigma = model.apply(params, ptsn, dirs)
    return composite(rgb, sigma, deltas, t=t, white_background=False)


def test_fused_render_forward_matches_pure():
    model, params, rays_o, rays_d, t = _setup()
    fr = make_fused_nerf_render(model, NEAR, FAR, normalize=True,
                                interpret=True)
    assert fr is not None
    out_p = _pure(model, params, rays_o, rays_d, t)
    out_f = fr(params, rays_o, rays_d, rays_d, t)
    np.testing.assert_allclose(out_f["rgb"], out_p.rgb, atol=1e-5)
    np.testing.assert_allclose(out_f["acc"], out_p.acc, atol=1e-5)
    np.testing.assert_allclose(out_f["depth"], out_p.depth, atol=1e-4)
    np.testing.assert_allclose(out_f["weights"], out_p.weights, atol=1e-5)


def test_fused_render_param_grads_match_pure():
    model, params, rays_o, rays_d, t = _setup()
    fr = make_fused_nerf_render(model, NEAR, FAR, normalize=True,
                                interpret=True)
    rng = np.random.default_rng(1)
    target = jnp.asarray(rng.uniform(0, 1, (rays_o.shape[0], 3)), jnp.float32)

    def loss_pure(p):
        out = _pure(model, p, rays_o, rays_d, t)
        rgb = out.rgb + (1.0 - out.acc[:, None])  # white background
        return jnp.mean((rgb - target) ** 2)

    def loss_fused(p):
        out = fr(p, rays_o, rays_d, rays_d, t)
        rgb = out["rgb"] + (1.0 - out["acc"][:, None])
        return jnp.mean((rgb - target) ** 2)

    lp, gp = jax.value_and_grad(loss_pure)(params)
    lf, gf = jax.value_and_grad(loss_fused)(params)
    np.testing.assert_allclose(float(lf), float(lp), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(gp), jax.tree.leaves(gf)):
        scale = float(jnp.max(jnp.abs(a))) + 1e-10
        np.testing.assert_allclose(
            np.asarray(b) / scale, np.asarray(a) / scale, atol=5e-4
        )


def test_fused_render_pads_ragged_ray_count():
    model, params, rays_o, rays_d, t = _setup(num_rays=5, num_samples=16)
    fr = make_fused_nerf_render(model, NEAR, FAR, normalize=True,
                                interpret=True)
    out_p = _pure(model, params, rays_o, rays_d, t)
    out_f = fr(params, rays_o, rays_d, rays_d, t)
    assert out_f["rgb"].shape == (5, 3)
    assert out_f["weights"].shape == (5, 16)
    np.testing.assert_allclose(out_f["rgb"], out_p.rgb, atol=1e-5)


def test_fused_render_in_renderer_path():
    """render_rays(fused_render=...) must agree with the plain path when the
    same PRNG key drives sampling (hierarchical included)."""
    from nerf_tpu.render.renderer import RenderSettings, render_rays

    model, params, rays_o, rays_d, _ = _setup()
    fr = make_fused_nerf_render(model, NEAR, FAR, normalize=True,
                                interpret=True)
    settings = RenderSettings(
        near=NEAR, far=FAR, num_samples=16, num_fine_samples=8,
        white_background=True,
    )
    key = jax.random.key(3)
    out_plain = render_rays(model.apply, params, rays_o, rays_d, key, settings)
    out_fused = render_rays(model.apply, params, rays_o, rays_d, key, settings,
                            fused_render=fr)
    np.testing.assert_allclose(out_fused.rgb, out_plain.rgb, atol=1e-4)
    np.testing.assert_allclose(out_fused.rgb_coarse, out_plain.rgb_coarse,
                               atol=1e-4)
    np.testing.assert_allclose(out_fused.acc, out_plain.acc, atol=1e-4)


def _setup_siren(num_rays=6, num_samples=32, seed=0):
    from nerf_tpu.models import SirenModel

    model = SirenModel()  # float32 compute => exact trig in-kernel
    params = model.init(jax.random.key(seed))
    rng = np.random.default_rng(seed)
    rays_o = jnp.asarray(rng.uniform(2.5, 3.5, (num_rays, 3)), jnp.float32)
    rd = rng.normal(size=(num_rays, 3))
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    rays_d = jnp.asarray(rd, jnp.float32)
    edges = np.linspace(NEAR, FAR, num_samples + 1)
    t = edges[:-1] + rng.uniform(0, 1, (num_rays, num_samples)) * (
        edges[1:] - edges[:-1]
    )
    return model, params, rays_o, rays_d, jnp.asarray(t, jnp.float32)


def test_fused_siren_render_forward_matches_pure():
    from nerf_tpu.ops.pallas.fused_render_siren import make_fused_siren_render

    model, params, rays_o, rays_d, t = _setup_siren()
    fr = make_fused_siren_render(model, NEAR, FAR, normalize=True,
                                 interpret=True)
    assert fr is not None
    out_p = _pure(model, params, rays_o, rays_d, t)
    out_f = fr(params, rays_o, rays_d, rays_d, t)
    np.testing.assert_allclose(out_f["rgb"], out_p.rgb, atol=2e-5)
    np.testing.assert_allclose(out_f["acc"], out_p.acc, atol=2e-5)
    np.testing.assert_allclose(out_f["weights"], out_p.weights, atol=2e-5)


def test_fused_siren_render_param_grads_match_pure():
    from nerf_tpu.ops.pallas.fused_render_siren import make_fused_siren_render

    model, params, rays_o, rays_d, t = _setup_siren()
    fr = make_fused_siren_render(model, NEAR, FAR, normalize=True,
                                 interpret=True)
    rng = np.random.default_rng(1)
    target = jnp.asarray(rng.uniform(0, 1, (rays_o.shape[0], 3)), jnp.float32)

    def loss_pure(p):
        out = _pure(model, p, rays_o, rays_d, t)
        rgb = out.rgb + (1.0 - out.acc[:, None])
        return jnp.mean((rgb - target) ** 2)

    def loss_fused(p):
        out = fr(p, rays_o, rays_d, rays_d, t)
        rgb = out["rgb"] + (1.0 - out["acc"][:, None])
        return jnp.mean((rgb - target) ** 2)

    lp, gp = jax.value_and_grad(loss_pure)(params)
    lf, gf = jax.value_and_grad(loss_fused)(params)
    np.testing.assert_allclose(float(lf), float(lp), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(gp), jax.tree.leaves(gf)):
        scale = float(jnp.max(jnp.abs(a))) + 1e-10
        np.testing.assert_allclose(
            np.asarray(b) / scale, np.asarray(a) / scale, atol=1e-3
        )


def test_fast_sin_accuracy():
    """The bf16-mode polynomial sine must stay well under bf16 rounding."""
    from nerf_tpu.ops.pallas.fused_siren import _fast_sin

    x = jnp.asarray(np.random.default_rng(0).normal(size=20000) * 40,
                    jnp.float32)
    err = np.max(np.abs(np.asarray(_fast_sin(x)) - np.sin(np.asarray(x))))
    assert err < 1e-4, err


@pytest.mark.parametrize("model_kind", ["nerf", "siren"])
@pytest.mark.parametrize("fine", [0, 8])
def test_fused_train_path_matches_pure_loss(model_kind, fine):
    """render_rays_train (single-kernel fwd+MSE+bwd) must reproduce the
    render-then-MSE loss and its parameter gradients."""
    from nerf_tpu.render.renderer import (
        RenderSettings, render_rays, render_rays_train,
    )

    if model_kind == "nerf":
        model, params, rays_o, rays_d, _ = _setup(num_samples=16)
        from nerf_tpu.ops.pallas.fused_render import make_fused_nerf_render
        fr = make_fused_nerf_render(model, NEAR, FAR, normalize=True,
                                    interpret=True)
    else:
        model, params, rays_o, rays_d, _ = _setup_siren(num_samples=16)
        from nerf_tpu.ops.pallas.fused_render_siren import (
            make_fused_siren_render,
        )
        fr = make_fused_siren_render(model, NEAR, FAR, normalize=True,
                                     interpret=True)
    settings = RenderSettings(near=NEAR, far=FAR, num_samples=16,
                              num_fine_samples=fine, white_background=True)
    key = jax.random.key(5)
    rng = np.random.default_rng(2)
    target = jnp.asarray(rng.uniform(0, 1, (rays_o.shape[0], 3)), jnp.float32)

    def loss_pure(p):
        # the render-route loss, same PRNG stream and pass structure
        out = render_rays(model.apply, p, rays_o, rays_d, key, settings,
                          fused_render=fr)
        loss = jnp.mean((out.rgb - target) ** 2)
        if fine:
            loss = loss + jnp.mean((out.rgb_coarse - target) ** 2)
        return loss

    def loss_train(p):
        return render_rays_train(fr, p, rays_o, rays_d, key, settings,
                                 target)[0]

    lp, gp = jax.value_and_grad(loss_pure)(params)
    lt, gt = jax.value_and_grad(loss_train)(params)
    np.testing.assert_allclose(float(lt), float(lp), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(gp), jax.tree.leaves(gt)):
        scale = float(jnp.max(jnp.abs(a))) + 1e-10
        np.testing.assert_allclose(
            np.asarray(b) / scale, np.asarray(a) / scale, atol=1e-4
        )


def test_fused_train_with_occupancy_matches_pure_loss():
    """Occupancy-guided coarse sampling composes with the fused train
    kernel: both routes draw t from the same prior CDF, so loss and
    gradients still match the render-then-MSE route exactly."""
    from nerf_tpu.ops.occupancy import OccupancyGrid
    from nerf_tpu.ops.pallas.fused_render import make_fused_nerf_render
    from nerf_tpu.render.renderer import (
        RenderSettings, render_rays, render_rays_train,
    )

    model, params, rays_o, rays_d, _ = _setup(num_samples=16)
    fr = make_fused_nerf_render(model, NEAR, FAR, normalize=True,
                                interpret=True)
    settings = RenderSettings(near=NEAR, far=FAR, num_samples=16,
                              white_background=True)
    g = jnp.zeros((8, 8, 8, 1), jnp.float32).at[:, :, 2:6].set(1.0)
    occ = OccupancyGrid(grid=g, domain=(-2.75, -1.25), num_bins=32)
    key = jax.random.key(9)
    rng = np.random.default_rng(3)
    target = jnp.asarray(rng.uniform(0, 1, (rays_o.shape[0], 3)), jnp.float32)

    def loss_pure(p):
        out = render_rays(model.apply, p, rays_o, rays_d, key, settings,
                          fused_render=fr, occupancy=occ)
        return jnp.mean((out.rgb - target) ** 2)

    def loss_train(p):
        return render_rays_train(fr, p, rays_o, rays_d, key, settings,
                                 target, occupancy=occ)[0]

    lp, gp = jax.value_and_grad(loss_pure)(params)
    lt, gt = jax.value_and_grad(loss_train)(params)
    np.testing.assert_allclose(float(lt), float(lp), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(gp), jax.tree.leaves(gt)):
        scale = float(jnp.max(jnp.abs(a))) + 1e-10
        np.testing.assert_allclose(
            np.asarray(b) / scale, np.asarray(a) / scale, atol=1e-4
        )


@pytest.mark.parametrize("num_samples", [8, 24, 33, 60])
def test_fused_render_odd_sample_counts(num_samples):
    """Roll-scan cumprod, segment masks and tile picking must handle
    non-power-of-two and odd sample counts."""
    model, params, rays_o, rays_d, t = _setup(num_rays=5,
                                              num_samples=num_samples)
    fr = make_fused_nerf_render(model, NEAR, FAR, normalize=True,
                                interpret=True)
    out_p = _pure(model, params, rays_o, rays_d, t)
    out_f = fr(params, rays_o, rays_d, rays_d, t)
    np.testing.assert_allclose(out_f["rgb"], out_p.rgb, atol=2e-5)
    np.testing.assert_allclose(out_f["weights"], out_p.weights, atol=2e-5)


def test_fused_gabor_render_and_train_match_pure():
    """GaborNet fused kernels (forward + single-kernel train incl. trainable
    filter parameters through the differentiable prep) vs the pure path."""
    from nerf_tpu.models import GaborModel
    from nerf_tpu.ops.pallas.fused_render_gabor import make_fused_gabor_render

    model = GaborModel(hidden_dim=256, num_layers=4)
    params = model.init(jax.random.key(0))
    rng = np.random.default_rng(0)
    R, S = 6, 16
    rays_o = jnp.asarray(rng.uniform(2.5, 3.5, (R, 3)), jnp.float32)
    rd = rng.normal(size=(R, 3))
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    rays_d = jnp.asarray(rd, jnp.float32)
    edges = np.linspace(NEAR, FAR, S + 1)
    t = jnp.asarray(
        edges[:-1] + rng.uniform(0, 1, (R, S)) * (edges[1:] - edges[:-1]),
        jnp.float32,
    )
    target = jnp.asarray(rng.uniform(0, 1, (R, 3)), jnp.float32)

    fr = make_fused_gabor_render(model, NEAR, FAR, normalize=True,
                                 interpret=True)
    assert fr is not None
    out_p = _pure(model, params, rays_o, rays_d, t)
    out_f = fr(params, rays_o, rays_d, rays_d, t)
    np.testing.assert_allclose(out_f["rgb"], out_p.rgb, atol=2e-5)
    np.testing.assert_allclose(out_f["weights"], out_p.weights, atol=2e-5)

    def loss_pure(p):
        out = _pure(model, p, rays_o, rays_d, t)
        rgb = out.rgb + (1.0 - out.acc[:, None])
        return jnp.mean((rgb - target) ** 2)

    def loss_tr(p):
        return fr.train(p, rays_o, rays_d, rays_d, t, target, True)[0]

    lp, gp = jax.value_and_grad(loss_pure)(params)
    lt, gt = jax.value_and_grad(loss_tr)(params)
    np.testing.assert_allclose(float(lt), float(lp), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(gp), jax.tree.leaves(gt)):
        scale = float(jnp.max(jnp.abs(a))) + 1e-10
        np.testing.assert_allclose(
            np.asarray(b) / scale, np.asarray(a) / scale, atol=1e-3
        )
