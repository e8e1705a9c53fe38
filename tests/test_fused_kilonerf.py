"""Grouped-matmul Pallas kernels for KiloNeRF (ops/pallas/fused_kilonerf.py)
against the pointwise numerical reference, in interpret mode on CPU."""

import numpy as np
import jax
import jax.numpy as jnp

from nerf_tpu.models.kilonerf import KiloNeRFModel
from nerf_tpu.ops.pallas.fused_kilonerf import make_fused_kilonerf_apply


def _model(**kw):
    kw.setdefault("grid_res", 3)
    kw.setdefault("hidden_dim", 16)
    kw.setdefault("pos_encoding_dim", 4)
    kw.setdefault("dir_encoding_dim", 2)
    return KiloNeRFModel(**kw)


def _data(n, seed=0):
    rng = np.random.default_rng(seed)
    pts = jnp.asarray(rng.uniform(-1, 1, (n, 3)), jnp.float32)
    d = rng.normal(size=(n, 3))
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    return pts, jnp.asarray(d, jnp.float32)


def test_forward_parity():
    model = _model()
    params = model.init(jax.random.key(0))
    fused = make_fused_kilonerf_apply(model, tile_fwd=16, tile_bwd=16,
                                      interpret=True)
    pts, dirs = _data(100)
    rgb_f, sigma_f = fused(params, pts, dirs)
    rgb_r, sigma_r = model.apply_pointwise(params, pts, dirs)
    np.testing.assert_allclose(np.asarray(rgb_f), np.asarray(rgb_r), atol=1e-5)
    np.testing.assert_allclose(np.asarray(sigma_f), np.asarray(sigma_r),
                               atol=1e-4)


def test_forward_parity_skewed():
    """All points in one voxel — one expert's tiles dominate the plan."""
    model = _model()
    params = model.init(jax.random.key(1))
    fused = make_fused_kilonerf_apply(model, tile_fwd=8, tile_bwd=8,
                                      interpret=True)
    rng = np.random.default_rng(1)
    pts = jnp.asarray(rng.uniform(-0.99, -0.68, (50, 3)), jnp.float32)
    _, dirs = _data(50, seed=1)
    rgb_f, sigma_f = fused(params, pts, dirs)
    rgb_r, sigma_r = model.apply_pointwise(params, pts, dirs)
    np.testing.assert_allclose(np.asarray(rgb_f), np.asarray(rgb_r), atol=1e-5)
    np.testing.assert_allclose(np.asarray(sigma_f), np.asarray(sigma_r),
                               atol=1e-4)


def test_gradient_parity():
    """dL/dparams through the grouped kernels matches autodiff through the
    pointwise reference — including zero grads for untouched experts."""
    model = _model()
    params = model.init(jax.random.key(2))
    fused = make_fused_kilonerf_apply(model, tile_fwd=16, tile_bwd=16,
                                      interpret=True)
    rng = np.random.default_rng(2)
    # leave some voxels empty on purpose
    pts = jnp.asarray(rng.uniform(-1, 0.2, (60, 3)), jnp.float32)
    _, dirs = _data(60, seed=2)
    tgt = jnp.asarray(rng.uniform(size=(60, 3)), jnp.float32)

    def loss(apply_fn):
        def f(pr):
            rgb, sigma = apply_fn(pr, pts, dirs)
            return jnp.mean((rgb - tgt) ** 2) + 1e-3 * jnp.mean(sigma)

        return f

    g_f = jax.grad(loss(fused))(params)
    g_r = jax.grad(loss(model.apply_pointwise))(params)
    flat_f = jax.tree_util.tree_leaves_with_path(g_f)
    flat_r = dict(jax.tree_util.tree_leaves_with_path(g_r))
    for path, leaf in flat_f:
        want = flat_r[path]
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(want), atol=5e-5,
            err_msg=jax.tree_util.keystr(path),
        )
    # untouched experts really get zero (not garbage) gradients
    vid, _ = model.voxel_of(pts)
    touched = np.zeros(model.num_networks, bool)
    touched[np.asarray(vid)] = True
    assert not touched.all()  # the test actually exercises the masking
    g1 = np.asarray(g_f["l1"]["w"])
    assert np.all(g1[~touched] == 0.0)
    assert np.any(g1[touched] != 0.0)


def test_train_step_with_fused_kernel():
    """End-to-end: the fused apply drives make_train_step and converges."""
    from nerf_tpu.config import Config
    from nerf_tpu.data.pipeline import RayPool
    from nerf_tpu.render.renderer import RenderSettings
    from nerf_tpu.train.optim import make_optimizer
    from nerf_tpu.train.state import TrainState
    from nerf_tpu.train.step import make_train_step

    model = _model()
    fused = make_fused_kilonerf_apply(model, tile_fwd=32, tile_bwd=32,
                                      interpret=True)
    cfg = Config()
    tx = make_optimizer(cfg)
    params = model.init(jax.random.key(0))
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       fine_params={}, opt_state=tx.init((params, {})))
    k = jax.random.key(1)
    rd = jax.random.normal(k, (256, 3))
    rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    pool = RayPool(rays_o=jax.random.normal(k, (256, 3)) * 0.1, rays_d=rd,
                   rgb=jax.random.uniform(k, (256, 3)), viewdirs=rd)
    settings = RenderSettings(near=2.0, far=6.0, num_samples=4)
    step = make_train_step(model, tx, settings, 32, jax.random.key(2),
                           use_pallas=False, donate=False, apply_fn=fused)
    losses = []
    for _ in range(20):
        state, m = step(state, pool)
        losses.append(float(m["mse"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < np.mean(losses[:5])


# --------------------------------------------- multi-expert block-diagonal

def _multi_model(**kw):
    # grid_res 4 -> 64 experts; hidden 16 -> E = 128//16 = 8 experts/step
    kw.setdefault("grid_res", 4)
    kw.setdefault("hidden_dim", 16)
    kw.setdefault("pos_encoding_dim", 4)
    kw.setdefault("dir_encoding_dim", 2)
    return KiloNeRFModel(**kw)


def test_multi_forward_parity():
    model = _multi_model()
    params = model.init(jax.random.key(3))
    fused = make_fused_kilonerf_apply(model, tile_fwd=16, tile_bwd=16,
                                      interpret=True)
    pts, dirs = _data(120, seed=3)
    rgb_f, sigma_f = fused(params, pts, dirs)
    rgb_r, sigma_r = model.apply_pointwise(params, pts, dirs)
    np.testing.assert_allclose(np.asarray(rgb_f), np.asarray(rgb_r), atol=1e-5)
    np.testing.assert_allclose(np.asarray(sigma_f), np.asarray(sigma_r),
                               atol=1e-4)


def test_multi_matches_single_expert_kernel():
    """The block-diagonal multi-expert step computes exactly what the
    single-expert kernel computes (slot purity: garbage never crosses)."""
    model = _multi_model()
    params = model.init(jax.random.key(4))
    multi = make_fused_kilonerf_apply(model, tile_fwd=16, tile_bwd=16,
                                      interpret=True)
    single = make_fused_kilonerf_apply(model, tile_fwd=16, tile_bwd=16,
                                      interpret=True, experts_per_step=1)
    pts, dirs = _data(90, seed=4)
    rgb_m, sigma_m = multi(params, pts, dirs)
    rgb_s, sigma_s = single(params, pts, dirs)
    np.testing.assert_allclose(np.asarray(rgb_m), np.asarray(rgb_s),
                               atol=2e-6)
    np.testing.assert_allclose(np.asarray(sigma_m), np.asarray(sigma_s),
                               atol=2e-5)


def test_multi_gradient_parity():
    """Gradients through the multi-expert kernels match the pointwise
    reference; untouched experts (and whole untouched GROUPS) get zeros."""
    model = _multi_model()
    params = model.init(jax.random.key(5))
    fused = make_fused_kilonerf_apply(model, tile_fwd=16, tile_bwd=16,
                                      interpret=True)
    rng = np.random.default_rng(5)
    pts = jnp.asarray(rng.uniform(-1, 0.1, (70, 3)), jnp.float32)
    _, dirs = _data(70, seed=5)
    tgt = jnp.asarray(rng.uniform(size=(70, 3)), jnp.float32)

    def loss(apply_fn):
        def f(pr):
            rgb, sigma = apply_fn(pr, pts, dirs)
            return jnp.mean((rgb - tgt) ** 2) + 1e-3 * jnp.mean(sigma)

        return f

    g_f = jax.grad(loss(fused))(params)
    g_r = jax.grad(loss(model.apply_pointwise))(params)
    flat_f = jax.tree_util.tree_leaves_with_path(g_f)
    flat_r = dict(jax.tree_util.tree_leaves_with_path(g_r))
    for path, leaf in flat_f:
        want = flat_r[path]
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(want), atol=5e-5,
            err_msg=jax.tree_util.keystr(path),
        )
    vid, _ = model.voxel_of(pts)
    touched = np.zeros(model.num_networks, bool)
    touched[np.asarray(vid)] = True
    assert not touched.all()
    g1 = np.asarray(g_f["l1"]["w"])
    assert np.all(g1[~touched] == 0.0)
    assert np.any(g1[touched] != 0.0)


def test_multi_default_engagement():
    """The production shape (8^3 grid, h=32) picks the multi-expert path
    (E=4) by default and it matches pointwise on a small batch."""
    model = KiloNeRFModel(grid_res=8, hidden_dim=32, pos_encoding_dim=4,
                          dir_encoding_dim=2)
    params = model.init(jax.random.key(6))
    fused = make_fused_kilonerf_apply(model, tile_fwd=32, tile_bwd=32,
                                      interpret=True)
    pts, dirs = _data(80, seed=6)
    rgb_f, sigma_f = fused(params, pts, dirs)
    rgb_r, sigma_r = model.apply_pointwise(params, pts, dirs)
    np.testing.assert_allclose(np.asarray(rgb_f), np.asarray(rgb_r), atol=1e-5)
    np.testing.assert_allclose(np.asarray(sigma_f), np.asarray(sigma_r),
                               atol=1e-4)


def test_multi_train_step_with_fused_kernel():
    """End-to-end: the multi-expert apply drives make_train_step and the
    loss goes down."""
    from nerf_tpu.config import Config
    from nerf_tpu.data.pipeline import RayPool
    from nerf_tpu.render.renderer import RenderSettings
    from nerf_tpu.train.optim import make_optimizer
    from nerf_tpu.train.state import TrainState
    from nerf_tpu.train.step import make_train_step

    model = _multi_model()
    fused = make_fused_kilonerf_apply(model, tile_fwd=32, tile_bwd=32,
                                      interpret=True)
    cfg = Config()
    tx = make_optimizer(cfg)
    params = model.init(jax.random.key(7))
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       fine_params={}, opt_state=tx.init((params, {})))
    k = jax.random.key(8)
    rd = jax.random.normal(k, (256, 3))
    rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    pool = RayPool(rays_o=jax.random.normal(k, (256, 3)) * 0.1, rays_d=rd,
                   rgb=jax.random.uniform(k, (256, 3)), viewdirs=rd)
    settings = RenderSettings(near=2.0, far=6.0, num_samples=4)
    step = make_train_step(model, tx, settings, 32, jax.random.key(9),
                           use_pallas=False, donate=False, apply_fn=fused)
    losses = []
    for _ in range(20):
        state, m = step(state, pool)
        losses.append(float(m["mse"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < np.mean(losses[:5])


def test_multi_bf16_rgb_not_quantized():
    """bf16 compute mode: the final rgb slot-sum stays f32, so multi
    matches the single-expert kernel tightly (no output quantization)."""
    model = _multi_model(compute_dtype="bfloat16")
    params = model.init(jax.random.key(10))
    multi = make_fused_kilonerf_apply(model, tile_fwd=16, tile_bwd=16,
                                      interpret=True)
    single = make_fused_kilonerf_apply(model, tile_fwd=16, tile_bwd=16,
                                       interpret=True, experts_per_step=1)
    pts, dirs = _data(60, seed=10)
    rgb_m, _ = multi(params, pts, dirs)
    rgb_s, _ = single(params, pts, dirs)
    np.testing.assert_allclose(np.asarray(rgb_m), np.asarray(rgb_s),
                               atol=2e-4)


def test_multi_explicit_indivisible_raises():
    import pytest

    model = _model(grid_res=3)  # 27 networks
    with pytest.raises(ValueError, match="does not divide"):
        make_fused_kilonerf_apply(model, interpret=True, experts_per_step=4)


def test_multi_gradient_parity_concentrated():
    """All points in ONE voxel (one group hot, every other group empty):
    the mixed-tile dispatch's hardest shape — the hot group's segment is
    mostly real rows, every other group is pure dummies, and the boundary
    backward pass has at most one valid tile. Gradients must still match
    the pointwise reference, with zeros for every untouched expert."""
    model = _multi_model()
    params = model.init(jax.random.key(7))
    fused = make_fused_kilonerf_apply(model, tile_fwd=8, tile_bwd=8,
                                      interpret=True)
    rng = np.random.default_rng(7)
    # a 0.2-wide cube well inside one corner voxel of the 4^3 grid
    pts = jnp.asarray(rng.uniform(-0.95, -0.8, (60, 3)), jnp.float32)
    _, dirs = _data(60, seed=7)
    tgt = jnp.asarray(rng.uniform(size=(60, 3)), jnp.float32)

    def loss(apply_fn):
        def f(pr):
            rgb, sigma = apply_fn(pr, pts, dirs)
            return jnp.mean((rgb - tgt) ** 2) + 1e-3 * jnp.mean(sigma)

        return f

    g_f = jax.grad(loss(fused))(params)
    g_r = jax.grad(loss(model.apply_pointwise))(params)
    flat_f = jax.tree_util.tree_leaves_with_path(g_f)
    flat_r = dict(jax.tree_util.tree_leaves_with_path(g_r))
    for path, leaf in flat_f:
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_r[path]), atol=5e-5,
            err_msg=jax.tree_util.keystr(path),
        )
    vid, _ = model.voxel_of(pts)
    touched = np.zeros(model.num_networks, bool)
    touched[np.asarray(vid)] = True
    assert touched.sum() == 1          # the scenario premise: one hot voxel
    g1 = np.asarray(g_f["l1"]["w"])
    assert np.all(g1[~touched] == 0.0)
    assert np.any(g1[touched] != 0.0)


def test_tiny_batch_parity():
    """n far below one tile: the plan is all dummy rows but one fragment;
    outputs and gradients still match pointwise."""
    model = _multi_model()
    params = model.init(jax.random.key(8))
    fused = make_fused_kilonerf_apply(model, tile_fwd=16, tile_bwd=16,
                                      interpret=True)
    pts, dirs = _data(5, seed=8)
    rgb_f, sigma_f = fused(params, pts, dirs)
    rgb_r, sigma_r = model.apply_pointwise(params, pts, dirs)
    np.testing.assert_allclose(np.asarray(rgb_f), np.asarray(rgb_r),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(sigma_f), np.asarray(sigma_r),
                               atol=1e-4)


import pytest


@pytest.mark.parametrize("grid_res,hidden,e_per,n", [
    (2, 8, 1, 37),      # minimal grid, narrow net, single-expert blocks
    (2, 8, 8, 37),      # 8 experts per block on an 8-network grid
    (4, 24, 2, 130),    # h=24 (non-power-of-two), partial-lane blocks
    (3, 16, 9, 200),    # e_per = 27/3: odd block count
])
def test_mixed_tile_shape_fuzz(grid_res, hidden, e_per, n):
    """Forward parity across dispatch shapes no other test exercises:
    tiny grids, narrow/odd hidden dims, extreme experts-per-block, and
    batch sizes far from tile multiples."""
    model = KiloNeRFModel(grid_res=grid_res, hidden_dim=hidden,
                          pos_encoding_dim=3, dir_encoding_dim=2)
    if model.num_networks % e_per:
        pytest.skip("e_per must divide num_networks")
    params = model.init(jax.random.key(grid_res * 100 + hidden))
    fused = make_fused_kilonerf_apply(model, tile_fwd=16, tile_bwd=16,
                                      interpret=True,
                                      experts_per_step=e_per)
    if fused is None:
        pytest.skip("shape unsupported by the kernels")
    pts, dirs = _data(n, seed=n)
    rgb_f, sigma_f = fused(params, pts, dirs)
    rgb_r, sigma_r = model.apply_pointwise(params, pts, dirs)
    np.testing.assert_allclose(np.asarray(rgb_f), np.asarray(rgb_r),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(sigma_f), np.asarray(sigma_r),
                               atol=2e-4)
