"""Sorted-window scatter-add kernel (ops/pallas/scatter_add.py):
interpret-mode parity against the XLA scatter it reformulates, across the
index distributions grid training produces (uniform, clamp-duplicated,
ray-dense) plus the overflow fallback and odd shapes."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nerf_tpu.ops.pallas.scatter_add import _xla_scatter, scatter_add_rows


def _check(ids, vals, num_rows, rel_tol=1e-5, **kw):
    got = scatter_add_rows(jnp.asarray(ids), jnp.asarray(vals), num_rows,
                           interpret=True, force=True, **kw)
    want = _xla_scatter(jnp.asarray(ids), jnp.asarray(vals), num_rows)
    scale = float(jnp.max(jnp.abs(want))) + 1e-9
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=rel_tol * scale)


@pytest.fixture(scope="module")
def data():
    rng = np.random.RandomState(0)
    M, C, NR = 8192, 28, 32768
    ids = rng.randint(0, NR, size=(M,)).astype(np.int32)
    vals = rng.normal(size=(M, C)).astype(np.float32)
    return ids, vals, NR, rng


def test_uniform(data):
    ids, vals, NR, _ = data
    _check(ids, vals, NR, tile=256, window=1024)


def test_heavy_duplicates(data):
    """Border clamping puts up to ~25k rows in one cell (real synthetic
    pools) — summation order differs, values must still agree."""
    ids, vals, NR, rng = data
    ids2 = np.where(rng.rand(len(ids)) < 0.9, 7, ids).astype(np.int32)
    _check(ids2, vals, NR, tile=256, window=1024)


def test_ray_dense(data):
    ids, vals, NR, rng = data
    ids3 = np.sort(rng.randint(0, 2048, size=(len(ids),))).astype(np.int32)
    _check(ids3, vals, NR, tile=256, window=1024)


def test_wide_span_falls_back_exactly(data):
    """One tile spanning more cells than the window -> the flag routes the
    whole call to the XLA scatter; values identical."""
    ids, vals, NR, _ = data
    ids4 = (np.arange(len(ids)) * (NR // len(ids))).astype(np.int32)
    _check(ids4, vals, NR, rel_tol=0.0, tile=1024, window=256)


def test_single_cell_sum_order(data):
    ids, vals, NR, _ = data
    ids5 = np.full((len(ids),), NR - 1, np.int32)
    _check(ids5, vals, NR, tile=256, window=1024)


def test_unpadded_odd_sizes(data):
    ids, vals, NR, _ = data
    _check(ids[:3000], vals[:3000], NR - 5, tile=256, window=1024)


def test_small_input_uses_xla_path(data):
    ids, vals, NR, _ = data
    # below one tile the wrapper must not build a kernel at all
    _check(ids[:100], vals[:100], NR, rel_tol=0.0, tile=256, window=1024)
