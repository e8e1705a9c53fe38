"""Shared building blocks for the functional model zoo.

Models in nerf_tpu are pure functions over parameter pytrees (nested dicts of
``jnp`` arrays): ``model.init(key) -> params`` and
``model.apply(params, points, viewdirs) -> (rgb, sigma)``. This keeps the hot
path trivially jit/vmap/shard_map-able and lets the Pallas kernel consume the
exact same pytree.

Weight convention: ``y = x @ w + b`` with ``w`` of shape (in, out) — the JAX
idiom. The PyTorch reference stores (out, in); transpose when porting.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def uniform_init(key: jax.Array, shape: tuple[int, ...], bound: float) -> jax.Array:
    return jax.random.uniform(
        key, shape, dtype=jnp.float32, minval=-bound, maxval=bound
    )


def linear_init(key: jax.Array, in_dim: int, out_dim: int) -> dict:
    """PyTorch ``nn.Linear`` default init law: weight AND bias drawn from
    U(-1/sqrt(fan_in), 1/sqrt(fan_in)) (kaiming_uniform with a=sqrt(5)).
    Matched so freshly-initialized models have the same statistics as the
    reference (/root/reference/nerf/models.py uses default Linear init)."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / (in_dim ** 0.5)
    return {
        "w": uniform_init(kw, (in_dim, out_dim), bound),
        "b": uniform_init(kb, (out_dim,), bound),
    }


def siren_init(
    key: jax.Array, in_dim: int, out_dim: int, w0: float, is_first: bool, c: float = 6.0
) -> dict:
    """SIREN init (/root/reference/nerf/models.py:117-122): std = 1/dim for
    the first layer else sqrt(c/dim)/w0; uniform for weight AND bias."""
    kw, kb = jax.random.split(key)
    bound = (1.0 / in_dim) if is_first else ((c / in_dim) ** 0.5 / w0)
    return {
        "w": uniform_init(kw, (in_dim, out_dim), bound),
        "b": uniform_init(kb, (out_dim,), bound),
    }


def linear(params: dict, x: jax.Array, compute_dtype=jnp.float32) -> jax.Array:
    """Dense layer with a controllable matmul compute dtype. Accumulation is
    forced to float32 via ``preferred_element_type`` so bfloat16 mode keeps
    full-precision partial sums on the MXU."""
    w = params["w"].astype(compute_dtype)
    xc = x.astype(compute_dtype)
    y = jnp.dot(xc, w, preferred_element_type=jnp.float32)
    return y + params["b"]


def param_count(params) -> int:
    return sum(int(p.size) for p in jax.tree_util.tree_leaves(params))
