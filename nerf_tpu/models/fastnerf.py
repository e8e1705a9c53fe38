"""FastNeRF: factorized position/direction field (reference roadmap,
/root/reference/notes.txt:5; Garbin et al. 2021).

FastNeRF splits the NeRF field into two independent networks so the
expensive position branch can be cached on a dense grid and a view only
costs gathers plus an inner product:

    F_pos(x)  -> sigma, {f_i in R^3}_{i=1..D}   (position-dependent factors)
    F_dir(d)  -> {beta_i}_{i=1..D}              (view-dependent weights)
    rgb(x, d) = sigmoid( sum_i beta_i * f_i )

The factorized head is the architecture; ``bake`` + ``BakedFastNeRF``
below implement the paper's acceleration: F_pos sampled on a dense 3-D
grid and F_dir on a direction grid, after which rendering touches no MLP
at all — trilinear/bilinear interpolation and a (D,3) contraction per
sample, which on TPU is a tiny gather + VPU FMA chain.

Trunk mirrors the repo's NeRF (models/nerf.py): 8 layers, skip concat at
layer 5, torch-default Linear init, relu density with the deterministic
density-bias guard. The direction net is 2 layers on the L=4 frequency
encoding. Plugs into the renderer/trainer through the standard
``apply(params, points, viewdirs) -> (rgb, sigma)`` contract.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from nerf_tpu.models.common import (
    linear,
    linear_init,
    skip_trunk_apply,
    skip_trunk_init,
)
from nerf_tpu.models.encoding import encoded_dim, positional_encoding
from nerf_tpu.ops.interp import bilinear as _bilinear
from nerf_tpu.ops.interp import trilinear as _trilinear


@dataclass(frozen=True)
class FastNeRFModel:
    pos_encoding_dim: int = 10
    dir_encoding_dim: int = 4
    hidden_dim: int = 256
    dir_hidden_dim: int = 128
    num_factors: int = 8           # D: rank of the rgb factorization
    compute_dtype: str = "float32"
    reference_init: bool = False   # strict parity: skip the density-bias guard
    use_grid_kernel: bool = True   # threaded into the baked cache; false =
                                   # pure gather path (use_pallas contract)
    domain: tuple = (-1.0, 1.0)    # cube of model-input space ``bake``
                                   # samples (registry.py::grid_domain) —
                                   # the live MLP itself is domain-free,
                                   # but the cache must cover where the
                                   # renderer's normalized queries land

    name: str = "fastnerf"
    wants_tile_order = True     # class traits, see plenoxels.py
    eval_gather_bound = True

    @property
    def pos_in(self) -> int:
        return encoded_dim(3, self.pos_encoding_dim)

    @property
    def dir_in(self) -> int:
        return encoded_dim(3, self.dir_encoding_dim)

    def init(self, key: jax.Array) -> dict:
        h, d = self.hidden_dim, self.num_factors
        keys = iter(jax.random.split(key, 16))
        # shared skip trunk; head = [sigma, D x 3 rgb factors]
        params = skip_trunk_init(keys, self.pos_in, h, 1 + 3 * d,
                                 self.reference_init)
        params["dir"] = [
            linear_init(next(keys), self.dir_in, self.dir_hidden_dim),
            linear_init(next(keys), self.dir_hidden_dim, d),
        ]
        return params

    # ------------------------------------------------------------- factors

    def pos_factors(
        self, params: dict, points: jax.Array
    ) -> tuple[jax.Array, jax.Array]:
        """F_pos: (..., 3) -> (sigma (...,), factors (..., D, 3)).

        Points are expected pre-normalized to [-1,1] by the renderer."""
        cdt = jnp.dtype(self.compute_dtype)
        p_enc = positional_encoding(points, self.pos_encoding_dim)
        sigma, tail = skip_trunk_apply(params, p_enc, cdt)
        factors = tail.reshape(*tail.shape[:-1], self.num_factors, 3)
        return sigma, factors

    def dir_weights(self, params: dict, viewdirs: jax.Array) -> jax.Array:
        """F_dir: (..., 3) unit dirs -> beta (..., D)."""
        cdt = jnp.dtype(self.compute_dtype)
        y = positional_encoding(viewdirs, self.dir_encoding_dim)
        y = jax.nn.relu(linear(params["dir"][0], y, cdt))
        return linear(params["dir"][1], y, cdt)

    def apply(
        self, params: dict, points: jax.Array, viewdirs: jax.Array
    ) -> tuple[jax.Array, jax.Array]:
        """points/viewdirs (..., 3) -> (rgb (..., 3), sigma (...,))."""
        sigma, factors = self.pos_factors(params, points)
        beta = self.dir_weights(params, viewdirs)
        rgb = jax.nn.sigmoid(jnp.einsum("...d,...dc->...c", beta, factors))
        return rgb, sigma

    # -------------------------------------------------------------- baking

    def bake(self, params: dict, grid_res: int = 128, dir_res: int = 64,
             chunk: int = 65536) -> "BakedFastNeRF":
        """Sample F_pos on a dense grid over ``domain``^3 and F_dir on a
        lat/long direction grid — the paper's cache. After this, rendering
        never evaluates an MLP (see BakedFastNeRF.apply).

        Memory: grid_res^3 * (1 + 3D) floats; 128^3 * 25 = 52M f32 = 210 MB
        (stored f32 for interpolation accuracy; fits single-chip HBM).
        """
        r = grid_res
        lin = jnp.linspace(self.domain[0], self.domain[1], r,
                           dtype=jnp.float32)
        pts = jnp.stack(jnp.meshgrid(lin, lin, lin, indexing="ij"),
                        axis=-1).reshape(-1, 3)

        def pos_chunk(p):
            s, f = self.pos_factors(params, p)
            return jnp.concatenate([s[:, None], f.reshape(-1, 3 * self.num_factors)],
                                   axis=-1)

        n = pts.shape[0]
        pad = (-n) % chunk
        pts_p = jnp.concatenate([pts, jnp.zeros((pad, 3), jnp.float32)])
        vals = jax.lax.map(pos_chunk, pts_p.reshape(-1, chunk, 3))
        sigma_grid = vals.reshape(-1, 1 + 3 * self.num_factors)[:n]

        # direction grid: theta in [0, pi] x phi in [-pi, pi]
        th = jnp.linspace(0.0, jnp.pi, dir_res, dtype=jnp.float32)
        ph = jnp.linspace(-jnp.pi, jnp.pi, 2 * dir_res, dtype=jnp.float32)
        tt, pp = jnp.meshgrid(th, ph, indexing="ij")
        dirs = jnp.stack(
            [jnp.sin(tt) * jnp.cos(pp), jnp.sin(tt) * jnp.sin(pp), jnp.cos(tt)],
            axis=-1,
        ).reshape(-1, 3)
        beta_grid = self.dir_weights(params, dirs).reshape(
            dir_res, 2 * dir_res, self.num_factors
        )
        pos_grid = sigma_grid.reshape(r, r, r, 1 + 3 * self.num_factors)
        packed_pos = None
        from nerf_tpu.ops.pallas.fused_grid import pack_grid, packable

        if self.use_grid_kernel and packable(pos_grid.shape):
            packed_pos = pack_grid(pos_grid, jnp.bfloat16)
        return BakedFastNeRF(
            pos_grid=pos_grid,
            beta_grid=beta_grid,
            num_factors=self.num_factors,
            use_grid_kernel=self.use_grid_kernel,
            packed_pos=packed_pos,
            domain=self.domain,
        )


class BakedFastNeRF(NamedTuple):
    """MLP-free FastNeRF cache: trilinear position grid + bilinear
    direction grid. Drop-in ``apply(params=None, points, dirs)`` with the
    standard field contract so the renderer can drive it directly."""

    pos_grid: jax.Array    # (R, R, R, 1+3D)
    beta_grid: jax.Array   # (T, 2T, D)
    num_factors: int
    use_grid_kernel: bool = True
    packed_pos: Optional[jax.Array] = None  # pack_grid(pos_grid, bf16),
                                            # computed once at bake time
    domain: tuple = (-1.0, 1.0)  # cube of input space pos_grid spans

    wants_tile_order = True     # class trait, see plenoxels.py

    def beta(self, dirs: jax.Array) -> jax.Array:
        """F_dir from the cache: lat/long lookup of the per-direction
        factor weights — (N, 3) unit dirs -> (N, D). The single source of
        the direction-grid parameterization (apply and the fused grid
        render kernel's basis both call it)."""
        t_res, p_res = self.beta_grid.shape[0], self.beta_grid.shape[1]
        theta = jnp.arccos(jnp.clip(dirs[:, 2], -1.0, 1.0))
        phi = jnp.arctan2(dirs[:, 1], dirs[:, 0])
        u = theta / jnp.pi * (t_res - 1)
        v = (phi + jnp.pi) / (2 * jnp.pi) * (p_res - 1)
        return _bilinear(self.beta_grid, u, v)

    def apply(self, params, points: jax.Array, viewdirs: jax.Array):
        del params  # the grids ARE the parameters
        from nerf_tpu.models.common import remap_domain

        points = remap_domain(points, self.domain)
        shape = points.shape[:-1]
        d = viewdirs.reshape(-1, 3)

        if points.ndim == 3 and self.use_grid_kernel:
            # Ray-structured eval queries ride the coherent brick-DMA
            # kernel (ops/pallas/fused_grid.py) when the rays are
            # block-ordered; incoherent batches fall back to the pure
            # gather path inside. 1+3D = 25 channels <= the kernel's
            # 32-lane pad. Baked caches are eval-only, so bf16 interp
            # (~5e-3 rel) is the right default.
            from nerf_tpu.ops.pallas.fused_grid import trilinear_rays

            vals = trilinear_rays(self.pos_grid, points,
                                  packed=self.packed_pos).reshape(
                -1, self.pos_grid.shape[-1]
            )
        else:
            vals = _trilinear(self.pos_grid, points.reshape(-1, 3))
        sigma = jax.nn.relu(vals[:, 0])
        factors = vals[:, 1:].reshape(-1, self.num_factors, 3)
        beta = self.beta(d)                          # (N, D)
        rgb = jax.nn.sigmoid(jnp.einsum("nd,ndc->nc", beta, factors))
        return rgb.reshape(*shape, 3), sigma.reshape(shape)


