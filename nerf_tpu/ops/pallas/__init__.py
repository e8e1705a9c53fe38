"""Fused Pallas TPU kernels for the hot path.

`get_fused_apply(model)` returns a drop-in replacement for ``model.apply``
backed by a fused Pallas kernel (encoding + MLP in VMEM per point tile), or
``None`` when no kernel covers the model/backend — callers then fall back to
the pure-JAX path, which remains the numerical reference.
"""

from __future__ import annotations

import os

import jax


def _tile_overrides() -> dict:
    """Optional kernel tile overrides for tuning sweeps (env vars
    NERF_TPU_TILE_FWD / NERF_TPU_TILE_BWD)."""
    out = {}
    if os.environ.get("NERF_TPU_TILE_FWD"):
        out["tile_fwd"] = int(os.environ["NERF_TPU_TILE_FWD"])
    if os.environ.get("NERF_TPU_TILE_BWD"):
        out["tile_bwd"] = int(os.environ["NERF_TPU_TILE_BWD"])
    return out


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def get_fused_apply(model):
    """Fused apply for supported models on TPU; None otherwise."""
    if not _on_tpu():
        return None
    from nerf_tpu.models.nerf import NeRFModel
    from nerf_tpu.models.siren import SirenModel

    if isinstance(model, NeRFModel):
        from nerf_tpu.ops.pallas.fused_nerf import make_fused_nerf_apply

        return make_fused_nerf_apply(model, **_tile_overrides())
    if isinstance(model, SirenModel):
        from nerf_tpu.ops.pallas.fused_siren import make_fused_siren_apply

        return make_fused_siren_apply(model, **_tile_overrides())
    from nerf_tpu.models.gabor import GaborModel

    if isinstance(model, GaborModel):
        from nerf_tpu.ops.pallas.fused_gabor import make_fused_gabor_apply

        return make_fused_gabor_apply(model, **_tile_overrides())
    from nerf_tpu.models.kilonerf import KiloNeRFModel

    if isinstance(model, KiloNeRFModel):
        from nerf_tpu.ops.pallas.fused_kilonerf import (
            make_fused_kilonerf_apply,
        )

        return make_fused_kilonerf_apply(model, **_tile_overrides())
    return None


def _render_tile_overrides() -> dict:
    out = {}
    if os.environ.get("NERF_TPU_RENDER_TILE_FWD"):
        out["tile_points_fwd"] = int(os.environ["NERF_TPU_RENDER_TILE_FWD"])
    if os.environ.get("NERF_TPU_RENDER_TILE_BWD"):
        out["tile_points_bwd"] = int(os.environ["NERF_TPU_RENDER_TILE_BWD"])
    return out


def get_fused_render(model, settings):
    """Fully fused render kernel (sampling positions + field + compositing
    in one Pallas program, ops/pallas/fused_render.py) for supported models
    on TPU; None otherwise. ``settings`` is a RenderSettings."""
    if not _on_tpu():
        return None
    from nerf_tpu.models.nerf import NeRFModel

    if isinstance(model, NeRFModel):
        from nerf_tpu.ops.pallas.fused_render import make_fused_nerf_render

        return make_fused_nerf_render(
            model, settings.near, settings.far,
            normalize=settings.normalize_positions,
            **_render_tile_overrides(),
        )
    from nerf_tpu.models.siren import SirenModel

    if isinstance(model, SirenModel):
        from nerf_tpu.ops.pallas.fused_render_siren import (
            make_fused_siren_render,
        )

        return make_fused_siren_render(
            model, settings.near, settings.far,
            normalize=settings.normalize_positions,
            **_render_tile_overrides(),
        )
    from nerf_tpu.models.gabor import GaborModel

    if isinstance(model, GaborModel):
        from nerf_tpu.ops.pallas.fused_render_gabor import (
            make_fused_gabor_render,
        )

        return make_fused_gabor_render(
            model, settings.near, settings.far,
            normalize=settings.normalize_positions,
            **_render_tile_overrides(),
        )
    from nerf_tpu.models.fastnerf import BakedFastNeRF
    from nerf_tpu.models.plenoxels import PlenoxelsModel

    if isinstance(model, (PlenoxelsModel, BakedFastNeRF)):
        # eval-only (model.eval_only): interp + decode + compositing in one
        # kernel for the grid families; training keeps the pure gather
        # path whose custom VJP is exact
        from nerf_tpu.ops.pallas.fused_grid_render import (
            make_fused_grid_render,
        )

        return make_fused_grid_render(
            model, settings.near, settings.far,
            normalize=settings.normalize_positions,
            # sizes the kernel's depth steps to the worst-case sample
            # spacing (the coarse stratified spacing — both hierarchical
            # passes contain it); the fixed default fit ~0% of real
            # render chunks and silently gathered everything
            num_coarse=settings.num_samples,
        )
    return None
