"""Fused Pallas TPU kernels for the hot path.

`get_fused_apply(model)` returns a drop-in replacement for ``model.apply``
backed by a fused Pallas kernel (encoding + MLP in VMEM per point tile), or
``None`` when no kernel covers the model/backend — callers then fall back to
the pure-JAX path, which remains the numerical reference.
"""

from __future__ import annotations

import jax


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

        return make_fused_nerf_apply(model)
    if isinstance(model, SirenModel):
        from nerf_tpu.ops.pallas.fused_siren import make_fused_siren_apply

        return make_fused_siren_apply(model)
    return None
