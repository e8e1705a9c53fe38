"""Fused NeRF MLP Pallas kernel (stub — implemented later this round)."""


def make_fused_nerf_apply(model):
    return None
