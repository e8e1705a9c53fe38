"""Fused SIREN MLP Pallas kernel (stub — implemented later this round)."""


def make_fused_siren_apply(model):
    return None
