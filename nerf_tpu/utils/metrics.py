"""Quality metrics.

``mse_to_psnr`` matches the reference formula exactly
(/root/reference/nerf/loss.py:14): ``20 * log10(1 / sqrt(mse))``, i.e.
``-10 * log10(mse)``. Works on Python floats, NumPy and JAX arrays.
"""

from __future__ import annotations

import numpy as np


def mse_to_psnr(mse):
    import jax.numpy as jnp

    if hasattr(mse, "dtype") and not isinstance(mse, np.ndarray):
        return 20.0 * jnp.log10(1.0 / jnp.sqrt(mse))
    return 20.0 * np.log10(1.0 / np.sqrt(mse))


def _gauss(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    x = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    g = np.exp(-0.5 * (x / sigma) ** 2)
    return g / g.sum()


def ssim(a, b, max_val: float = 1.0) -> float:
    """Mean structural similarity of two (H, W, C) or (H, W) images in
    [0, max_val] — the standard Wang et al. 2004 formulation: 11x11
    Gaussian window (sigma 1.5), k1=0.01/k2=0.03, valid-mode windows.
    Host-side NumPy (an eval metric, not a training loss; the reference
    reports PSNR only — SSIM is the usual companion in the NeRF papers)."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    if a.ndim == 2:
        a, b = a[..., None], b[..., None]
    k = _gauss()

    def filt(x):
        x = np.apply_along_axis(np.convolve, 0, x, k, mode="valid")
        return np.apply_along_axis(np.convolve, 1, x, k, mode="valid")

    mu_a, mu_b = filt(a), filt(b)
    var_a = filt(a * a) - mu_a * mu_a
    var_b = filt(b * b) - mu_b * mu_b
    cov = filt(a * b) - mu_a * mu_b
    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2
    s = ((2 * mu_a * mu_b + c1) * (2 * cov + c2)) / (
        (mu_a * mu_a + mu_b * mu_b + c1) * (var_a + var_b + c2)
    )
    return float(s.mean())
