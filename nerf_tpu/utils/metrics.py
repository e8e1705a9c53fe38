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
