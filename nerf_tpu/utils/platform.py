"""Platform selection for the CLIs.

``NERF_TPU_PLATFORM=cpu`` (or ``tpu``, or a comma list like ``tpu,cpu``)
restricts which JAX backends are *initialized*, via
``jax.config.update("jax_platforms", ...)`` before first backend use.

This is deliberately NOT ``JAX_PLATFORM_NAME``: that variable only picks
the default among plugins that already initialized, so a remote-TPU
plugin whose tunnel is down still blocks startup in an infinite connect
retry. Restricting ``jax_platforms`` keeps the plugin from initializing
at all — the only reliable CPU escape hatch on tunneled-TPU hosts
(tests/conftest.py uses the same mechanism for the virtual CPU mesh).
"""

from __future__ import annotations

import os


def apply_platform_env() -> None:
    """Honor ``NERF_TPU_PLATFORM`` if set. Call before any JAX backend use
    (the CLIs call it first thing in ``main``)."""
    platforms = os.environ.get("NERF_TPU_PLATFORM")
    if platforms:
        import jax

        jax.config.update("jax_platforms", platforms)
