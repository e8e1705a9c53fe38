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


def setup_compilation_cache() -> None:
    """Enable JAX's persistent compilation cache (on-disk, keyed by program
    + compile options + backend version).

    Why this exists: every bench-suite row and every CLI invocation runs in
    its own process, and a cold Mosaic/XLA compile of the fused kernels
    costs tens of seconds to minutes on the tunneled TPU (round 3's driver
    bench run lost a 900 s row to one cold gabor compile). With the cache,
    any program compiled once on this machine is a disk hit forever after.

    Cache dir: ``NERF_TPU_COMPILE_CACHE`` (set to ``0`` to disable), default
    ``<repo>/.jax_compile_cache``. Safe across concurrent processes (JAX
    writes entries atomically).
    """
    d = os.environ.get("NERF_TPU_COMPILE_CACHE")
    if d == "0":
        return
    if not d:
        d = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))),
            ".jax_compile_cache",
        )
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", d)
        # default min_compile_time is 1s; keep it (sub-second programs are
        # cheaper to recompile than to hash+stat), but cache every backend
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:  # pragma: no cover - older jax without the knob
        pass


def apply_platform_env() -> None:
    """Honor ``NERF_TPU_PLATFORM`` if set, and enable the persistent
    compilation cache. Call before any JAX backend use (the CLIs call it
    first thing in ``main``)."""
    platforms = os.environ.get("NERF_TPU_PLATFORM")
    if platforms:
        import jax

        jax.config.update("jax_platforms", platforms)
    setup_compilation_cache()
