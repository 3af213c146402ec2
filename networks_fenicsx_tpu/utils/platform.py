"""Backend selection helper.

The deployment environment preloads jax via sitecustomize, so the usual
``JAX_PLATFORMS`` env variable is read before user code runs.  Demos and
scripts call :func:`apply_platform_env` to honor ``NXFX_PLATFORM`` /
``NXFX_CPU_DEVICES`` at startup (before the backend is initialised).
"""

from __future__ import annotations

import os

__all__ = ["apply_platform_env"]


def apply_platform_env() -> None:
    import jax

    platform = os.environ.get("NXFX_PLATFORM")
    if platform:
        jax.config.update("jax_platforms", platform)
    n_cpu = os.environ.get("NXFX_CPU_DEVICES")
    if n_cpu:
        jax.config.update("jax_num_cpu_devices", int(n_cpu))
