"""Backend selection and compilation-cache helpers.

The deployment environment preloads jax via sitecustomize, so the usual
``JAX_PLATFORMS`` env variable is read before user code runs.  Demos and
scripts call :func:`apply_platform_env` to honor ``NXFX_PLATFORM`` /
``NXFX_CPU_DEVICES`` / ``NXFX_COMPILATION_CACHE`` at startup (before the
backend is initialised).
"""

from __future__ import annotations

import os
from pathlib import Path

__all__ = ["apply_platform_env", "enable_compilation_cache", "default_cache_dir"]


def default_cache_dir() -> Path:
    """Default persistent XLA compilation cache location."""
    base = os.environ.get("XDG_CACHE_HOME") or os.path.expanduser("~/.cache")
    return Path(base) / "networks_fenicsx_tpu" / "xla"


def enable_compilation_cache(
    cache_dir: str | Path | None = None,
    min_compile_time_secs: float = 0.5,
) -> Path:
    """Enable JAX's persistent compilation cache.

    The role FFCx's on-disk kernel cache plays for the reference
    (``demos/demo_perf.py:41-47,116-132``): a fresh process re-solving the
    same problem structure loads the serialized XLA executable instead of
    recompiling — measured on the benchmark TPU, the 5.3M-dof fused solve's
    warmup drops from minutes (cold compile) to seconds (cache
    deserialization).  Safe to call more than once.

    Args:
        cache_dir: Cache directory (default: ``NXFX_COMPILATION_CACHE`` if it
            names a path, else ``~/.cache/networks_fenicsx_tpu/xla``).
        min_compile_time_secs: Only compilations at least this slow are
            persisted (skips trivially-recompilable dispatches).

    Returns:
        The cache directory in effect.
    """
    import jax

    if cache_dir is None:
        env = os.environ.get("NXFX_COMPILATION_CACHE")
        cache_dir = env if env and env not in ("1", "true", "on") else None
    cache_dir = Path(cache_dir) if cache_dir is not None else default_cache_dir()
    cache_dir.mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", min_compile_time_secs)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return cache_dir


def apply_platform_env() -> None:
    import jax

    platform = os.environ.get("NXFX_PLATFORM")
    if platform:
        jax.config.update("jax_platforms", platform)
    n_cpu = os.environ.get("NXFX_CPU_DEVICES")
    if n_cpu:
        jax.config.update("jax_num_cpu_devices", int(n_cpu))
    if os.environ.get("NXFX_COMPILATION_CACHE"):
        enable_compilation_cache()
