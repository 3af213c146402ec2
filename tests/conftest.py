"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not needed for correctness tests; sharding tests
exercise the same ``shard_map`` program on 8 virtual CPU devices (the CI
analog of the reference's ``mpiexec -n {2,3,4}`` sweeps,
reference ``.github/workflows/test_package.yml:33-45``).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
