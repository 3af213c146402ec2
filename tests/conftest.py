"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not needed for correctness tests; sharding tests
exercise the same ``shard_map`` program on 8 virtual CPU devices (the CI
analog of the reference's ``mpiexec -n {2,3,4}`` sweeps,
reference ``.github/workflows/test_package.yml:33-45``).

Note: the environment's sitecustomize imports jax at interpreter start, so
``JAX_PLATFORMS`` env tweaks are too late — override via jax.config, which
takes effect at (lazy) backend initialisation.
"""

import os

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", int(os.environ.get("NXFX_CPU_DEVICES", "8")))
jax.config.update("jax_enable_x64", True)
