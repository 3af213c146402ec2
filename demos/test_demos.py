"""Run every demo as a subprocess (the reference's integration-test pattern,
``demos/test_demos.py:10-17``; exit code 0 is the pass criterion — solver
failure raises via error_if_not_converged).  The reference also re-runs each
demo under ``mpiexec -np 3``; the multi-device analog lives in
``tests/test_sharding.py`` (virtual 8-device CPU mesh)."""

import os
import subprocess
import sys
from pathlib import Path

import pytest

paths = sorted(p for p in Path(__file__).parent.glob("demo_*.py"))


@pytest.mark.parametrize("path", paths, ids=[d.name for d in paths])
def test(path) -> None:
    env = dict(os.environ, NXFX_PLATFORM="cpu")
    subprocess.run([sys.executable, str(path)], check=True, env=env, timeout=600)
