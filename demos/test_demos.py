"""Run every demo as a subprocess (the reference's integration-test pattern,
``demos/test_demos.py:10-17``; exit code 0 is the pass criterion — solver
failure raises via error_if_not_converged).  Mirroring the reference's
``mpiexec -np 3`` re-runs (``demos/test_demos.py:15-17``), every demo also
runs on a virtual 8-device CPU mesh (``NXFX_CPU_DEVICES=8``) —
``demo_sharded.py`` routes through ``ShardedNetworkSolver`` end-to-end
(solve → extract → export) there."""

import os
import subprocess
import sys
from pathlib import Path

import pytest

paths = sorted(p for p in Path(__file__).parent.glob("demo_*.py"))


@pytest.mark.parametrize("ndev", [1, 8], ids=["1dev", "8dev"])
@pytest.mark.parametrize("path", paths, ids=[d.name for d in paths])
def test(path, ndev) -> None:
    if ndev > 1 and path.name == "demo_perf.py":
        pytest.skip("perf sweep is a single-device benchmark harness")
    env = dict(os.environ, NXFX_PLATFORM="cpu", NXFX_CPU_DEVICES=str(ndev))
    subprocess.run([sys.executable, str(path)], check=True, env=env, timeout=600)
