"""Demo bootstrap: make the in-repo package importable when a demo is run as
a script, and honor NXFX_PLATFORM/NXFX_CPU_DEVICES before the JAX backend
initialises."""

import sys
from pathlib import Path

_repo_root = str(Path(__file__).resolve().parent.parent)
if _repo_root not in sys.path:
    sys.path.insert(0, _repo_root)

from networks_fenicsx_tpu.utils.platform import apply_platform_env  # noqa: E402

apply_platform_env()
