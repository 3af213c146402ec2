"""Package metadata smoke test (reference ``tests/test_version.py``)."""

import networks_fenicsx_tpu


def test_version():
    assert networks_fenicsx_tpu.__version__ is not None
