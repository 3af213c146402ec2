"""Package metadata smoke checks (the reference has an equivalent
``test_version.py`` against installed metadata)."""

import networks_fenicsx_tpu as pkg


def test_metadata():
    assert pkg.__version__ is not None
    major, *_ = pkg.__version__.split(".")
    assert major.isdigit()
    assert pkg.__license__ == "MIT"
    assert pkg.__program_name__ == "networks_fenicsx_tpu"


def test_public_api_surface():
    # the reference facade names must all resolve
    for name in (
        "NetworkMesh",
        "HydraulicNetworkAssembler",
        "Solver",
        "network_generation",
        "post_processing",
    ):
        assert hasattr(pkg, name), name
