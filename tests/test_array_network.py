"""ArrayNetwork (array-native graph input) must be indistinguishable from
the networkx.DiGraph path: identical numbering, geometry, coloring, and
solutions."""

import numpy as np
import pytest

from networks_fenicsx_tpu import (
    ArrayNetwork,
    HydraulicNetworkAssembler,
    NetworkMesh,
    Solver,
    network_generation,
)


def _mesh_fields_equal(a: NetworkMesh, b: NetworkMesh):
    np.testing.assert_array_equal(a.vertices, b.vertices)
    np.testing.assert_array_equal(a.cells, b.cells)
    np.testing.assert_array_equal(a.cell_color, b.cell_color)
    np.testing.assert_array_equal(a.orientation, b.orientation)
    np.testing.assert_array_equal(a.edge_color, b.edge_color)
    np.testing.assert_array_equal(a.edges, b.edges)
    np.testing.assert_array_equal(a.bifurcation_values, b.bifurcation_values)
    np.testing.assert_array_equal(a.boundary_values, b.boundary_values)
    if a.edge_radius is None:
        assert b.edge_radius is None
    else:
        np.testing.assert_array_equal(a.edge_radius, b.edge_radius)


@pytest.mark.parametrize("strategy", ["fast", None])
def test_tree_arrays_matches_nx(strategy):
    G_nx = network_generation.make_tree(4, 1.0, 2.0)
    G_ar = network_generation.make_tree(4, 1.0, 2.0, arrays=True)
    assert isinstance(G_ar, ArrayNetwork)
    assert G_ar.number_of_nodes() == G_nx.number_of_nodes()
    assert G_ar.number_of_edges() == G_nx.number_of_edges()
    m_nx = NetworkMesh(G_nx, N=3, color_strategy=strategy)
    m_ar = NetworkMesh(G_ar, N=3, color_strategy=strategy)
    _mesh_fields_equal(m_nx, m_ar)


def test_grid_arrays_matches_nx():
    G_nx = network_generation.make_grid(4, 3)
    G_ar = network_generation.make_grid(4, 3, arrays=True)
    m_nx = NetworkMesh(G_nx, N=2, color_strategy="fast")
    m_ar = NetworkMesh(G_ar, N=2, color_strategy="fast")
    _mesh_fields_equal(m_nx, m_ar)


def test_arterial_arrays_matches_nx():
    kw = dict(N=5, direction=np.array([0.1, 1.0, 0.0]))
    G_nx = network_generation.make_arterial_tree(**kw)
    G_ar = network_generation.make_arterial_tree(arrays=True, **kw)
    assert G_ar.radius is not None
    m_nx = NetworkMesh(G_nx, N=3, color_strategy="fast")
    m_ar = NetworkMesh(G_ar, N=3, color_strategy="fast")
    _mesh_fields_equal(m_nx, m_ar)


def test_arterial_arrays_requires_deterministic():
    with pytest.raises(ValueError, match="arrays=True"):
        network_generation.make_arterial_tree(N=3, random=True, seed=0, arrays=True)


def test_solve_on_array_network():
    G = network_generation.make_tree(2, 1, 3, arrays=True)
    mesh = NetworkMesh(G, N=4)
    asm = HydraulicNetworkAssembler(mesh)
    asm.compute_forms(p_bc_ex=lambda x: x[1])
    s = Solver(asm)
    s.assemble()
    sol = s.solve()
    lam = np.ravel(np.asarray(sol[-1].array))[0]
    np.testing.assert_allclose(lam, -1.0 / (np.sqrt(2.5) + 1.0), atol=1e-10)


def test_networkx_strategy_on_array_network():
    """networkx coloring strategies work on ArrayNetwork via conversion."""
    G_ar = network_generation.make_tree(3, 1.0, 2.0, arrays=True)
    G_nx = network_generation.make_tree(3, 1.0, 2.0)
    m_ar = NetworkMesh(G_ar, N=2, color_strategy="largest_first")
    m_nx = NetworkMesh(G_nx, N=2, color_strategy="largest_first")
    _mesh_fields_equal(m_nx, m_ar)


def test_array_network_validation():
    bad = ArrayNetwork(
        pos=np.zeros((3, 2)), edges=np.array([[0, 5]], dtype=np.int64)
    )
    with pytest.raises(ValueError, match="out of range"):
        NetworkMesh(bad, N=1)
    with pytest.raises(TypeError):
        NetworkMesh([[0, 1]], N=1)  # type: ignore[arg-type]
