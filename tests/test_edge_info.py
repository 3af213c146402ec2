"""Bifurcation detection and in/out incidence on a hand-built graph with
multi-in/multi-out junctions (mirrors reference ``tests/test_edge_info.py``)."""

import networkx as nx
import numpy as np
import pytest

from networks_fenicsx_tpu import NetworkMesh


def _junction_graph() -> nx.DiGraph:
    # One inlet (0) -> (1) -> (7); (7) fans out to three branches that regroup
    # at (5) before the outlet (6).  Node 5 has 2 in / 1 out ... per reference.
    G = nx.DiGraph()
    G.add_node(0, pos=np.zeros(3))
    G.add_node(1, pos=np.array([0.0, 0.0, 1.0]))
    G.add_node(2, pos=np.array([0.2, 0.2, 2.0]))
    G.add_node(3, pos=np.array([-0.2, 0.3, 2.0]))
    G.add_node(4, pos=np.array([0.0, 0.1, 2.1]))
    G.add_node(5, pos=np.array([0.1, -0.1, 3.0]))
    G.add_node(6, pos=np.array([-0.3, 0.4, 4.0]))
    G.add_node(7, pos=1.1 * np.array([0.0, 0.0, 1.0]))
    G.add_edge(0, 1)
    G.add_edge(1, 7)
    G.add_edge(7, 2)
    G.add_edge(2, 5)
    G.add_edge(7, 3)
    G.add_edge(3, 4)
    G.add_edge(4, 5)
    G.add_edge(7, 4)
    G.add_edge(5, 6)
    return G


@pytest.mark.parametrize("N", [10, 50])
def test_edge_info(N: int):
    network_mesh = NetworkMesh(_junction_graph(), N=N)
    assert len(network_mesh.bifurcation_values) == 6
    # Bifurcation values are sorted in increasing order
    np.testing.assert_allclose([1, 2, 3, 4, 5, 7], network_mesh.bifurcation_values)

    expected = {0: (1, 1), 1: (1, 1), 2: (1, 1), 3: (2, 1), 4: (2, 1), 5: (1, 3)}
    for idx, (n_in, n_out) in expected.items():
        assert len(network_mesh.in_edges(idx)) == n_in
        assert len(network_mesh.out_edges(idx)) == n_out


@pytest.mark.parametrize("N", [10])
def test_edge_coloring_proper(N: int):
    """Edges sharing a node must get different colors for every strategy."""
    for strategy in [None, "largest_first", "smallest_last", "fast"]:
        mesh = NetworkMesh(_junction_graph(), N=N, color_strategy=strategy)
        edges = mesh.edges
        colors = mesh.edge_color
        for i in range(len(edges)):
            for j in range(i + 1, len(edges)):
                if set(edges[i]) & set(edges[j]):
                    assert colors[i] != colors[j], (edges[i], edges[j], strategy)
