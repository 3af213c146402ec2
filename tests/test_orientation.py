"""Orientation-field regression guard.

The trickiest mesh logic is the ±1 bookkeeping between the order cells are
stored in and the directed graph-edge direction (the reference repairs
this after its partitioner reorders cells, ``mesh.py:374-400``; here the
only reorder is the ascending-vertex-id sort).  The assembled scalar
``∫ (e_x · t) * orientation dx`` — with ``t`` the stored-order unit
tangent — has a closed form on chain graphs for any mix of forward and
reversed edge directions.
"""

import networkx as nx
import numpy as np
import pytest

from networks_fenicsx_tpu import NetworkMesh


def _chain(num_nodes: int, forward_mask) -> nx.DiGraph:
    """Chain of num_nodes-1 unit-spaced segments along x; edge i points
    i→i+1 when forward_mask[i], else i+1→i."""
    G = nx.DiGraph()
    xs = np.linspace(0.0, 1.0, num_nodes)
    for i, x in enumerate(xs):
        G.add_node(i, pos=np.array([x, 0.0]))
    for i in range(num_nodes - 1):
        G.add_edge(i, i + 1) if forward_mask[i] else G.add_edge(i + 1, i)
    return G


def _assembled_tangent_integral(mesh: NetworkMesh) -> float:
    ex_dot_t = mesh.cell_tangent[:, 0]
    return float(np.sum(ex_dot_t * mesh.orientation * mesh.cell_h))


CASES = {
    "forward": (lambda E: np.ones(E, bool), lambda E: 1.0),
    "backward": (lambda E: np.zeros(E, bool), lambda E: -1.0),
    # even-indexed edges reversed: (#fwd - #rev)/E
    "alternating": (
        lambda E: np.arange(E) % 2 == 1,
        lambda E: (E % 2) * (-1.0 / E),
    ),
}


@pytest.mark.parametrize("refinement", [1, 4, 8])
@pytest.mark.parametrize("case", sorted(CASES))
def test_orientation_integral(case: str, refinement: int) -> None:
    E = 29
    mask_fn, expected_fn = CASES[case]
    mesh = NetworkMesh(_chain(E + 1, mask_fn(E)), N=refinement)
    assert np.isclose(_assembled_tangent_integral(mesh), expected_fn(E))


@pytest.mark.parametrize("N", [1, 3])
def test_orientation_values(N: int) -> None:
    """With N >= 2 the last cell of each edge is stored flipped (its
    interior vertex id exceeds the edge's target node id); with N == 1 a
    forward edge between consecutive ids is stored in order."""
    mesh = NetworkMesh(_chain(4, np.ones(3, bool)), N=N)
    orient = mesh.orientation.reshape(mesh.num_edges, N)
    if N == 1:
        assert np.all(orient == 1.0)
    else:
        assert np.all(orient[:, :-1] == 1.0)
        assert np.all(orient[:, -1] == -1.0)


def test_orientation_consistent_with_edge_direction() -> None:
    """orientation * stored tangent must reproduce the graph edge
    direction for every cell, whatever the input edge orientation."""
    rng = np.random.default_rng(7)
    mesh = NetworkMesh(_chain(12, rng.random(11) < 0.5), N=3)
    edge_dir = (
        mesh.vertices[mesh.edges[:, 1]] - mesh.vertices[mesh.edges[:, 0]]
    )
    edge_dir /= np.linalg.norm(edge_dir, axis=1, keepdims=True)
    recovered = mesh.cell_tangent * mesh.orientation[:, None]
    np.testing.assert_allclose(recovered, edge_dir[mesh.cell_edge], atol=1e-12)
