"""Orientation field regression guard (mirrors reference
``tests/test_orientation.py``): on a line graph with in-order / reversed /
alternating edge directions, the assembled scalar
``∫ (e_x · t) * orientation dx`` — with ``t`` the unit tangent of each cell in
STORED vertex order — must equal ±1 or the alternating closed form.  This
exercises the ±1 bookkeeping between stored cell order and graph edge
direction, the subtlest part of the mesh build
(reference ``mesh.py:321-322,374-400``)."""

import networkx as nx
import numpy as np
import pytest

from networks_fenicsx_tpu import NetworkMesh


def linear_graph(n: int, dim: int = 2, ordered=lambda _: True) -> nx.DiGraph:
    G = nx.DiGraph()
    G.add_nodes_from(range(n))
    for i in range(n - 1):
        if ordered(i):
            G.add_edge(i, i + 1)
        else:
            G.add_edge(i + 1, i)
    for i in range(n):
        pos = np.zeros(dim)
        pos[0] = i / (n - 1)
        G.nodes[i]["pos"] = pos
    return G


@pytest.mark.parametrize("n", [30])
@pytest.mark.parametrize("order", ["in", "reverse", "alternating"])
@pytest.mark.parametrize("N", [1, 4, 8])
def test_orientation(n: int, order: str, N: int) -> None:
    if order == "in":
        ordered = lambda _: True  # noqa: E731
    elif order == "reverse":
        ordered = lambda _: False  # noqa: E731
    else:
        ordered = lambda k: k % 2  # noqa: E731

    G = linear_graph(n, ordered=ordered)
    network_mesh = NetworkMesh(G, N=N)

    # ∫ (e_x · t) * orientation dx assembled cell-by-cell:
    # t = stored-order unit tangent, orientation flips it to edge direction.
    ex_dot_t = network_mesh.cell_tangent[:, 0]
    val = float(np.sum(ex_dot_t * network_mesh.orientation * network_mesh.cell_h))

    if order == "in":
        assert np.isclose(val, 1.0)
    elif order == "reverse":
        assert np.isclose(val, -1.0)
    else:
        edge_count = n - 1
        assert np.isclose(val, edge_count % 2 * -1 / edge_count)


@pytest.mark.parametrize("N", [1, 3])
def test_orientation_values(N: int) -> None:
    """With N >= 2 the last cell of each edge is stored flipped (its interior
    vertex id exceeds the edge's target node id); with N == 1 a forward edge
    between consecutive ids is stored in order."""
    G = linear_graph(4)
    mesh = NetworkMesh(G, N=N)
    orient = mesh.orientation.reshape(mesh.num_edges, N)
    if N == 1:
        assert np.all(orient == 1.0)
    else:
        assert np.all(orient[:, :-1] == 1.0)
        assert np.all(orient[:, -1] == -1.0)
