"""Mesh-size and geometry invariants of generated trees.

Covers the reference's global invariants (cells = N·(2ⁿ−1), vertices =
N+1+(2ⁿ−2)·N) plus layout properties the reference does not assert."""

import numpy as np
import pytest

from networks_fenicsx_tpu import NetworkMesh, network_generation


def _counts(n: int, N: int) -> tuple[int, int]:
    segments = 2**n - 1
    return N * segments, N + 1 + (segments - 1) * N


@pytest.mark.parametrize(
    "n,H,gdim,N",
    [
        (n, H, gdim, N)
        for gdim in (2, 3)
        for N in (1, 4, 10)
        for n in (2, 5, 7)
        for H in (1, 2)
    ],
)
def test_global_sizes(n, H, gdim, N):
    mesh = NetworkMesh(network_generation.make_tree(n=n, H=H, W=1, dim=gdim), N=N)
    cells, vertices = _counts(n, N)
    assert (mesh.topological_dim, mesh.geometric_dim) == (1, gdim)
    assert mesh.num_cells == cells
    assert mesh.num_vertices == vertices
    assert mesh.num_edges == 2**n - 1


def test_tree_layout_properties():
    n, H, W = 4, 2.0, 3.0
    G = network_generation.make_tree(n, H, W)
    coords = np.array([G.nodes[i]["pos"] for i in range(G.number_of_nodes())])
    # root edge is vertical from the origin
    np.testing.assert_allclose(coords[0], 0.0)
    np.testing.assert_allclose(coords[1], [0, H / n, 0])
    # layout is mirror-symmetric about x = 0 and spans width W at the leaves
    xs = np.sort(coords[:, 0])
    np.testing.assert_allclose(xs, -xs[::-1], atol=1e-12)
    leaves = coords[2 ** (n - 1) :, 0] if n > 1 else coords[:, 0]
    assert np.isclose(coords[:, 0].max() - coords[:, 0].min(), W)
    # heap numbering: parent of node i >= 2 is i // 2
    for u, v in G.edges():
        assert u == v // 2 or (u, v) == (0, 1)


def test_every_node_has_coordinates():
    G = network_generation.make_tree(3, 1.0, 1.0, dim=2)
    for i in G.nodes():
        assert len(G.nodes[i]["pos"]) == 2
