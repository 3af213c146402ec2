"""Assembly verification against hand-derived systems.

The single-edge system below is fully derivable by hand, providing an exact
regression anchor for the sign conventions of the reference forms
(reference ``assembly.py:253-277``): with an edge from (0,0) to (0,1),
``p_bc = y``, ``R = 1``, ``N = 1``, ``k = 1`` the discrete system is

    [ 1/3  1/6  +1 ] [q0]   [0]
    [ 1/6  1/3  -1 ] [q1] = [1]
    [ -1   +1    0 ] [p ]   [0]

with solution q0 = q1 = 1, p = −1/2 (the reference convention yields the
negative of the physical pressure for the given p_bc).
"""

import networkx as nx
import numpy as np
import pytest

from networks_fenicsx_tpu import HydraulicNetworkAssembler, NetworkMesh


def single_edge_graph(reverse: bool = False) -> nx.DiGraph:
    G = nx.DiGraph()
    G.add_node(0, pos=np.array([0.0, 0.0]))
    G.add_node(1, pos=np.array([0.0, 1.0]))
    if reverse:
        G.add_edge(1, 0)
    else:
        G.add_edge(0, 1)
    return G


def p_bc_y(x):
    return x[1]


def test_single_edge_matrix():
    mesh = NetworkMesh(single_edge_graph(), N=1)
    asm = HydraulicNetworkAssembler(mesh)
    asm.compute_forms(p_bc_ex=p_bc_y)
    A, b = asm.assemble(kind="dense")
    A = np.asarray(A)
    expected = np.array(
        [
            [1 / 3, 1 / 6, 1.0],
            [1 / 6, 1 / 3, -1.0],
            [-1.0, 1.0, 0.0],
        ]
    )
    np.testing.assert_allclose(A, expected, atol=1e-14)
    np.testing.assert_allclose(np.asarray(b), [0.0, 1.0, 0.0], atol=1e-14)


def test_single_edge_solution():
    mesh = NetworkMesh(single_edge_graph(), N=1)
    asm = HydraulicNetworkAssembler(mesh)
    asm.compute_forms(p_bc_ex=p_bc_y)
    A, b = asm.assemble(kind="dense")
    x = np.linalg.solve(np.asarray(A), np.asarray(b))
    np.testing.assert_allclose(x, [1.0, 1.0, -0.5], atol=1e-12)


@pytest.mark.parametrize("reverse", [False, True])
@pytest.mark.parametrize("N", [1, 2, 8])
def test_single_edge_refined(N: int, reverse: bool):
    """Constant flux 1 and p = −y at cell midpoints, independent of N and of
    the direction the edge was entered in the graph."""
    mesh = NetworkMesh(single_edge_graph(reverse), N=N)
    asm = HydraulicNetworkAssembler(mesh)
    asm.compute_forms(p_bc_ex=p_bc_y)
    A, b = asm.assemble(kind="dense")
    x = np.linalg.solve(np.asarray(A), np.asarray(b))
    q = x[: N + 1]
    p = x[N + 1 : 2 * N + 1]
    sign = -1.0 if reverse else 1.0
    np.testing.assert_allclose(q, sign * np.ones(N + 1), atol=1e-12)
    mids = (np.arange(N) + 0.5) / N
    if reverse:  # edge runs from y=1 down to y=0; cells remain edge-major
        mids = mids[::-1]
    np.testing.assert_allclose(p, -mids, atol=1e-12)


def test_block_structure_symmetry():
    """A_qq symmetric; pressure blocks antisymmetric pair; multiplier blocks
    symmetric pair (reference assembly.py:253-277)."""
    from networks_fenicsx_tpu import network_generation

    G = network_generation.make_tree(3, 1, 1)
    mesh = NetworkMesh(G, N=2, color_strategy="largest_first")
    asm = HydraulicNetworkAssembler(mesh)
    asm.compute_forms(p_bc_ex=p_bc_y)
    M = mesh.num_edge_colors
    A, _ = asm.assemble(kind="dense")
    A = np.asarray(A)
    offs = asm.block_offsets
    blk = lambda i, j: A[offs[i] : offs[i + 1], offs[j] : offs[j + 1]]  # noqa: E731
    for i in range(M):
        np.testing.assert_allclose(blk(i, i), blk(i, i).T, atol=1e-14)
        np.testing.assert_allclose(blk(M, i), -blk(i, M).T, atol=1e-14)
        np.testing.assert_allclose(blk(M + 1, i), blk(i, M + 1).T, atol=1e-14)
    # zero diagonal saddle blocks
    np.testing.assert_allclose(blk(M, M), 0.0, atol=1e-14)
    np.testing.assert_allclose(blk(M + 1, M + 1), 0.0, atol=1e-14)


def test_multiplier_incidence_signs():
    """λ row: +q(end) for in-edges, −q(start) for out-edges."""
    G = single_edge_graph()
    G.add_node(2, pos=np.array([0.0, 2.0]))
    G.add_edge(1, 2)  # node 1 becomes a bifurcation (degree 2)
    mesh = NetworkMesh(G, N=1)
    asm = HydraulicNetworkAssembler(mesh)
    asm.compute_forms(p_bc_ex=p_bc_y)
    A, _ = asm.assemble(kind="dense")
    A = np.asarray(A)
    offs = asm.block_offsets
    M = mesh.num_edge_colors
    lm_row = A[offs[M + 1] :][0]
    # exactly two nonzeros: +1 at the end dof of edge (0,1), −1 at the start
    # dof of edge (1,2)
    nz = np.flatnonzero(lm_row)
    assert len(nz) == 2
    assert set(np.round(lm_row[nz]).astype(int)) == {1, -1}


def test_kind_variants_consistent():
    from networks_fenicsx_tpu import network_generation

    G = network_generation.make_tree(2, 1, 3)
    mesh = NetworkMesh(G, N=3)
    asm = HydraulicNetworkAssembler(mesh)
    asm.compute_forms(p_bc_ex=p_bc_y)
    A_dense, b = asm.assemble(kind="dense")
    A_bcoo, _ = asm.assemble(kind="bcoo")
    np.testing.assert_allclose(np.asarray(A_bcoo.todense()), np.asarray(A_dense), atol=1e-14)
    blocks = asm.assemble(kind="nest")[0]
    offs = asm.block_offsets
    for (i, j), blk in blocks.items():
        np.testing.assert_allclose(
            np.asarray(blk.todense()),
            np.asarray(A_dense)[offs[i] : offs[i + 1], offs[j] : offs[j + 1]],
            atol=1e-14,
        )


def test_bilinear_form_blocks_match_dense_slices():
    """bilinear_form(i, j) (block-local build, O(block) memory) equals the
    corresponding slice of the densely assembled matrix."""
    import numpy as np

    from networks_fenicsx_tpu import (
        HydraulicNetworkAssembler,
        NetworkMesh,
        network_generation,
    )

    G = network_generation.make_tree(3, 1.0, 2.0)
    mesh = NetworkMesh(G, N=2, color_strategy="fast")
    asm = HydraulicNetworkAssembler(mesh)
    rng = np.random.default_rng(5)
    asm.compute_forms(p_bc_ex=lambda x: x[1], R=rng.uniform(0.5, 2.0, mesh.num_edges))
    A, _ = asm.assemble(assemble_rhs=False, kind="dense")
    A = np.asarray(A)
    offs = asm.block_offsets
    n_blocks = len(offs) - 1
    for i in range(n_blocks):
        for j in range(n_blocks):
            blk = np.asarray(asm.bilinear_form(i, j))
            np.testing.assert_array_equal(
                blk, A[offs[i]:offs[i + 1], offs[j]:offs[j + 1]]
            )
