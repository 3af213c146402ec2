"""Disconnected networks: a forest of independent components in one graph
must solve identically to solving each component alone (exercises the
multi-root level planner and component bookkeeping)."""

import networkx as nx
import numpy as np

from networks_fenicsx_tpu import (
    HydraulicNetworkAssembler,
    NetworkMesh,
    Solver,
    SolverOptions,
    network_generation,
)


def p_bc_y(x):
    return x[1]


def _solve(G, N=3, **kw):
    mesh = NetworkMesh(G, N=N)
    asm = HydraulicNetworkAssembler(mesh)
    asm.compute_forms(p_bc_ex=p_bc_y)
    s = Solver(asm, options=SolverOptions(**kw))
    s.assemble()
    return mesh, s.solve()


def _shifted_tree(n, dx):
    G = network_generation.make_tree(n, 1.0, 2.0)
    for i in G.nodes():
        pos = np.asarray(G.nodes[i]["pos"], dtype=float)
        pos[0] += dx
        G.nodes[i]["pos"] = pos
    return G


def test_two_components_match_individual_solves():
    G1 = _shifted_tree(2, 0.0)
    G2 = _shifted_tree(3, 10.0)
    combined = nx.DiGraph()
    offset = G1.number_of_nodes()
    for i in G1.nodes():
        combined.add_node(i, pos=G1.nodes[i]["pos"])
    for i in G2.nodes():
        combined.add_node(offset + i, pos=G2.nodes[i]["pos"])
    combined.add_edges_from(G1.edges())
    combined.add_edges_from((offset + u, offset + v) for u, v in G2.edges())

    mesh_c, sol_c = _solve(combined)
    mesh_1, sol_1 = _solve(G1)
    mesh_2, sol_2 = _solve(G2)

    # multipliers: combined λ is the union, ordered by sorted node id
    lam_c = sol_c[-1].values
    lam_expected = np.concatenate([sol_1[-1].values, sol_2[-1].values])
    np.testing.assert_allclose(np.sort(lam_c), np.sort(lam_expected), atol=1e-11)

    # pressures per cell: first component's cells come first (edge-major)
    p_c = sol_c[-2].values
    n1 = mesh_1.num_cells
    np.testing.assert_allclose(p_c[:n1], sol_1[-2].values, atol=1e-11)
    np.testing.assert_allclose(p_c[n1:], sol_2[-2].values, atol=1e-11)


def test_components_match_across_methods():
    G1 = _shifted_tree(2, 0.0)
    G2 = _shifted_tree(2, 5.0)
    combined = nx.disjoint_union(G1, G2)  # relabels to contiguous ints
    mesh_t, sol_t = _solve(combined, method="schur", schur_method="tree")
    mesh_d, sol_d = _solve(combined, method="host_lu")
    for a, b in zip(sol_t, sol_d):
        np.testing.assert_allclose(a.values, b.values, atol=1e-10)
