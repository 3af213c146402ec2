"""Coverage for auxiliary subsystems: timing registry, integration-data
parity API, generator invariants (Murray's law), coloring equivalence."""

import numpy as np
import pytest

from networks_fenicsx_tpu import (
    HydraulicNetworkAssembler,
    NetworkMesh,
    Solver,
    compute_integration_data,
    network_generation,
)
from networks_fenicsx_tpu.utils import timing as T


def test_timing_registry():
    T.reset_timings()

    @T.timed("nxfx:test:op")
    def op():
        return sum(range(1000))

    for _ in range(3):
        op()
    count, total = T.timing("nxfx:test:op")
    assert count == 3
    assert total.total_seconds() >= 0
    snap = T.list_timings()
    assert "nxfx:test:op" in snap
    with T.Timer("nxfx:test:block"):
        pass
    assert T.timing("nxfx:test:block")[0] == 1
    T.reset_timings()
    assert T.timing("nxfx:test:op")[0] == 0


def test_compute_integration_data():
    """Per-color in/out point-evaluation entities (reference
    assembly.py:29-92 parity): entity pairs are (parent cell, local end)."""
    G = network_generation.make_tree(2, 1, 3)
    mesh = NetworkMesh(G, N=4)
    in_ents, out_ents = compute_integration_data(mesh)
    assert set(in_ents) == set(range(mesh.num_edge_colors))
    # The single bifurcation (node 1) terminates edge 0: in-entity at the
    # last cell of edge 0, local end 1.
    N = mesh.N
    color0 = int(mesh.edge_color[0])
    np.testing.assert_array_equal(in_ents[color0], [0 * N + (N - 1), 1])
    # Out-edges 1 and 2 start at the bifurcation: first cell, local end 0.
    for e in (1, 2):
        c = int(mesh.edge_color[e])
        np.testing.assert_array_equal(out_ents[c], [e * N, 0])


def test_arterial_tree_murray_law():
    gamma, D0, lmbda = 0.8, 2.0, 8.0
    G = network_generation.make_arterial_tree(N=3, D0=D0, lmbda=lmbda, gamma=gamma)
    # 2^3 - 1 vessels
    assert G.number_of_edges() == 7
    # Murray: D_parent^3 == D1^3 + D2^3 for every interior node
    for node in G.nodes():
        in_e = list(G.in_edges(node))
        out_e = list(G.out_edges(node))
        if len(in_e) == 1 and len(out_e) == 2:
            Dp = 2 * G.edges[in_e[0]]["radius"]
            D1, D2 = (2 * G.edges[e]["radius"] for e in out_e)
            np.testing.assert_allclose(Dp**3, D1**3 + D2**3, rtol=1e-12)
    # length/diameter ratio
    for u, v in G.edges():
        L = np.linalg.norm(
            np.asarray(G.nodes[v]["pos"]) - np.asarray(G.nodes[u]["pos"])
        )
        np.testing.assert_allclose(L, lmbda * 2 * G.edges[u, v]["radius"], rtol=1e-12)


def test_arterial_tree_random_seeded():
    G1 = network_generation.make_arterial_tree(N=4, random=True, seed=42)
    G2 = network_generation.make_arterial_tree(N=4, random=True, seed=42)
    for n in G1.nodes():
        np.testing.assert_array_equal(G1.nodes[n]["pos"], G2.nodes[n]["pos"])


def test_refinement_invariance():
    """Linear boundary pressure ⇒ the discrete flux is exact and
    N-independent (the property demo_tree sweeps; reference only plots it,
    we assert it)."""
    G = network_generation.make_tree(2, 1, 1)
    lam_values = []
    for N in (1, 4, 16, 64):
        mesh = NetworkMesh(G, N=N)
        asm = HydraulicNetworkAssembler(mesh)
        asm.compute_forms(p_bc_ex=lambda x: x[1])
        solver = Solver(asm)
        solver.assemble()
        sol = solver.solve()
        lam_values.append(float(sol[-1].values[0]))
    np.testing.assert_allclose(lam_values, lam_values[0], atol=1e-11)


def test_fast_coloring_matches_quality():
    """Native/fast coloring uses no more colors than max adjacent degree
    bound and is proper on random trees."""
    rng = np.random.default_rng(1)
    import networkx as nx

    for trial in range(3):
        T_nodes = 40
        tree = nx.random_labeled_tree(T_nodes, seed=int(rng.integers(1e6)))
        G = nx.DiGraph()
        for n in tree.nodes():
            G.add_node(n, pos=rng.standard_normal(2))
        for u, v in tree.edges():
            G.add_edge(u, v)
        mesh = NetworkMesh(G, N=1, color_strategy="fast")
        deg = np.zeros(T_nodes, int)
        for u, v in mesh.edges:
            deg[u] += 1
            deg[v] += 1
        # greedy edge coloring uses at most 2*maxdeg - 1 colors
        assert mesh.num_edge_colors <= 2 * deg.max() - 1
