"""Convergence-rate validation against a smooth analytic solution.

For a unit edge with R = 1, f = sin(πs) and zero boundary pressure the
model (in the reference's sign convention) has the closed-form solution

    q(s) = −cos(πs) / π,      p(s) = sin(πs) / π²

(q' = f, q0 = −∫₀¹(1−cos πs)/π ds = −1/π, p = −∫q).  P1 flux should
converge at O(h²) in L2 and DG0 pressure at O(h) — rates the reference
never asserts (SURVEY §4: demo_tree plots but doesn't check)."""

import numpy as np
import networkx as nx
import pytest

from networks_fenicsx_tpu import (
    HydraulicNetworkAssembler,
    NetworkMesh,
    Solver,
    network_generation,
)


def _unit_edge_graph():
    G = nx.DiGraph()
    G.add_node(0, pos=np.array([0.0, 0.0]))
    G.add_node(1, pos=np.array([1.0, 0.0]))
    G.add_edge(0, 1)
    return G


def _solve_single_edge(N):
    mesh = NetworkMesh(_unit_edge_graph(), N=N)
    asm = HydraulicNetworkAssembler(mesh)

    def f(x):
        return np.sin(np.pi * x[0])

    asm.compute_forms(p_bc_ex=0.0, f=f)
    solver = Solver(asm)
    solver.assemble()
    sol = solver.solve()
    q = sol[0].values  # N+1 nodal values along the edge
    p = sol[1].values  # N cell values
    return mesh, q, p


def _errors(N):
    mesh, q, p = _solve_single_edge(N)
    s_nodes = np.linspace(0, 1, N + 1)
    s_mid = (np.arange(N) + 0.5) / N
    q_exact = -np.cos(np.pi * s_nodes) / np.pi
    p_exact = np.sin(np.pi * s_mid) / np.pi**2
    h = 1.0 / N
    eq = np.sqrt(np.sum((q - q_exact) ** 2) * h)
    ep = np.sqrt(np.sum((p - p_exact) ** 2) * h)
    return eq, ep


def test_convergence_rates_single_edge():
    Ns = [8, 16, 32, 64, 128]
    eqs, eps_ = zip(*(_errors(N) for N in Ns))
    rate_q = np.polyfit(np.log(Ns), np.log(eqs), 1)[0]
    rate_p = np.polyfit(np.log(Ns), np.log(eps_), 1)[0]
    # P1 flux: second order; DG0 pressure (midpoint values): O(h) at least —
    # midpoint sampling superconverges, so only bound from below.
    assert rate_q < -1.8, f"flux rate {rate_q}"
    assert rate_p < -0.9, f"pressure rate {rate_p}"


def test_convergence_on_y_network():
    """Same smooth source on the Y-bifurcation: global flux error decays at
    second order under refinement."""
    G = network_generation.make_tree(2, 1, 3)

    def f(x):
        return np.cos(x[1])

    sols = {}
    for N in (8, 16, 32):
        mesh = NetworkMesh(G, N=N)
        asm = HydraulicNetworkAssembler(mesh)
        asm.compute_forms(p_bc_ex=lambda x: x[1], f=f)
        s = Solver(asm)
        s.assemble()
        sols[N] = (mesh, s.solve())

    # Richardson-style check: λ converges; successive differences shrink ~4x
    lam = {N: float(sols[N][1][-1].values[0]) for N in sols}
    d1 = abs(lam[16] - lam[8])
    d2 = abs(lam[32] - lam[16])
    assert d2 < d1 / 3.0, (d1, d2)
