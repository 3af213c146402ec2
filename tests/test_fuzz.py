"""Randomized-topology fuzzing: every solver path must agree on arbitrary
networks, not just the hand-built demo families.

The reference's suites only exercise generator-produced trees
(``tests/test_make_tree.py``, ``tests/test_edge_info.py``); here random
graphs — spanning trees plus random cross-links (cycles), random edge
orientations, random junction degrees, mixed coefficient kinds — are
checked for cross-method agreement, residual smallness of the assembled
system, mass conservation at every junction, and sharded == serial.
"""

import networkx as nx
import numpy as np
import pytest

import jax

from networks_fenicsx_tpu import (
    HydraulicNetworkAssembler,
    NetworkMesh,
    Solver,
    SolverOptions,
)
from networks_fenicsx_tpu.parallel import ShardedNetworkSolver


def random_network(rng: np.random.Generator, n_core: int, n_extra: int) -> nx.DiGraph:
    """Random connected network with cycles, stubs, and random orientations.

    Construction: a random spanning tree over ``n_core`` nodes, plus
    ``n_extra`` random chords (cycles), plus two pendant stubs so the
    boundary set is never empty; each edge's direction is a coin flip.
    """
    pos = rng.uniform(-1.0, 1.0, (n_core + 2, 3))
    undirected = set()
    for i in range(1, n_core):
        undirected.add((int(rng.integers(0, i)), i))
    attempts = 0
    while n_extra > 0 and attempts < 50:
        attempts += 1
        u, v = sorted(rng.choice(n_core, size=2, replace=False).tolist())
        if (u, v) not in undirected:
            undirected.add((u, v))
            n_extra -= 1
    # pendant stubs guarantee degree-1 (boundary) nodes survive the chords
    undirected.add((int(rng.integers(0, n_core)), n_core))
    undirected.add((int(rng.integers(0, n_core)), n_core + 1))

    G = nx.DiGraph()
    for i, p in enumerate(pos):
        G.add_node(i, pos=p)
    for u, v in sorted(undirected):
        if rng.random() < 0.5:
            u, v = v, u
        G.add_edge(u, v)
    return G


def _random_coefficients(rng: np.random.Generator, mesh: NetworkMesh):
    """Random (p_bc, f, R) drawn from the full space of accepted kinds."""
    a, b, c = rng.uniform(-2.0, 2.0, 3)
    p_bc = lambda x: a * x[0] + b * x[1] + c * x[2]  # noqa: E731
    f_kind = rng.integers(0, 3)
    if f_kind == 0:
        f = None
    elif f_kind == 1:
        f = float(rng.uniform(-1.0, 1.0))
    else:
        f = rng.uniform(-1.0, 1.0, mesh.num_cells)
    R_kind = rng.integers(0, 3)
    if R_kind == 0:
        R = None
    elif R_kind == 1:
        R = float(rng.uniform(0.5, 3.0))
    else:
        R = rng.uniform(0.3, 3.0, mesh.num_edges)
    return p_bc, f, R


def _solve(mesh, method, p_bc, f, R):
    asm = HydraulicNetworkAssembler(mesh)
    asm.compute_forms(p_bc_ex=p_bc, f=f, R=R)
    solver = Solver(asm, options=SolverOptions(method=method))
    solver.assemble()
    return asm, solver.solve()


def _flux_endpoints(mesh, sol):
    flux_start, flux_end = {}, {}
    for fn in sol[:-2]:
        view = mesh.submeshes[fn.space.color]
        per_edge = fn.values.reshape(view.edge_ids.size, -1)
        for i, e in enumerate(view.edge_ids):
            flux_start[int(e)] = per_edge[i, 0]
            flux_end[int(e)] = per_edge[i, -1]
    return flux_start, flux_end


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_cross_method_and_conservation(seed: int):
    rng = np.random.default_rng(100 + seed)
    G = random_network(rng, n_core=int(rng.integers(5, 20)),
                       n_extra=int(rng.integers(0, 5)))
    mesh = NetworkMesh(G, N=int(rng.integers(1, 5)))
    p_bc, f, R = _random_coefficients(rng, mesh)

    _, sol_schur = _solve(mesh, "schur", p_bc, f, R)
    _, sol_lu = _solve(mesh, "host_lu", p_bc, f, R)
    for fs, fl in zip(sol_schur, sol_lu):
        scale = max(1.0, float(np.max(np.abs(fl.values))))
        np.testing.assert_allclose(fs.values, fl.values, atol=1e-9 * scale)

    # mass conservation at every junction: sum(q_in) == sum(q_out) + f-volume?
    # With sources f the pressure equation is dq/ds = f on edges; at the
    # junction itself the multiplier enforces exact conservation of the
    # endpoint fluxes regardless of f.
    flux_start, flux_end = _flux_endpoints(mesh, sol_schur)
    for b_idx in range(len(mesh.bifurcation_values)):
        qin = sum(flux_end[int(e)] for e in mesh.in_edge_ids(b_idx))
        qout = sum(flux_start[int(e)] for e in mesh.out_edge_ids(b_idx))
        assert abs(qin - qout) < 1e-9


@pytest.mark.parametrize("seed", range(4))
def test_fuzz_assembled_residual(seed: int):
    """The schur solution must satisfy the independently assembled system."""
    rng = np.random.default_rng(300 + seed)
    G = random_network(rng, n_core=int(rng.integers(6, 15)),
                       n_extra=int(rng.integers(1, 4)))
    mesh = NetworkMesh(G, N=2)
    p_bc, f, R = _random_coefficients(rng, mesh)

    asm, sol = _solve(mesh, "schur", p_bc, f, R)
    A, b = asm.assemble(kind="dense")
    x = np.concatenate([np.ravel(fn.values) for fn in sol])
    assert x.size == np.asarray(b).shape[0]
    res = np.asarray(A) @ x - np.asarray(b)
    scale = max(1.0, float(np.max(np.abs(np.asarray(b)))))
    assert np.max(np.abs(res)) < 1e-9 * scale


@pytest.mark.parametrize("seed", [0, 1])
def test_fuzz_sharded_matches_serial(seed: int):
    rng = np.random.default_rng(500 + seed)
    G = random_network(rng, n_core=14, n_extra=3)
    mesh = NetworkMesh(G, N=3)
    p_bc, f, R = _random_coefficients(rng, mesh)

    _, serial = _solve(mesh, "schur", p_bc, f, R)

    asm2 = HydraulicNetworkAssembler(mesh)
    asm2.compute_forms(p_bc_ex=p_bc, f=f, R=R)
    sharded_solver = ShardedNetworkSolver(asm2, devices=jax.devices()[:8])
    sharded_solver.assemble()
    sharded = sharded_solver.solve()
    for fs, fd in zip(serial, sharded):
        scale = max(1.0, float(np.max(np.abs(fs.values))))
        np.testing.assert_allclose(fd.values, fs.values, atol=1e-10 * scale)


@pytest.mark.parametrize("seed", range(4))
def test_fuzz_high_degree_cross_method(seed: int):
    """Random topologies (cycles included) at random flux degree >= 2:
    the condensed scalar layout (fixed condensed constants + interior
    recovery) must agree with host LU and conserve mass at junctions."""
    rng = np.random.default_rng(500 + seed)
    G = random_network(rng, n_core=int(rng.integers(5, 15)),
                       n_extra=int(rng.integers(0, 4)))
    mesh = NetworkMesh(G, N=int(rng.integers(1, 4)))
    p_bc, f, R = _random_coefficients(rng, mesh)
    k = int(rng.integers(2, 4))

    sols = {}
    for method in ("schur", "host_lu"):
        asm = HydraulicNetworkAssembler(mesh, flux_degree=k)
        asm.compute_forms(p_bc_ex=p_bc, f=f, R=R)
        solver = Solver(asm, options=SolverOptions(method=method))
        solver.assemble()
        sols[method] = solver.solve()
    for fs, fl in zip(sols["schur"], sols["host_lu"]):
        scale = max(1.0, float(np.max(np.abs(fl.values))))
        np.testing.assert_allclose(fs.values, fl.values, atol=1e-9 * scale)

    flux_start, flux_end = _flux_endpoints(mesh, sols["schur"])
    for b_idx in range(len(mesh.bifurcation_values)):
        qin = sum(flux_end[int(e)] for e in mesh.in_edge_ids(b_idx))
        qout = sum(flux_start[int(e)] for e in mesh.out_edge_ids(b_idx))
        assert abs(qin - qout) < 1e-9


@pytest.mark.parametrize("seed", range(4))
def test_fuzz_lattice_dct_vs_host_lu(seed: int):
    """Random lattice dimensions / refinement / coefficient modes through
    the exact DCT grid executor agree with host LU (includes the minimal
    nx=3, ny=2 shapes the plan admits)."""
    from networks_fenicsx_tpu.solver import _GridPlan

    from networks_fenicsx_tpu import network_generation

    rng = np.random.default_rng(900 + seed)
    nx_ = int(rng.integers(3, 11))
    ny_ = int(rng.integers(2, 11))
    N = int(rng.integers(1, 4))
    G = network_generation.make_grid(nx_, ny_, arrays=True)
    mesh = NetworkMesh(G, N=N)
    E, C = mesh.num_edges, mesh.num_edges * N
    fkind = rng.choice(["scalar", "edge", "cell", "zero"])
    f = {
        "zero": None,
        "scalar": float(rng.uniform(-1, 1)),
        "edge": rng.uniform(-1.0, 1.0, E),
        "cell": rng.uniform(-1.0, 1.0, C),
    }[fkind]
    R = float(rng.uniform(0.5, 3.0))
    k = int(rng.integers(1, 4))

    sols = {}
    for method, opts in (
        ("dct", SolverOptions(method="schur", schur_method="dct")),
        ("host_lu", SolverOptions(method="host_lu")),
    ):
        asm = HydraulicNetworkAssembler(mesh, flux_degree=k)
        kw = {} if f is None else {"f": f}
        asm.compute_forms(p_bc_ex=lambda x: x[0] - 0.3 * x[1], R=R, **kw)
        solver = Solver(asm, options=opts)
        solver.assemble()
        sols[method] = solver.solve()
        if method == "dct":
            assert isinstance(
                getattr(solver._executor, "blocked_plan", None), _GridPlan
            ), (nx_, ny_, N, fkind, k)
    for fs, fl in zip(sols["dct"], sols["host_lu"]):
        scale = max(1.0, float(np.max(np.abs(fl.values))))
        np.testing.assert_allclose(fs.values, fl.values, atol=1e-9 * scale)
