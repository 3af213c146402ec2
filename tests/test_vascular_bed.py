"""Arterio-venous perfusion bed (``make_vascular_bed``) — the composite
model family: Murray's-law arterial tree → capillary lattice → mirrored
venous tree, a physiological configuration the reference's tree-only
generators cannot produce (reference ``network_generation.py:42,158``)
but its MUMPS solver could consume.  Pins generator invariants, mass
conservation, exactness vs host LU, arrays/DiGraph parity, sparse-core
engagement and sweeps."""

import numpy as np
import pytest

from networks_fenicsx_tpu import (
    HydraulicNetworkAssembler,
    NetworkMesh,
    Solver,
    SolverOptions,
    network_generation,
)
from networks_fenicsx_tpu.solver import _plan_tree_elimination, attach_core_plan


def _solve_bed(mesh, method="schur"):
    asm = HydraulicNetworkAssembler(mesh)
    asm.compute_forms(p_bc_ex=lambda x: x[1], R=1.0 / mesh.edge_radius**4)
    s = Solver(asm, options=SolverOptions(method=method))
    s.assemble()
    sol = s.solve()
    return asm, s, sol


def test_vascular_bed_invariants():
    n_gen, nxc, nyc = 3, 12, 8
    G = network_generation.make_vascular_bed(n_gen, nxc, nyc)
    L = 2**n_gen
    # nodes: lattice + two trees of (L - 1) internal nodes + inlet + outlet
    assert G.number_of_nodes() == nxc * nyc + 2 * (L - 1) + 2
    # edges: lattice interior + per tree (trunk + internal + L terminals)
    grid_e = 2 * nxc * nyc - nxc - nyc
    assert G.number_of_edges() == grid_e + 2 * (2 * L - 1)
    # exactly two boundary nodes: the arterial inlet and venous outlet
    deg1 = [n for n in G.nodes if G.degree(n) == 1]
    assert len(deg1) == 2
    ys = [G.nodes[n]["pos"][1] for n in deg1]
    assert max(ys) > 1.0 and min(ys) < 0.0  # one above, one below the bed


def test_vascular_bed_murray_law():
    """Parent/child radius ratio is 2^(1/3) at every symmetric level."""
    n_gen, r_cap = 4, 0.05
    G = network_generation.make_vascular_bed(n_gen, 16, 4, arrays=True)
    r = np.unique(np.asarray(G.radius))
    expected = np.unique(
        np.concatenate(
            [[r_cap], 1.5 * r_cap * 2.0 ** (np.arange(n_gen + 1) / 3.0)]
        )
    )
    np.testing.assert_allclose(r, expected, rtol=1e-14)


def test_vascular_bed_exact_and_conserving():
    mesh = NetworkMesh(network_generation.make_vascular_bed(3, 12, 8), N=2)
    asm, s, sol = _solve_bed(mesh)
    ref_asm = HydraulicNetworkAssembler(mesh)
    ref_asm.compute_forms(p_bc_ex=lambda x: x[1], R=1.0 / mesh.edge_radius**4)
    ref = Solver(ref_asm, options=SolverOptions(method="host_lu"))
    ref.solve()
    refv = np.asarray(ref.solution_vector())
    got = np.asarray(s.solution_vector())
    scale = max(1.0, np.abs(refv).max())
    np.testing.assert_allclose(got, refv, atol=1e-10 * scale)

    # mass conservation at EVERY junction (tree bifurcations, lattice
    # nodes, arteriole attachment points alike)
    flux_start, flux_end = {}, {}
    for fn in sol[:-2]:
        view = mesh.submeshes[fn.space.color]
        per_edge = fn.values.reshape(view.edge_ids.size, -1)
        for i, e in enumerate(view.edge_ids):
            flux_start[int(e)] = per_edge[i, 0]
            flux_end[int(e)] = per_edge[i, -1]
    for b_idx in range(len(mesh.bifurcation_values)):
        qin = sum(flux_end[int(e)] for e in mesh.in_edge_ids(b_idx))
        qout = sum(flux_start[int(e)] for e in mesh.out_edge_ids(b_idx))
        assert abs(qin - qout) < 1e-10


def test_vascular_bed_arrays_parity():
    """arrays=True and the DiGraph path produce IDENTICAL numbering."""
    G = network_generation.make_vascular_bed(3, 12, 8)
    Ga = network_generation.make_vascular_bed(3, 12, 8, arrays=True)
    mesh, mesh_a = NetworkMesh(G, N=2), NetworkMesh(Ga, N=2)
    np.testing.assert_array_equal(np.asarray(mesh.edges), np.asarray(mesh_a.edges))
    np.testing.assert_allclose(mesh.edge_radius, mesh_a.edge_radius, atol=0)
    _, s, _ = _solve_bed(mesh)
    _, sa, _ = _solve_bed(mesh_a)
    np.testing.assert_array_equal(
        np.asarray(s.solution_vector()), np.asarray(sa.solution_vector())
    )


def test_vascular_bed_sparse_core_engages():
    """A production-size bed's cycle core (> 512) routes the sparse
    min-degree elimination and still matches host LU at 1e-10."""
    G = network_generation.make_vascular_bed(4, 32, 20, arrays=True)
    mesh = NetworkMesh(G, N=1, color_strategy="fast")
    asm = HydraulicNetworkAssembler(mesh)
    asm.compute_forms(p_bc_ex=lambda x: x[1], R=1.0 / mesh.edge_radius**4)
    tp = attach_core_plan(_plan_tree_elimination(asm))
    assert tp.core_size > 512
    assert tp.core_plan is not None and tp.core_plan.stats["rounds"] > 0
    s = Solver(asm)
    s.solve()
    ref = Solver(asm, options=SolverOptions(method="host_lu"))
    ref.solve()
    refv = np.asarray(ref.solution_vector())
    err = np.max(np.abs(np.asarray(s.solution_vector()) - refv))
    assert err < 1e-10 * max(1.0, np.abs(refv).max())


def test_vascular_bed_sweep_and_factorize():
    """Scenario sweeps and factor-reuse serving work on the composite."""
    from networks_fenicsx_tpu import solve_sweep

    G = network_generation.make_vascular_bed(3, 12, 8, arrays=True)
    mesh = NetworkMesh(G, N=1)
    R0 = 1.0 / mesh.edge_radius**4
    R0.setflags(write=False)
    asm = HydraulicNetworkAssembler(mesh)
    asm.compute_forms(p_bc_ex=lambda x: x[1], R=R0)
    scales = np.array([1.0, 2.5])
    res = solve_sweep(asm, R=R0[None, :] * scales[:, None])
    for i, c in enumerate(scales):
        asm_i = HydraulicNetworkAssembler(mesh)
        asm_i.compute_forms(p_bc_ex=lambda x: x[1], R=R0 * c)
        ref = Solver(asm_i, options=SolverOptions(method="host_lu"))
        ref.solve()
        rv = np.asarray(ref.solution_vector())
        err = np.max(np.abs(np.asarray(res.x[i]) - rv))
        assert err < 1e-9 * max(1.0, np.abs(rv).max()), f"scenario {i}"

    solver = Solver(asm)
    solver.factorize()
    solver.solve()
    assert solver.info.method == "schur_factorized"


@pytest.mark.parametrize("ndev", [2, 8])
def test_vascular_bed_sharded(ndev):
    """The composite routes the GENERAL sharded pipeline (no forest or
    lattice envelope applies) — sharded == serial host LU at 1e-10."""
    import jax

    from networks_fenicsx_tpu.parallel import ShardedNetworkSolver

    devices = jax.devices("cpu")[:ndev]
    if len(devices) < ndev:
        pytest.skip(f"need {ndev} virtual devices")
    G = network_generation.make_vascular_bed(3, 12, 8, arrays=True)
    mesh = NetworkMesh(G, N=2, color_strategy="fast")
    asm = HydraulicNetworkAssembler(mesh)
    asm.compute_forms(p_bc_ex=lambda x: x[1], R=1.0 / mesh.edge_radius**4)
    sh = ShardedNetworkSolver(asm, devices=devices)
    sh.assemble()
    sol = sh.solve()
    ref_asm = HydraulicNetworkAssembler(mesh)
    ref_asm.compute_forms(p_bc_ex=lambda x: x[1], R=1.0 / mesh.edge_radius**4)
    ref = Solver(ref_asm, options=SolverOptions(method="host_lu"))
    ref.assemble()
    ref_sol = ref.solve()
    for a, b in zip(sol, ref_sol):
        assert np.max(np.abs(np.asarray(a.values) - np.asarray(b.values))) < 1e-10


def test_vascular_bed_errors():
    with pytest.raises(ValueError, match="exceed nx_cells"):
        network_generation.make_vascular_bed(5, 12, 8)
    with pytest.raises(ValueError, match="n_gen"):
        network_generation.make_vascular_bed(0, 12, 8)
    with pytest.raises(ValueError, match="2 nodes per side"):
        network_generation.make_vascular_bed(1, 2, 1)
