"""API-surface behaviors mirroring reference usage patterns: PETSc-style
options dicts, matrix 'kind' selection through the Solver, block form
accessors, higher-degree post-processing."""

import numpy as np
import pytest

from networks_fenicsx_tpu import (
    HydraulicNetworkAssembler,
    NetworkMesh,
    Solver,
    network_generation,
)
from networks_fenicsx_tpu.post_processing import export_functions, extract_global_flux


def p_bc_y(x):
    return x[1]


@pytest.fixture()
def y_assembler():
    mesh = NetworkMesh(network_generation.make_tree(2, 1, 3), N=3)
    asm = HydraulicNetworkAssembler(mesh)
    asm.compute_forms(p_bc_ex=p_bc_y)
    return mesh, asm


def test_petsc_options_mapping(y_assembler):
    """Reference-style petsc_options dicts are accepted (solver.py:58-65)."""
    _, asm = y_assembler
    solver = Solver(
        asm,
        petsc_options_prefix="NetworkSolver_",
        petsc_options={
            "ksp_type": "preonly",
            "pc_type": "lu",
            "pc_factor_mat_solver_type": "mumps",
            "ksp_error_if_not_converged": True,
        },
    )
    solver.assemble()
    sol = solver.solve()
    assert solver.info.converged
    np.testing.assert_allclose(sol[-1].values, [-1 / (np.sqrt(2.5) + 1)], atol=1e-9)


@pytest.mark.parametrize("kind", ["mpi", "nest", "dense", "csr"])
def test_kind_through_solver(y_assembler, kind):
    """The 'kind' selector (reference assembly.py:335, demo_tree kind='mpi',
    demo_arterial kind='nest') assembles the requested layout while the
    solve stays correct."""
    _, asm = y_assembler
    solver = Solver(asm, kind=kind)
    solver.assemble()
    sol = solver.solve()
    assert solver.A is not None
    np.testing.assert_allclose(sol[-1].values, [-1 / (np.sqrt(2.5) + 1)], atol=1e-9)


def test_block_form_accessors(y_assembler):
    mesh, asm = y_assembler
    M = mesh.num_edge_colors
    # mass block is symmetric positive definite
    a00 = np.asarray(asm.bilinear_form(0, 0))
    np.testing.assert_allclose(a00, a00.T, atol=1e-14)
    assert np.all(np.linalg.eigvalsh(a00) > 0)
    # pressure block row: L[M] is zero for f = 0
    np.testing.assert_allclose(np.asarray(asm.linear_form(M)), 0.0, atol=1e-14)
    # measure-id parity accessors (reference assembly.py:153-162)
    assert asm.out_idx == asm.in_idx + M
    assert asm.in_idx == max(mesh.in_marker, mesh.out_marker) + 1


def test_higher_degree_post_processing(tmp_path):
    mesh = NetworkMesh(network_generation.make_tree(2, 1, 3), N=2)
    asm = HydraulicNetworkAssembler(mesh, flux_degree=2)
    asm.compute_forms(p_bc_ex=p_bc_y)
    solver = Solver(asm)
    solver.assemble()
    sol = solver.solve()
    gq = extract_global_flux(mesh, sol)
    vals = gq.values.reshape(mesh.num_cells, 3)
    # Note: the k=2 / DG0 pairing is not consistent for the mixed form
    # (only the cellwise MEAN of dq/ds is constrained), so fluxes differ
    # from the k=1 solution by the condensed-resistance factor; assert the
    # discretization-independent structure instead: endpoint dofs are
    # edgewise-constant and mass is conserved 2:1 at the junction.
    ends = vals[:, [0, 2]]
    per_edge = ends.reshape(mesh.num_edges, -1)
    for e in range(mesh.num_edges):
        np.testing.assert_allclose(per_edge[e], per_edge[e][0], rtol=1e-9)
    root, branch = per_edge[0][0], per_edge[1][0]
    np.testing.assert_allclose(root, 2 * branch, rtol=1e-9)
    export_functions(sol, outpath=tmp_path)
    assert (tmp_path / "flux_0.vtu").exists()


def test_solution_vector_roundtrip(y_assembler):
    _, asm = y_assembler
    solver = Solver(asm)
    solver.assemble()
    sol = solver.solve()
    x = np.asarray(solver.solution_vector())
    offs = asm.block_offsets
    for i, fn in enumerate(sol):
        np.testing.assert_array_equal(fn.values, x[offs[i] : offs[i + 1]])


def test_solve_into_provided_functions(y_assembler):
    """The reference allows passing pre-created functions to solve()
    (solver.py:109-125); values must be assigned in place."""
    from networks_fenicsx_tpu import NetworkFunction

    _, asm = y_assembler
    solver = Solver(asm)
    solver.assemble()
    provided = [NetworkFunction(sp, name=f"custom_{i}") for i, sp in enumerate(asm.function_spaces)]
    out = solver.solve(functions=provided)
    assert out is provided
    assert out[0].name == "custom_0"
    ref = solver.solve()  # fresh functions
    for a, b in zip(provided, ref):
        np.testing.assert_array_equal(a.values, b.values)
