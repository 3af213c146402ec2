"""Lattice (fully cyclic) networks: the topology family the tree-specific
fast paths do NOT cover — exercises cycle-core elimination, dense and CG
Schur variants, and the iterative fallbacks, all cross-checked against
host sparse LU."""

import numpy as np
import pytest

from networks_fenicsx_tpu import (
    HydraulicNetworkAssembler,
    NetworkMesh,
    Solver,
    SolverOptions,
    network_generation,
)


def p_bc_x(x):
    return x[0]


def _solve(mesh, method, sm="auto", R=None):
    asm = HydraulicNetworkAssembler(mesh)
    asm.compute_forms(p_bc_ex=p_bc_x, R=R)
    s = Solver(asm, options=SolverOptions(method=method, schur_method=sm, rtol=1e-13))
    s.assemble()
    return s, s.solve()


def test_grid_structure():
    G = network_generation.make_grid(4, 3)
    mesh = NetworkMesh(G, N=2, color_strategy="fast")
    # all 12 lattice nodes are junctions; the two stub ends are boundaries
    assert len(mesh.boundary_values) == 2
    assert len(mesh.bifurcation_values) == 12
    from networks_fenicsx_tpu.solver import _plan_tree_elimination

    asm = HydraulicNetworkAssembler(mesh)
    asm.compute_forms(p_bc_ex=p_bc_x)
    plan = _plan_tree_elimination(asm)
    assert plan.core_size > 0  # genuinely cyclic


@pytest.mark.parametrize("sm", ["tree", "dense", "cg"])
def test_grid_schur_variants_vs_lu(sm):
    G = network_generation.make_grid(5, 4)
    mesh = NetworkMesh(G, N=2, color_strategy="fast")
    rng = np.random.default_rng(0)
    R = rng.uniform(0.5, 2.0, mesh.num_edges)
    s1, sol1 = _solve(mesh, "schur", sm=sm, R=R)
    assert s1.info.converged
    s2, sol2 = _solve(mesh, "host_lu", R=R)
    for a, b in zip(sol1, sol2):
        np.testing.assert_allclose(a.values, b.values, atol=1e-8)


def test_grid_conservation_and_flow_direction():
    G = network_generation.make_grid(6, 6)
    mesh = NetworkMesh(G, N=1, color_strategy="fast")
    s, sol = _solve(mesh, "schur")
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
    # inlet and outlet stubs carry the same net flow
    inlet_edge = int(np.flatnonzero(mesh.edges[:, 0] == mesh.num_graph_nodes - 2)[0])
    outlet_edge = int(np.flatnonzero(mesh.edges[:, 1] == mesh.num_graph_nodes - 1)[0])
    np.testing.assert_allclose(
        flux_start[inlet_edge], flux_end[outlet_edge], atol=1e-10
    )


@pytest.mark.parametrize("dims", [(5000, 3), (3, 4200)])
def test_wide_grid_exact_transform(dims):
    """Lattices wider than 4096 per side must stay f64-direct-exact: the
    old silent f32-FFT fallback is gone — the transform matrices generate
    on device (iota) and the first direct pass runs in the compute dtype.

    Accuracy bars are CONDITIONING-AWARE: an n-wide lattice Laplacian has
    κ ≈ n² and no f64 direct method (host LU included) beats the ~κ·ε
    forward-error floor; the f32 fallback this replaces sat ORDERS above
    it (6.5e-3 relative at 512²).  Thin-wide grids keep the host LU
    cross-check cheap while exercising the > 4096 transform axis."""
    nx_c, ny_c = dims
    n_long = max(nx_c, ny_c)
    eps = np.finfo(np.float64).eps
    G = network_generation.make_grid(nx_c, ny_c, arrays=True)
    mesh = NetworkMesh(G, N=1)
    asm = HydraulicNetworkAssembler(mesh)
    asm.compute_forms(p_bc_ex=lambda x: x[0] + 0.2 * x[1], f=0.3, R=1.7)
    s = Solver(asm, options=SolverOptions(method="schur", schur_method="dct"))
    s.assemble()
    s.solve()  # must converge (error_if_not_converged default) at any width
    x1 = np.asarray(s.solution_vector())

    asm2 = HydraulicNetworkAssembler(mesh)
    asm2.compute_forms(p_bc_ex=lambda x: x[0] + 0.2 * x[1], f=0.3, R=1.7)
    s2 = Solver(asm2, options=SolverOptions(method="host_lu"))
    s2.assemble()
    s2.solve()
    x2 = np.asarray(s2.solution_vector())

    # solution agreement at the f64 conditioning floor
    err = np.max(np.abs(x1 - x2)) / max(1.0, np.abs(x2).max())
    assert err < max(1e-10, 256 * n_long**2 * eps), err

    # backward error (condition-independent certificate): the full-system
    # relative residual must be f64-direct-solve sized
    import scipy.sparse as sp

    vals = np.concatenate(
        [np.asarray(asm._cell_mass).ravel(), asm._static_vals]
    )
    A = sp.csc_matrix(
        (vals, (asm._all_rows, asm._all_cols)), shape=(asm.num_dofs,) * 2
    )
    b = np.asarray(asm._b_host)
    rel_res = np.linalg.norm(A @ x1 - b) / np.linalg.norm(b)
    assert rel_res < 1e-8, rel_res


def test_dct2_matrix_device_f32_argument_precision():
    """The on-device DCT-II matrix generator (> 4096-wide lattices) must
    form the cosine ARGUMENT in f64 even when an f32 matrix is requested:
    pi*(j+0.5)*j overflows f32 precision at n ~ 5000 (phase error ~2e-3
    rad), four orders worse than rounding an f64-generated matrix."""
    import jax.numpy as jnp

    from networks_fenicsx_tpu.solver import _dct2_matrix_device

    n = 4200
    j = np.arange(n, dtype=np.float64)
    D_ref = np.cos(np.pi * (j[None, :] + 0.5) * j[:, None] / n)
    D_ref *= np.sqrt(2.0 / n)
    D_ref[0] *= np.sqrt(0.5)

    D64 = np.asarray(_dct2_matrix_device(n, jnp.float64))
    np.testing.assert_allclose(D64, D_ref, atol=1e-12)

    D32 = np.asarray(_dct2_matrix_device(n, jnp.float32))
    # f32 ROUNDING of exact values is ~6e-8 absolute at these magnitudes;
    # an f32-formed argument would sit at ~4e-5.
    assert np.max(np.abs(D32 - D_ref)) < 1e-6
