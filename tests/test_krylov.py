"""Unit tests for the pure-JAX Krylov solvers against random systems."""

import numpy as np
import pytest

import jax.numpy as jnp

from networks_fenicsx_tpu.ops.krylov import cg, minres


def _spd(n, seed=0, cond=100.0):
    rng = np.random.default_rng(seed)
    Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    eig = np.geomspace(1.0, cond, n)
    return (Q * eig) @ Q.T


@pytest.mark.parametrize("n", [20, 100])
def test_cg_spd(n):
    A = _spd(n, seed=1)
    x_true = np.linspace(-1, 1, n)
    b = A @ x_true
    Aj = jnp.asarray(A)
    res = cg(lambda v: Aj @ v, jnp.asarray(b), rtol=1e-13)
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.x), x_true, atol=1e-8)


def test_cg_jacobi_preconditioner_reduces_iterations():
    n = 120
    A = _spd(n, seed=2, cond=1e5)
    # make the ill-conditioning diagonal so Jacobi helps
    D = np.diag(np.geomspace(1, 1e5, n))
    A = D @ _spd(n, seed=3, cond=10.0) @ D
    b = np.ones(n)
    Aj = jnp.asarray(A)
    diag = jnp.asarray(np.diagonal(A))
    plain = cg(lambda v: Aj @ v, jnp.asarray(b), rtol=1e-10, maxiter=5000)
    pre = cg(
        lambda v: Aj @ v, jnp.asarray(b), precond=lambda v: v / diag,
        rtol=1e-10, maxiter=5000,
    )
    assert int(pre.iters) < int(plain.iters)
    np.testing.assert_allclose(np.asarray(pre.x), np.linalg.solve(A, b), atol=1e-5)


@pytest.mark.parametrize("n", [30, 80])
def test_minres_symmetric_indefinite(n):
    rng = np.random.default_rng(4)
    Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    eig = np.concatenate([np.linspace(1, 5, n // 2), -np.linspace(1, 5, n - n // 2)])
    A = (Q * eig) @ Q.T
    x_true = rng.standard_normal(n)
    b = A @ x_true
    Aj = jnp.asarray(A)
    res = minres(lambda v: Aj @ v, jnp.asarray(b), rtol=1e-12, maxiter=4 * n)
    np.testing.assert_allclose(np.asarray(res.x), x_true, atol=1e-7)


def test_minres_matches_cg_on_spd():
    n = 50
    A = _spd(n, seed=5)
    b = np.sin(np.arange(n))
    Aj = jnp.asarray(A)
    r1 = cg(lambda v: Aj @ v, jnp.asarray(b), rtol=1e-13)
    r2 = minres(lambda v: Aj @ v, jnp.asarray(b), rtol=1e-13)
    np.testing.assert_allclose(np.asarray(r1.x), np.asarray(r2.x), atol=1e-8)


def test_chebyshev_preconditioner_reduces_iterations():
    """Chebyshev-Jacobi polynomial preconditioning cuts CG iterations ~d×
    on a lattice λ-Laplacian at identical accuracy."""
    import numpy as np

    from networks_fenicsx_tpu import (
        HydraulicNetworkAssembler,
        NetworkMesh,
        Solver,
        SolverOptions,
        network_generation,
    )

    G = network_generation.make_grid(24, 24, arrays=True)
    mesh = NetworkMesh(G, N=1, color_strategy="fast")
    sols, iters = [], []
    for deg in (1, 8):
        asm = HydraulicNetworkAssembler(mesh)
        asm.compute_forms(p_bc_ex=lambda x: x[0])
        s = Solver(asm, options=SolverOptions(schur_method="cg", cheb_degree=deg))
        s.assemble()
        sols.append(np.asarray(s.solve()[-2].array))
        iters.append(int(s.info.iterations))
        assert s.info.converged
    np.testing.assert_allclose(sols[0], sols[1], atol=1e-9)
    assert iters[1] * 3 < iters[0]  # at least 3x fewer outer iterations


def test_shift_matvec_matches_gather_matvec():
    """The shift-class matvec equals the gather+fold matvec elementwise."""
    import numpy as np

    from networks_fenicsx_tpu import (
        HydraulicNetworkAssembler,
        NetworkMesh,
        network_generation,
    )
    from networks_fenicsx_tpu import solver as S

    G = network_generation.make_grid(9, 7, arrays=True)
    mesh = NetworkMesh(G, N=2)
    asm = HydraulicNetworkAssembler(mesh)
    rng = np.random.default_rng(3)
    asm.compute_forms(p_bc_ex=lambda x: x[0], R=rng.uniform(0.5, 2.0, mesh.num_edges))
    B = mesh.num_multipliers
    shift_plan = S._plan_shift_matvec(asm)
    assert shift_plan is not None
    gather_plan = S._build_matvec_plan(asm)
    lam_plan = S._build_lambda_plan(asm)
    R_mode, f_mode, _ = asm.coefficient_modes()
    import jax

    args = asm.schur_arguments()
    ed = S._make_edge_data_uniform(asm, *args, R_mode, f_mode)
    diag, _ = S._lambda_system_sorted(ed, B, lam_plan)
    mv_shift = S._matvec_from_shift_plan(ed, diag, shift_plan, B)
    mv_gather = S._matvec_from_plan(ed, diag, gather_plan, B)
    v = rng.standard_normal(B)
    np.testing.assert_allclose(
        np.asarray(mv_shift(v)), np.asarray(mv_gather(v)), atol=1e-13
    )


def test_mg_preconditioner_grid_independent_iterations():
    """The 2-D aggregation multigrid keeps PCG iterations ~constant as the
    lattice grows, and matches the direct solve."""
    import numpy as np

    from networks_fenicsx_tpu import (
        HydraulicNetworkAssembler,
        NetworkMesh,
        Solver,
        SolverOptions,
        network_generation,
    )

    iters = {}
    for n in (32, 64):
        G = network_generation.make_grid(n, n, arrays=True)
        mesh = NetworkMesh(G, N=1, color_strategy="fast")
        asm = HydraulicNetworkAssembler(mesh)
        rng = np.random.default_rng(0)
        asm.compute_forms(
            p_bc_ex=lambda x: x[0], R=rng.uniform(0.5, 2.0, mesh.num_edges)
        )
        s = Solver(asm, options=SolverOptions(schur_method="cg", cg_precond="mg"))
        s.assemble()
        sol = s.solve()
        assert s.info.converged
        iters[n] = int(s.info.iterations)
        if n == 64:
            s2 = Solver(asm, options=SolverOptions(method="host_lu"))
            s2.assemble()
            ref = s2.solve()
            for a, b in zip(sol, ref):
                np.testing.assert_allclose(a.values, b.values, atol=1e-9)
    # quadrupling the problem must not even double the iteration count
    assert iters[64] < 2 * iters[32]
    assert iters[64] < 30


def test_mg_1d_fallback_on_skinny_lattice():
    """Skinny lattices fail the 2-D feasibility gate and use the 1-D
    pairing hierarchy; results still match the direct solve."""
    import numpy as np

    from networks_fenicsx_tpu import (
        HydraulicNetworkAssembler,
        NetworkMesh,
        Solver,
        SolverOptions,
        network_generation,
    )
    from networks_fenicsx_tpu import solver as S

    G = network_generation.make_grid(3, 2000, arrays=True)
    mesh = NetworkMesh(G, N=1, color_strategy="fast")
    asm = HydraulicNetworkAssembler(mesh)
    rng = np.random.default_rng(4)
    asm.compute_forms(p_bc_ex=lambda x: x[1], R=rng.uniform(0.5, 2.0, mesh.num_edges))
    assert not S._mg2d_feasible(mesh.num_multipliers, 3)
    s = Solver(asm, options=SolverOptions(schur_method="cg", cg_precond="mg"))
    s.assemble()
    sol = s.solve()
    assert s.info.converged
    s2 = Solver(asm, options=SolverOptions(method="host_lu"))
    s2.assemble()
    ref = s2.solve()
    for a, b in zip(sol, ref):
        np.testing.assert_allclose(a.values, b.values, atol=1e-8)


def _mg_lattice_iters(n: int, overcorrect: float = 1.8) -> int:
    """PCG iteration count of the MG-preconditioned λ solve on an n×n grid."""
    import numpy as np

    from networks_fenicsx_tpu import (
        HydraulicNetworkAssembler,
        NetworkMesh,
        Solver,
        SolverOptions,
        network_generation,
    )

    G = network_generation.make_grid(n, n, arrays=True)
    mesh = NetworkMesh(G, N=1, color_strategy="fast")
    asm = HydraulicNetworkAssembler(mesh)
    rng = np.random.default_rng(7)
    asm.compute_forms(p_bc_ex=lambda x: x[0], R=rng.uniform(0.5, 2.0, mesh.num_edges))
    s = Solver(
        asm,
        options=SolverOptions(
            schur_method="cg", cg_precond="mg", mg_overcorrect=overcorrect
        ),
    )
    s.assemble()
    s.solve()
    assert s.info.converged
    return int(s.info.iterations)


def test_mg_iteration_counts_pinned_at_scale():
    """Pin the grid-independence headline (STATUS: ~13/14/16 PCG iterations
    at 128²/256²/512²): iteration counts stay under a hard bound and grow
    by at most a couple per quadrupling.  512² runs only when
    NXFX_SLOW_TESTS is set (it is exercised on hardware by bench/validate)."""
    import os

    it128 = _mg_lattice_iters(128)
    it256 = _mg_lattice_iters(256)
    assert it128 <= 20, it128
    assert it256 <= 20, it256
    assert it256 <= it128 + 4, (it128, it256)
    if os.environ.get("NXFX_SLOW_TESTS"):
        it512 = _mg_lattice_iters(512)
        assert it512 <= 20, it512
        assert it512 <= it256 + 4, (it256, it512)


def test_mg_overcorrect_option_matters():
    """mg_overcorrect is live: disabling it (1.0) costs extra iterations."""
    tuned = _mg_lattice_iters(64, overcorrect=1.8)
    plain = _mg_lattice_iters(64, overcorrect=1.0)
    assert tuned < plain, (tuned, plain)


def test_solver_options_validation():
    """SolverOptions rejects typos eagerly (not only when a branch traces)."""
    import pytest as _pytest

    from networks_fenicsx_tpu import SolverOptions

    with _pytest.raises(ValueError, match="cg_precond"):
        SolverOptions(cg_precond="multigrid")
    with _pytest.raises(ValueError, match="cheb_degree"):
        SolverOptions(cheb_degree=0)
    with _pytest.raises(ValueError, match="schur_method"):
        SolverOptions(schur_method="lu")
    with _pytest.raises(ValueError, match="mg_overcorrect"):
        SolverOptions(mg_overcorrect=0.0)


@pytest.mark.parametrize("dims", [(9, 7), (24, 24)])
def test_dct_lattice_direct_solve(dims):
    """Forced separable-DCT direct solve on uniform grids == host LU."""
    from networks_fenicsx_tpu import (
        HydraulicNetworkAssembler,
        NetworkMesh,
        Solver,
        SolverOptions,
        network_generation,
    )


    nx_, ny_ = dims
    G = network_generation.make_grid(nx_, ny_, arrays=True)
    mesh = NetworkMesh(G, N=2)
    asm = HydraulicNetworkAssembler(mesh)
    asm.compute_forms(p_bc_ex=lambda x: x[0], R=2.0, f=0.3)
    s = Solver(asm, options=SolverOptions(method="schur", schur_method="dct"))
    s.assemble()
    sol = s.solve()
    asm2 = HydraulicNetworkAssembler(mesh)
    asm2.compute_forms(p_bc_ex=lambda x: x[0], R=2.0, f=0.3)
    s2 = Solver(asm2, options=SolverOptions(method="host_lu"))
    s2.assemble()
    ref = s2.solve()
    for a, b in zip(sol, ref):
        scale = max(1.0, float(np.max(np.abs(b.values))))
        np.testing.assert_allclose(a.values, b.values, atol=1e-10 * scale)


def test_dct_auto_engages_above_dense_threshold():
    """Above the dense cutoff the auto path picks cg and the DCT plan
    takes over: zero iterations reported, host-LU accuracy."""
    from networks_fenicsx_tpu import (
        HydraulicNetworkAssembler,
        NetworkMesh,
        Solver,
        SolverOptions,
        network_generation,
    )


    G = network_generation.make_grid(66, 66, arrays=True)  # B=4356 > 4096
    mesh = NetworkMesh(G, N=1, color_strategy="fast")
    asm = HydraulicNetworkAssembler(mesh)
    asm.compute_forms(p_bc_ex=lambda x: x[0], R=1.0)
    s = Solver(asm, options=SolverOptions(method="schur"))
    s.assemble()
    sol = s.solve()
    assert s.info.iterations == 0
    asm2 = HydraulicNetworkAssembler(mesh)
    asm2.compute_forms(p_bc_ex=lambda x: x[0], R=1.0)
    s2 = Solver(asm2, options=SolverOptions(method="host_lu"))
    s2.assemble()
    ref = s2.solve()
    for a, b in zip(sol, ref):
        scale = max(1.0, float(np.max(np.abs(b.values))))
        np.testing.assert_allclose(a.values, b.values, atol=1e-9 * scale)


def test_dct_requires_uniform_lattice():
    """Per-edge resistance disqualifies the DCT plan: forcing it raises,
    and the auto path silently falls back to preconditioned CG."""
    from networks_fenicsx_tpu import (
        HydraulicNetworkAssembler,
        NetworkMesh,
        Solver,
        SolverOptions,
        network_generation,
    )


    G = network_generation.make_grid(12, 10, arrays=True)
    mesh = NetworkMesh(G, N=1)
    rng = np.random.default_rng(3)
    R = rng.uniform(0.5, 2.0, mesh.num_edges)
    asm = HydraulicNetworkAssembler(mesh)
    asm.compute_forms(p_bc_ex=lambda x: x[0], R=R)
    s = Solver(asm, options=SolverOptions(method="schur", schur_method="dct"))
    s.assemble()
    with pytest.raises(ValueError, match="uniform rectangular-lattice"):
        s.solve()
