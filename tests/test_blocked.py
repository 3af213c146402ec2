"""Blocked-sibling executor fast path: plan structure, equivalence with the
general path, and fallbacks for out-of-envelope inputs."""

import numpy as np
import pytest

from networks_fenicsx_tpu import (
    HydraulicNetworkAssembler,
    NetworkMesh,
    Solver,
    SolverOptions,
    network_generation,
)
from networks_fenicsx_tpu import solver as S

from _topologies import kary_tree as _kary_tree


def _asm(G, N=3, R=None, f=None, p_bc=lambda x: x[0] + 0.7 * x[1]):
    mesh = NetworkMesh(G, N=N, color_strategy="fast")
    asm = HydraulicNetworkAssembler(mesh)
    asm.compute_forms(p_bc_ex=p_bc, f=f, R=R)
    return mesh, asm


def _blocked(asm):
    return S.build_schur_executor(
        asm, SolverOptions(), jit=False, outputs="blocks", internal_layout=True
    )


def test_plan_structure_binary_tree():
    mesh, asm = _asm(network_generation.make_tree(4, 1.0, 2.0))
    plan = S._plan_blocked(asm)
    assert plan is not None
    B, E = mesh.num_multipliers, mesh.num_edges
    assert np.array_equal(np.sort(plan.bif_order), np.arange(B))
    assert np.array_equal(np.sort(plan.edge_order), np.arange(E))
    assert plan.n_roots == 1
    # level sizes double until the leaf level
    sizes = np.diff(plan.bif_offsets)
    assert list(sizes) == [1, 2, 4]
    last = plan.levels[-1]
    assert last.n_bif_outs == 0  # leaves below


@pytest.mark.parametrize("maker,kw", [
    (network_generation.make_tree, dict(n=6, H=1.0, W=2.0)),
    (network_generation.make_arterial_tree, dict(N=5, direction=np.array([0.1, 1, 0]))),
])
def test_blocked_matches_flat(maker, kw):
    rng = np.random.default_rng(5)
    G = maker(**kw)
    mesh, asm = _asm(G, N=4, R=None, f=0.3)
    asm.compute_forms(
        p_bc_ex=lambda x: x[1],
        f=rng.uniform(-1, 1, mesh.num_edges),
        R=rng.uniform(0.5, 2.0, mesh.num_edges),
    )
    ex_b = _blocked(asm)
    assert isinstance(ex_b, S._BlockedExecutor)
    ex_f = S.build_schur_executor(asm, SolverOptions(), jit=False)
    args = asm.schur_arguments()
    x_flat = np.asarray(ex_f(*args)[0])
    out = ex_b(*ex_b.prepare_args(*args))
    x_blk = S._flatten_blocks_host(
        out[0], out[1], out[2], mesh.edge_color,
        edge_order=ex_b.edge_order, bif_order=ex_b.bif_order,
    )
    scale = max(1.0, np.max(np.abs(x_flat)))
    np.testing.assert_allclose(x_blk, x_flat, atol=1e-12 * scale)
    assert bool(out[-1])  # finite flag


def test_fallback_on_grid():
    """Cyclic lattices have in-degree > 1 junctions — plan must decline."""
    mesh, asm = _asm(network_generation.make_grid(4, 3), N=2)
    assert S._plan_blocked(asm) is None
    ex = _blocked(asm)
    assert not isinstance(ex, S._BlockedExecutor)  # plain executor fallback


def test_chain_blocked_k1():
    """Degree-2 chain junctions are K=1 levels of the blocked plan (round
    3; previously a fallback) and match the direct solve."""
    import networkx as nx

    G = nx.DiGraph()
    for i, y in enumerate([0.0, 1.0, 2.0, 3.5]):
        G.add_node(i, pos=np.array([0.3 * i, y]))
    G.add_edge(0, 1)
    G.add_edge(1, 2)
    G.add_edge(2, 3)
    mesh, asm = _asm(G, N=2)
    plan = S._plan_blocked(asm)
    assert plan is not None
    assert all(len(lv.outs) == 1 for lv in plan.levels)
    sol = Solver(asm)
    sol.assemble()
    out = sol.solve()
    assert isinstance(sol._executor, S._BlockedExecutor)
    s2 = Solver(asm, options=SolverOptions(method="host_lu"))
    s2.assemble()
    ref = s2.solve()
    for a, b in zip(out, ref):
        np.testing.assert_allclose(a.values, b.values, atol=1e-10)


def test_blocked_per_cell_coefficients_match_general():
    """Per-cell R and f stay inside the blocked envelope (round 3) and
    match the general executor exactly."""
    G = network_generation.make_tree(4, 1.0, 2.0)
    mesh = NetworkMesh(G, N=3)
    asm = HydraulicNetworkAssembler(mesh)
    rng = np.random.default_rng(11)
    asm.compute_forms(
        p_bc_ex=lambda x: x[1],
        R=rng.uniform(0.5, 2.0, mesh.num_cells),
        f=rng.uniform(-1.0, 1.0, mesh.num_cells),
    )
    ex_b = _blocked(asm)
    assert isinstance(ex_b, S._BlockedExecutor)
    ex_g = S.build_schur_executor(asm, SolverOptions(), jit=False)
    x_flat = np.asarray(ex_g(*asm.schur_arguments())[0])
    out = ex_b(*ex_b.prepare_args(*asm.schur_arguments(device=False)))
    x_blk = S._flatten_blocks_host(
        out[0], out[1], out[2], mesh.edge_color,
        edge_order=ex_b.edge_order, bif_order=ex_b.bif_order,
    )
    scale = max(1.0, float(np.max(np.abs(x_flat))))
    np.testing.assert_allclose(x_blk, x_flat, atol=1e-12 * scale)


@pytest.mark.parametrize("K", [3, 4])
def test_blocked_kary_tree_matches_general(K):
    """Uniformly K-ary forests auto-select a blocked plan (round 3: no
    longer binary-only) and match the general executor."""
    G = _kary_tree(K, 2)
    mesh = NetworkMesh(G, N=3)
    asm = HydraulicNetworkAssembler(mesh)
    rng = np.random.default_rng(13)
    asm.compute_forms(
        p_bc_ex=lambda x: x[0] + 0.4 * x[1],
        R=rng.uniform(0.5, 2.0, mesh.num_edges),
        f=0.3,
    )
    ex_b = _blocked(asm)
    assert isinstance(ex_b, S._BlockedExecutor)
    assert all(len(lv.outs) == K for lv in ex_b.blocked_plan.levels)
    ex_g = S.build_schur_executor(asm, SolverOptions(), jit=False)
    x_flat = np.asarray(ex_g(*asm.schur_arguments())[0])
    out = ex_b(*ex_b.prepare_args(*asm.schur_arguments(device=False)))
    x_blk = S._flatten_blocks_host(
        out[0], out[1], out[2], mesh.edge_color,
        edge_order=ex_b.edge_order, bif_order=ex_b.bif_order,
    )
    scale = max(1.0, float(np.max(np.abs(x_flat))))
    np.testing.assert_allclose(x_blk, x_flat, atol=1e-12 * scale)
    # cross-check against the direct host solve
    s = Solver(asm, options=SolverOptions(method="host_lu"))
    s.assemble()
    sol = s.solve()
    x_ref = np.concatenate([np.ravel(fn.values) for fn in sol])
    np.testing.assert_allclose(x_blk, x_ref, atol=1e-9)


def test_solver_uses_blocked_for_trees():
    G = network_generation.make_tree(4, 1.0, 2.0)
    mesh = NetworkMesh(G, N=3)
    asm = HydraulicNetworkAssembler(mesh)
    asm.compute_forms(p_bc_ex=lambda x: x[1])
    s = Solver(asm)
    s.assemble()
    sol = s.solve()
    assert isinstance(s._executor, S._BlockedExecutor)
    # λ agrees with the analytic-free cross-check via host_lu
    s2 = Solver(asm, options=SolverOptions(method="host_lu"))
    s2.assemble()
    sol2 = s2.solve()
    for a, b in zip(sol, sol2):
        np.testing.assert_allclose(a.values, b.values, atol=1e-9)


def test_solve_sweep_blocked_matches_individual():
    """Sweeps route through the blocked executor (schur_method='tree'
    bypasses the small-B dense override) and match per-scenario solves."""
    from networks_fenicsx_tpu import solve_sweep

    G = network_generation.make_tree(4, 1.0, 2.0)
    mesh = NetworkMesh(G, N=3)
    asm = HydraulicNetworkAssembler(mesh)
    R0 = np.linspace(0.5, 2.0, mesh.num_edges)
    asm.compute_forms(p_bc_ex=lambda x: x[1], R=R0)
    scales = np.linspace(1.0, 3.0, 4)
    res = solve_sweep(
        asm, R=R0[None, :] * scales[:, None],
        options=SolverOptions(schur_method="tree"),
    )
    assert res._edge_order is not None  # blocked layout active
    xs = np.asarray(res.x)
    for i in [0, 3]:
        asm_i = HydraulicNetworkAssembler(mesh)
        asm_i.compute_forms(p_bc_ex=lambda x: x[1], R=R0 * scales[i])
        s = Solver(asm_i, options=SolverOptions(method="host_lu"))
        s.assemble()
        sol = s.solve()
        x_i = np.concatenate([np.ravel(fn.values) for fn in sol])
        np.testing.assert_allclose(xs[i], x_i, atol=1e-9)


def test_solve_sweep_blocked_pbc_batch():
    """Batched boundary pressures compose with the internal edge order."""
    from networks_fenicsx_tpu import solve_sweep

    G = network_generation.make_tree(3, 1.0, 2.0)
    mesh = NetworkMesh(G, N=2)
    asm = HydraulicNetworkAssembler(mesh)
    asm.compute_forms(p_bc_ex=lambda x: x[1], R=np.ones(mesh.num_edges))
    Vg = mesh.num_graph_nodes
    rng = np.random.default_rng(2)
    pbv = rng.uniform(-1.0, 1.0, (3, Vg))
    res = solve_sweep(
        asm, p_bc_node_values=pbv, options=SolverOptions(schur_method="tree")
    )
    assert res._edge_order is not None
    # reference: the general (dense) sweep path with the same batch
    asm2 = HydraulicNetworkAssembler(mesh)
    asm2.compute_forms(p_bc_ex=lambda x: x[1], R=np.ones(mesh.num_edges))
    res_ref = solve_sweep(
        asm2, p_bc_node_values=pbv, options=SolverOptions(schur_method="dense")
    )
    assert res_ref._edge_order is None  # general path
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(res_ref.x), atol=1e-10)


def test_blocked_asymmetric_depth_tree():
    """Trees where one sibling branch is a leaf while the other continues
    (mixed bif/leaf sub-blocks within a level) stay inside the blocked
    envelope and match the general executor."""
    import networkx as nx

    # root -> b0 -> {leaf, b1}; b1 -> {leaf, b2}; b2 -> {leaf, leaf}
    G = nx.DiGraph()
    pos = {
        0: (0.0, 0.0), 1: (0.0, 1.0),
        2: (-1.0, 2.0), 3: (1.0, 2.0),
        4: (0.5, 3.0), 5: (1.5, 3.0),
        6: (1.0, 4.0), 7: (2.0, 4.0),
    }
    for n_, p_ in pos.items():
        G.add_node(n_, pos=np.array(p_, dtype=float))
    for u, v in [(0, 1), (1, 2), (1, 3), (3, 4), (3, 5), (5, 6), (5, 7)]:
        G.add_edge(u, v)
    mesh = NetworkMesh(G, N=3)
    asm = HydraulicNetworkAssembler(mesh)
    rng = np.random.default_rng(9)
    asm.compute_forms(
        p_bc_ex=lambda x: x[0] - 0.3 * x[1],
        R=rng.uniform(0.5, 2.0, mesh.num_edges),
        f=0.6,
    )
    ex_b = _blocked(asm)
    assert isinstance(ex_b, S._BlockedExecutor)
    plan = ex_b.blocked_plan
    assert any(0 < lv.n_bif_outs < len(lv.outs) for lv in plan.levels)  # mixed level
    ex_g = S.build_schur_executor(asm, SolverOptions(), jit=False, outputs="blocks")
    ob = ex_b(*ex_b.prepare_args(*asm.schur_arguments(device=False)))
    og = ex_g(*asm.schur_arguments())
    xb = S._flatten_blocks_host(ob[0], ob[1], ob[2], mesh.edge_color,
                                edge_order=ex_b.edge_order, bif_order=ex_b.bif_order)
    xg = S._flatten_blocks_host(og[0], og[1], og[2], mesh.edge_color)
    np.testing.assert_allclose(xb, xg, atol=1e-13)


@pytest.mark.parametrize("flux_degree", [2, 3])
@pytest.mark.parametrize("R_kind", ["edge", "cell"])
def test_blocked_high_degree_matches_dense(flux_degree, R_kind):
    """Flux degree >= 2 routes through the blocked executor (fixed
    condensed constants — see _condensed_scalar_constants) and matches
    the dense solver, including the interior-dof recovery."""
    G = network_generation.make_tree(4, 1.5, 2.0)
    mesh = NetworkMesh(G, N=3, color_strategy="fast")
    rng = np.random.default_rng(11)
    n = mesh.num_edges if R_kind == "edge" else mesh.num_cells
    R = rng.uniform(0.5, 3.0, n)
    f = rng.uniform(-1.0, 1.0, mesh.num_edges)

    asm = HydraulicNetworkAssembler(mesh, flux_degree=flux_degree)
    asm.compute_forms(p_bc_ex=lambda x: x[1], f=f, R=R)
    ex = S.build_schur_executor(
        asm, SolverOptions(), outputs="blocks", internal_layout=True
    )
    assert isinstance(ex, S._BlockedExecutor)

    s1 = Solver(asm, options=SolverOptions(method="schur"))
    s1.assemble()
    got = np.concatenate([np.asarray(fn.values).ravel() for fn in s1.solve()])

    asm2 = HydraulicNetworkAssembler(mesh, flux_degree=flux_degree)
    asm2.compute_forms(p_bc_ex=lambda x: x[1], f=f, R=R)
    s2 = Solver(asm2, options=SolverOptions(method="dense"))
    s2.assemble()
    ref = np.concatenate([np.asarray(fn.values).ravel() for fn in s2.solve()])
    np.testing.assert_allclose(got, ref, atol=1e-10)


def test_solve_sweep_high_degree():
    """Batched resistance sweeps at flux degree 2 vmapping the blocked
    executor match the per-scenario dense solver."""
    from networks_fenicsx_tpu import solve_sweep

    G = network_generation.make_tree(4, 1.0, 2.0)
    mesh = NetworkMesh(G, N=3, color_strategy="fast")
    rng = np.random.default_rng(9)
    Rb = rng.uniform(0.5, 2.0, mesh.num_edges)
    asm = HydraulicNetworkAssembler(mesh, flux_degree=2)
    asm.compute_forms(p_bc_ex=lambda x: x[1], f=0.3, R=Rb)
    Rs = rng.uniform(0.5, 2.0, (5, mesh.num_edges))
    x = np.asarray(solve_sweep(asm, R=Rs).x)

    asm2 = HydraulicNetworkAssembler(mesh, flux_degree=2)
    asm2.compute_forms(p_bc_ex=lambda x: x[1], f=0.3, R=Rs[3])
    s2 = Solver(asm2, options=SolverOptions(method="dense"))
    s2.assemble()
    ref = np.concatenate([np.asarray(fn.values).ravel() for fn in s2.solve()])
    np.testing.assert_allclose(x[3], ref, atol=1e-10)


def test_blocked_factorization_reuse():
    """Factor-reuse serving: one resistance-side factorization, many rhs
    solves — each matches the full fused solver exactly (the KSP/MUMPS
    factor-reuse analog, reference solver.py:58-65)."""
    from networks_fenicsx_tpu.solver import build_blocked_factorization

    rng = np.random.default_rng(4)
    for gens, N, k, fkind in [(5, 3, 1, "edge"), (4, 2, 2, "cell")]:
        G = network_generation.make_tree(gens, 1.0, 2.0, arrays=True)
        mesh = NetworkMesh(G, N=N, color_strategy="fast")
        E, C = mesh.num_edges, mesh.num_edges * N
        R = rng.uniform(0.5, 2.0, E)
        f0 = rng.uniform(-1.0, 1.0, E if fkind == "edge" else C)
        asm = HydraulicNetworkAssembler(mesh, flux_degree=k)
        asm.compute_forms(p_bc_ex=lambda x: x[1], f=f0, R=R)
        fac = build_blocked_factorization(asm)
        state = fac.factor(R)
        for _ in range(2):
            fv = rng.uniform(-1.0, 1.0, E if fkind == "edge" else C)
            asm2 = HydraulicNetworkAssembler(mesh, flux_degree=k)
            asm2.compute_forms(p_bc_ex=lambda x: x[1], f=fv, R=R)
            s = Solver(asm2)
            s.solve()
            ref = np.asarray(s.solution_vector())
            args = asm2.schur_arguments(device=False)
            out = fac.solve(state, args[1], args[2], args[3])
            x = fac.solution_vector(out)
            scale = max(1.0, np.abs(ref).max())
            np.testing.assert_allclose(x, ref, atol=1e-12 * scale)
            assert bool(out[4])


def test_blocked_factorization_rejects_outside_envelope():
    from networks_fenicsx_tpu.solver import build_blocked_factorization

    G = network_generation.make_grid(4, 3)  # cyclic: not blocked-eligible
    mesh = NetworkMesh(G, N=2)
    asm = HydraulicNetworkAssembler(mesh)
    asm.compute_forms(p_bc_ex=lambda x: x[0])
    with pytest.raises(ValueError, match="blocked-eligible"):
        build_blocked_factorization(asm)


def test_blocked_factorization_solve_batch():
    """Vmapped rhs sweeps against one cached factor match per-rhs solves."""
    from networks_fenicsx_tpu.solver import build_blocked_factorization

    rng = np.random.default_rng(12)
    G = network_generation.make_tree(5, 1.0, 2.0, arrays=True)
    mesh = NetworkMesh(G, N=2, color_strategy="fast")
    E = mesh.num_edges
    R = rng.uniform(0.5, 2.0, E)
    asm = HydraulicNetworkAssembler(mesh)
    asm.compute_forms(p_bc_ex=lambda x: x[1], f=rng.uniform(-1, 1, E), R=R)
    fac = build_blocked_factorization(asm)
    state = fac.factor(R)
    S = 3
    fb = rng.uniform(-1.0, 1.0, (S, E))
    _, _, spbc, epbc = asm.schur_arguments(device=False)
    sp_b = np.broadcast_to(np.asarray(spbc), (S, E))
    ep_b = np.broadcast_to(np.asarray(epbc), (S, E))
    outs = fac.solve_batch(state, fb, sp_b, ep_b)
    for i in range(S):
        single = fac.solve(state, fb[i], spbc, epbc)
        for a, b in zip(outs, single):
            np.testing.assert_allclose(
                np.asarray(a[i]), np.asarray(b), atol=1e-14
            )


@pytest.mark.parametrize("gens,N,K", [(6, 3, 2), (8, 1, 2), (4, 2, 3)])
def test_blocked_level_scan_matches_unrolled(gens, N, K):
    """SolverOptions(level_scan='on') runs the shallow elimination levels
    under lax.scan over a padded uniform layout — numerically equivalent
    to the unrolled per-level program (the launch-bound serving tail
    experiment; see _blocked_eliminate_scan)."""
    if K == 2:
        G = network_generation.make_tree(gens, 1.0, 2.0)
    else:
        G = _kary_tree(K, gens)
    mesh = NetworkMesh(G, N=N, color_strategy="fast")
    rng = np.random.default_rng(7)
    R = rng.uniform(0.5, 2.0, mesh.num_edges)
    f = rng.uniform(-1.0, 1.0, mesh.num_edges)

    xs = []
    for mode in ("off", "on"):
        asm = HydraulicNetworkAssembler(mesh)
        asm.compute_forms(p_bc_ex=lambda x: x[1], f=f, R=R)
        s = Solver(asm, options=SolverOptions(level_scan=mode))
        s.assemble()
        s.solve()
        assert s.info.converged
        xs.append(np.asarray(s.solution_vector()))
    scale = max(1.0, np.abs(xs[0]).max())
    np.testing.assert_allclose(xs[1], xs[0], atol=1e-12 * scale)


def test_blocked_level_scan_small_m_cut():
    """Force a tiny m_cut so several levels go through the scan even on a
    small tree, and compare the eliminate variants directly."""
    from networks_fenicsx_tpu.solver import (
        _blocked_condense,
        _blocked_eliminate,
        _blocked_eliminate_scan,
        _plan_blocked,
    )
    import jax.numpy as jnp

    G = network_generation.make_tree(7, 1.0, 2.0)
    mesh = NetworkMesh(G, N=1, color_strategy="fast")
    rng = np.random.default_rng(3)
    R = rng.uniform(0.5, 2.0, mesh.num_edges)
    asm = HydraulicNetworkAssembler(mesh)
    asm.compute_forms(p_bc_ex=lambda x: x[1], f=0.3, R=R)
    plan = _plan_blocked(asm)
    assert plan is not None
    E = mesh.num_edges
    h_e = np.asarray(mesh.edge_length)[plan.edge_order] / mesh.N
    W, g, Ftot, _back = _blocked_condense(
        mesh.N, E, jnp.asarray(h_e),
        jnp.asarray(R[plan.edge_order]),
        jnp.asarray(np.full(E, 0.3)[plan.edge_order]),
        "edge", "edge", k=1,
    )
    w = 1.0 / W
    s_b = jnp.asarray(plan.s_is_bif)
    t_b = jnp.asarray(plan.t_is_bif)
    sp = jnp.asarray(np.asarray(asm._edge_start_pbc)[plan.edge_order])
    ep = jnp.asarray(np.asarray(asm._edge_end_pbc)[plan.edge_order])
    const = (-sp * (~s_b) + ep * (~t_b) - g) * w

    lam_lev_a, lam_a, rn_a = _blocked_eliminate(plan, w, const, Ftot)
    for m_cut in (4, 16, 1 << 30):
        lam_lev_b, lam_b, rn_b = _blocked_eliminate_scan(
            plan, w, const, Ftot, m_cut=m_cut
        )
        np.testing.assert_allclose(
            np.asarray(lam_b), np.asarray(lam_a), atol=1e-13
        )
        np.testing.assert_allclose(float(rn_b), float(rn_a), rtol=1e-12)
        for la, lb in zip(lam_lev_a, lam_lev_b):
            np.testing.assert_allclose(
                np.asarray(lb), np.asarray(la), atol=1e-13
            )
