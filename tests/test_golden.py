"""Golden-solution tests: every solver method vs an independent oracle.

The committed files in ``tests/goldens/`` hold the exact discrete solutions
of the reference demo configurations (BASELINE.md's 1e-8 matching set),
computed by ``scripts/exact_golden.py`` — an exact-rational (Fraction)
solver that shares no code with the production assembly/solve path.  This
breaks the round-1 self-agreement loop (production schur vs production
host_lu of the production-assembled matrix): a sign/scaling bug common to
the whole package would fail here.

Regenerate via ``python scripts/make_goldens.py`` (or, inside the reference
container, ``scripts/make_goldens_dolfinx.py`` for DOLFINx/MUMPS goldens).
"""

import json
from pathlib import Path

import numpy as np
import pytest

from networks_fenicsx_tpu import (
    HydraulicNetworkAssembler,
    NetworkMesh,
    Solver,
    SolverOptions,
    network_generation,
)

GOLDEN_DIR = Path(__file__).parent / "goldens"
GOLDEN_NAMES = sorted(p.stem for p in GOLDEN_DIR.glob("*.json"))


def _load(name: str) -> dict:
    return json.loads((GOLDEN_DIR / f"{name}.json").read_text())


def _build_problem(golden: dict):
    spec = golden["config"]
    if spec["graph"] == "tree":
        G = network_generation.make_tree(spec["n"], spec["H"], spec["W"])
    elif spec["graph"] == "grid":
        G = network_generation.make_grid(spec["nx"], spec["ny"])
    elif spec["graph"] == "random":
        G = network_generation.make_random_network(
            spec["n"],
            keep=spec["keep"],
            num_boundary=spec["num_boundary"],
            seed=spec["seed"],
        )
    else:
        G = network_generation.make_arterial_tree(
            N=spec["n"], direction=np.asarray(spec["direction"])
        )
    mesh = NetworkMesh(G, N=spec["N"])
    asm = HydraulicNetworkAssembler(mesh, flux_degree=spec.get("flux_degree", 1))
    p_bc = (lambda x: x[0]) if spec["p_bc"] == "x" else (lambda x: x[1])
    if spec.get("R") == "poiseuille":
        R = 1.0 / mesh.edge_radius**4
    elif isinstance(spec.get("R"), list):
        # per-edge values embedded by make_goldens.py, in the golden's
        # "edges" order — remap to the mesh's public edge order
        mesh_edges = [tuple(int(x) for x in e) for e in mesh.edges]
        order = np.asarray(
            [mesh_edges.index(tuple(e)) for e in golden["edges"]]
        )
        R = np.empty(len(spec["R"]))
        R[order] = np.asarray(spec["R"])
    else:
        R = spec.get("R")
    asm.compute_forms(p_bc_ex=p_bc, R=R, f=spec.get("f"))
    return G, mesh, asm


def _canonical(mesh, asm, sol):
    """Map the production function list onto the golden's canonical layout:
    per-edge along-edge flux node values (E, k·N+1), per-edge cell
    pressures (E, N), multipliers keyed by bifurcation node id."""
    E, N, k = mesh.num_edges, mesh.N, asm.flux_degree
    flux = np.zeros((E, k * N + 1))
    for fn in sol[:-2]:
        view = mesh.submeshes[fn.space.color]
        per_edge = fn.values.reshape(view.edge_ids.size, k * N + 1)
        flux[np.asarray(view.edge_ids)] = per_edge
    pressure = np.asarray(sol[-2].values).reshape(E, N)
    lam = {
        int(node): float(v)
        for node, v in zip(mesh.bifurcation_values, sol[-1].values)
    }
    return flux, pressure, lam


def _check(golden, mesh, asm, sol, tol):
    flux, pressure, lam = _canonical(mesh, asm, sol)
    # align golden edge order with the mesh's edge order via (u, v) pairs
    mesh_edges = [tuple(int(x) for x in e) for e in mesh.edges]
    order = [mesh_edges.index(tuple(e)) for e in golden["edges"]]
    scale_q = max(1.0, np.abs(np.asarray(golden["flux"])).max())
    scale_p = max(1.0, np.abs(np.asarray(golden["pressure"])).max())
    np.testing.assert_allclose(
        flux[order], np.asarray(golden["flux"]), atol=tol * scale_q, rtol=0
    )
    np.testing.assert_allclose(
        pressure[order], np.asarray(golden["pressure"]), atol=tol * scale_p, rtol=0
    )
    for node, lam_exact in golden["lam"].items():
        assert abs(lam[int(node)] - lam_exact) <= tol * max(1.0, abs(lam_exact))


@pytest.mark.parametrize("name", GOLDEN_NAMES)
@pytest.mark.parametrize("method", ["schur", "dense", "host_lu"])
def test_golden_direct_methods(name: str, method: str):
    golden = _load(name)
    _, mesh, asm = _build_problem(golden)
    solver = Solver(asm, options=SolverOptions(method=method))
    solver.assemble()
    sol = solver.solve()
    _check(golden, mesh, asm, sol, tol=1e-10)


@pytest.mark.parametrize("name", ["y_bifurcation", "arterial_poiseuille"])
@pytest.mark.parametrize("schur_method", ["tree", "dense", "cg"])
def test_golden_schur_variants(name: str, schur_method: str):
    golden = _load(name)
    _, mesh, asm = _build_problem(golden)
    solver = Solver(
        asm, options=SolverOptions(method="schur", schur_method=schur_method)
    )
    solver.assemble()
    sol = solver.solve()
    _check(golden, mesh, asm, sol, tol=1e-10)


@pytest.mark.parametrize("schur_method", ["tree", "dct", "cg"])
def test_golden_grid_schur_variants(schur_method: str):
    """The lattice golden pins the cycle-core elimination, the exact
    separable-DCT direct solve AND the CG path against exact rational
    arithmetic (independent of host_lu and of each other)."""
    golden = _load("grid5x4")
    _, mesh, asm = _build_problem(golden)
    solver = Solver(
        asm, options=SolverOptions(method="schur", schur_method=schur_method)
    )
    solver.assemble()
    sol = solver.solve()
    _check(golden, mesh, asm, sol, tol=1e-10)


def test_golden_web_forced_sparse_core():
    """The unstructured-web golden pins the sparse min-degree core
    NUMERIC phase (ops/core_elim.py) against exact rational arithmetic:
    the 47-node cycle core would normally stay dense (<= 512), so a core
    plan with a tiny dense_cutoff is force-attached — the independent-set
    elimination rounds then carry the solve."""
    from networks_fenicsx_tpu.solver import (
        _plan_tree_elimination,
        _schur_solve,
        attach_core_plan,
        build_schur_executor,
    )

    golden = _load("web48")
    _, mesh, asm = _build_problem(golden)
    plan = _plan_tree_elimination(asm)
    forced = attach_core_plan(plan, dense_cutoff=4, tail_stop=False)
    assert forced.core_plan is not None
    assert forced.core_plan.stats["rounds"] > 0
    opts = SolverOptions(method="schur", schur_method="tree")
    ex = build_schur_executor(asm, opts, _tree_plan=forced)
    x, info = _schur_solve(asm, opts, executor=ex)
    assert info.converged

    # same flat layout as Solver.solution_vector(): pin against the
    # standard solver (itself golden-pinned by test_golden_direct_methods)
    ref = Solver(asm, options=SolverOptions(method="schur"))
    ref.assemble()
    sol = ref.solve()
    _check(golden, mesh, asm, sol, tol=1e-10)
    refv = np.asarray(ref.solution_vector())
    scale = max(1.0, np.abs(refv).max())
    np.testing.assert_allclose(np.asarray(x), refv, atol=1e-10 * scale)


def test_golden_web_forced_supernodal_fronts():
    """The same exact-Fraction web golden through the multifrontal tail:
    tiny forced fronts (extend-add chain + per-front Cholesky) must
    reproduce the rational-arithmetic solution — the strongest oracle
    for the supernodal numeric phase."""
    from networks_fenicsx_tpu.ops.core_elim import (
        nested_dissection_order,
        plan_core_elimination,
    )
    from networks_fenicsx_tpu.solver import (
        _plan_tree_elimination,
        _schur_solve,
        build_schur_executor,
    )

    golden = _load("web48")
    _, mesh, asm = _build_problem(golden)
    plan = _plan_tree_elimination(asm)
    pairs = np.asarray(plan.core_pairs)
    nd = nested_dissection_order(pairs, plan.core_size, leaf=4)
    cp = plan_core_elimination(
        pairs, plan.core_size, dense_cutoff=8, kcap=16, order=nd,
        dense_cap=4, supernodal_tail=True, front_max=7, front_cap=64,
        tail_stop=False,
    )
    assert cp is not None and cp.fronts, cp and cp.stats
    opts = SolverOptions(method="schur", schur_method="tree")
    ex = build_schur_executor(asm, opts, _tree_plan=plan._replace(core_plan=cp))
    x, info = _schur_solve(asm, opts, executor=ex)
    assert info.converged

    ref = Solver(asm, options=SolverOptions(method="schur"))
    ref.assemble()
    sol = ref.solve()
    _check(golden, mesh, asm, sol, tol=1e-10)
    refv = np.asarray(ref.solution_vector())
    scale = max(1.0, np.abs(refv).max())
    np.testing.assert_allclose(np.asarray(x), refv, atol=1e-10 * scale)


@pytest.mark.parametrize("name", ["y_bifurcation", "tree4"])
def test_golden_minres(name: str):
    golden = _load(name)
    _, mesh, asm = _build_problem(golden)
    solver = Solver(asm, options=SolverOptions(method="minres", rtol=1e-13))
    solver.assemble()
    sol = solver.solve()
    _check(golden, mesh, asm, sol, tol=1e-7)


def test_goldens_exist():
    """All demo-parity configurations (plus the degree >= 2 hardening
    variants) are committed."""
    expected = {
        "y_bifurcation", "double_y", "tree_N2", "tree_N16", "tree_N256",
        "tree4", "y_source", "arterial", "arterial_poiseuille",
        "tree3_k2", "y_k3", "grid5x4", "web48",
    }
    assert expected.issubset(set(GOLDEN_NAMES))


# --- DOLFINx/MUMPS goldens (BASELINE.md's literal acceptance oracle) -----
# This image cannot run the reference stack (no dolfinx, no container
# runtime, zero egress), so scripts/make_goldens_dolfinx.py must be run in
# the ghcr.io/fenics/dolfinx/dolfinx:stable container; the moment its
# output lands in tests/goldens_dolfinx/, these tests activate without any
# code change and pin BOTH production solutions and the exact-Fraction
# oracle against the reference at 1e-8.

DOLFINX_DIR = Path(__file__).parent / "goldens_dolfinx"
DOLFINX_NAMES = sorted(p.stem for p in DOLFINX_DIR.glob("*.json"))


def _load_dolfinx(name: str) -> dict:
    return json.loads((DOLFINX_DIR / f"{name}.json").read_text())


@pytest.mark.parametrize(
    "name",
    DOLFINX_NAMES
    or [
        pytest.param(
            "absent",
            marks=pytest.mark.skip(
                reason="tests/goldens_dolfinx/ not generated — run "
                "scripts/make_goldens_dolfinx.py inside the "
                "dolfinx/dolfinx:stable container (not possible in this "
                "image: no dolfinx, no container runtime, no egress)"
            ),
        )
    ],
)
def test_dolfinx_golden_production(name: str):
    golden = _load_dolfinx(name)
    _, mesh, asm = _build_problem(golden)
    solver = Solver(asm)
    solver.assemble()
    sol = solver.solve()
    _check(golden, mesh, asm, sol, tol=1e-8)


@pytest.mark.parametrize(
    "name",
    DOLFINX_NAMES
    or [
        pytest.param(
            "absent",
            marks=pytest.mark.skip(reason="tests/goldens_dolfinx/ not generated"),
        )
    ],
)
def test_dolfinx_golden_agrees_with_exact_oracle(name: str):
    """The two independent oracles (DOLFINx/MUMPS and exact Fractions)
    must agree with each other — on the shared configurations."""
    if name not in GOLDEN_NAMES:
        pytest.skip(f"no exact-Fraction golden for {name}")
    ref = _load_dolfinx(name)
    exact = _load(name)
    assert ref["edges"] == exact["edges"]
    np.testing.assert_allclose(
        np.asarray(ref["flux"]), np.asarray(exact["flux"]),
        atol=1e-8 * max(1.0, np.abs(np.asarray(exact["flux"])).max()), rtol=0,
    )
    np.testing.assert_allclose(
        np.asarray(ref["pressure"]), np.asarray(exact["pressure"]),
        atol=1e-8 * max(1.0, np.abs(np.asarray(exact["pressure"])).max()), rtol=0,
    )
