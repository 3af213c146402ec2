"""On-chip probe of the supernodal core-elimination stage.

Mirrors bench.py's ``supernodal`` stage (per-edge-R lattice through the
ND + multifrontal path) plus the unstructured web, reporting device-side
pipelined ms/solve and factor-reuse rhs-only ms/solve.  Used to measure
the update-stream reformulation of the sparse core numeric phase
(``ops/core_elim.py``) against the materialized-slot-array formulation.

Usage: python scripts/probe_supernodal.py [lattice_n] [web_n]
"""

import sys
import time

import numpy as np

import jax

sys.path.insert(0, ".")

from networks_fenicsx_tpu import NetworkMesh, HydraulicNetworkAssembler  # noqa: E402
from networks_fenicsx_tpu.network_generation import (  # noqa: E402
    make_grid,
    make_random_network,
)
from networks_fenicsx_tpu.solver import (  # noqa: E402
    SolverOptions,
    _plan_tree_elimination,
    attach_core_plan,
    build_schur_executor,
    build_tree_factorization,
)
from networks_fenicsx_tpu.utils.platform import enable_compilation_cache  # noqa: E402


def p_bc(x):
    return x[1]


def probe(label, mesh, asm):
    opts = SolverOptions()
    t0 = time.perf_counter()
    plan = attach_core_plan(_plan_tree_elimination(asm))
    t_plan = time.perf_counter() - t0
    stats = plan.core_plan.stats if plan.core_plan else None
    print(f"{label}: {mesh.num_edges} vessels, {asm.num_dofs} dofs, "
          f"plan {stats} ({t_plan:.1f}s plan)", flush=True)
    ex = build_schur_executor(asm, opts, outputs="blocks", internal_layout=True)
    prep = getattr(ex, "prepare_args", None)
    a = asm.schur_arguments(device=prep is None)
    if prep is not None:
        a = prep(*a)
    args = jax.device_put(a)
    jax.block_until_ready(args)
    t0 = time.perf_counter()
    out = ex(*args)
    np.asarray(out[0][:1, :1])
    t_warm = time.perf_counter() - t0
    depth = 16
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [ex(*args) for _ in range(depth)]
        np.asarray(outs[-1][0][:1, :1])
        best = min(best, (time.perf_counter() - t0) / depth)
    print(f"{label}: warm {t_warm:.1f}s, pipelined x{depth} "
          f"{best * 1e3:.2f} ms/solve", flush=True)
    # factor-reuse rhs-only
    fac = build_tree_factorization(asm, opts)
    Ra, fa, sa, ea = asm.schur_arguments(device=False)
    st = jax.block_until_ready(fac.factor(Ra))
    rhs = jax.device_put(fac.prepare_rhs(fa, sa, ea))
    of = fac.solve_prepared(st, rhs)
    np.asarray(of[0][:1, :1])
    bf = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        ofs = [fac.solve_prepared(st, rhs) for _ in range(depth)]
        np.asarray(ofs[-1][0][:1, :1])
        bf = min(bf, (time.perf_counter() - t0) / depth)
    print(f"{label}: factor-reuse rhs-only {bf * 1e3:.2f} ms/solve", flush=True)
    # accuracy vs SuperLU
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    vals = np.concatenate([np.asarray(asm._cell_mass).ravel(), asm._static_vals])
    A = sp.csc_matrix((vals, (asm._all_rows, asm._all_cols)),
                      shape=(asm.num_dofs,) * 2)
    x_lu = spla.splu(A).solve(np.asarray(asm._b_host))
    from networks_fenicsx_tpu.solver import _flatten_blocks_host

    x = _flatten_blocks_host(
        out[0], out[1], out[2], mesh.edge_color,
        edge_order=getattr(ex, "edge_order", None),
        bif_order=getattr(ex, "bif_order", None),
    )
    err = float(np.max(np.abs(x - x_lu)) / max(1.0, np.abs(x_lu).max()))
    print(f"{label}: err vs SuperLU {err:.2e}", flush=True)


def main():
    enable_compilation_cache()
    n_lat = int(sys.argv[1]) if len(sys.argv) > 1 else 320
    n_web = int(sys.argv[2]) if len(sys.argv) > 2 else 10000
    print("devices:", jax.devices(), flush=True)
    if n_lat:
        G = make_grid(n_lat, n_lat, arrays=True)
        mesh = NetworkMesh(G, N=1, color_strategy="fast")
        asm = HydraulicNetworkAssembler(mesh)
        R = np.random.default_rng(n_lat).uniform(0.5, 2.0, mesh.num_edges)
        asm.compute_forms(p_bc_ex=p_bc, R=R)
        probe(f"lattice{n_lat}", mesh, asm)
        del G, mesh, asm
    if n_web:
        G = make_random_network(n_web, keep=0.7, seed=42, arrays=True)
        mesh = NetworkMesh(G, N=2, color_strategy="fast")
        asm = HydraulicNetworkAssembler(mesh)
        R = np.random.default_rng(1).uniform(0.5, 3.0, mesh.num_edges)
        asm.compute_forms(p_bc_ex=p_bc, R=R)
        probe(f"web{n_web}", mesh, asm)


if __name__ == "__main__":
    main()
