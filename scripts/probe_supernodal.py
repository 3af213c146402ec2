"""On-chip probe of the supernodal core-elimination stage.

Mirrors bench.py's ``supernodal`` stage (per-edge-R lattice through the
ND + multifrontal path) plus the unstructured web: synchronized
assemble+solve, deep-pipelined re-dispatch, factor-reuse rhs-only
serving and the SuperLU baseline on the identical system.  Each family
emits its full stage record as one ``PROBE_JSON {...}`` line — bench.py
runs this script in a SUBPROCESS with a hard timeout (a cold-cache XLA
compile of the 320² program is minutes long and cannot be preempted
in-process; round 3 lost its whole record to an unbounded stage) and
parses that line into ``detail.supernodal``.

Usage: python scripts/probe_supernodal.py [lattice_n] [web_n]
"""

import json
import os
import sys
import time

import numpy as np

import jax

if os.environ.get("NXFX_PLATFORM", "").lower() == "cpu":
    # sitecustomize pins the axon TPU platform before env vars can act;
    # an explicit in-process override is the only way to force CPU here
    # (bench.py sets this for its degraded CPU-fallback record).
    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, ".")

from networks_fenicsx_tpu import NetworkMesh, HydraulicNetworkAssembler  # noqa: E402
from networks_fenicsx_tpu.network_generation import (  # noqa: E402
    make_grid,
    make_random_network,
)
from networks_fenicsx_tpu.solver import (  # noqa: E402
    SolverOptions,
    _cached_tree_plan,
    _flatten_blocks_host,
    build_schur_executor,
    build_tree_factorization,
)
from networks_fenicsx_tpu.utils.platform import enable_compilation_cache  # noqa: E402


def p_bc(x):
    return x[1]


def probe(label, mesh, asm, recompute, extras):
    opts = SolverOptions()
    t0 = time.perf_counter()
    # memoized on the assembler — the executor/factorization reuse it
    plan = _cached_tree_plan(asm, attach=True)
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
    print(f"{label}: warm (compile) {t_warm:.1f}s", flush=True)
    # synchronized assemble+solve (forms recomputed per rep — bench parity)
    times_s = []
    for _ in range(3):
        t0 = time.perf_counter()
        recompute()
        aa = asm.schur_arguments(device=prep is None)
        if prep is not None:
            aa = prep(*aa)
        o_s = ex(*aa)
        np.asarray(o_s[0][:1, :1])
        times_s.append(time.perf_counter() - t0)
    t_sync = min(times_s)
    depth = 16
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [ex(*args) for _ in range(depth)]
        np.asarray(outs[-1][0][:1, :1])
        best = min(best, (time.perf_counter() - t0) / depth)
    print(f"{label}: sync {t_sync * 1e3:.2f} ms, pipelined x{depth} "
          f"{best * 1e3:.2f} ms/solve", flush=True)

    # The record is emitted PROGRESSIVELY (bench.py takes the LAST
    # PROBE_JSON line): the parent kills this process at a hard timeout,
    # and a mid-measurement kill must not lose what already completed —
    # e.g. a cold-cache factor-reuse compile outlasting the budget.
    record = {
        **extras,
        "vessels": int(mesh.num_edges),
        "num_dofs": int(asm.num_dofs),
        "core_plan": stats,
        "assemble_solve_ms": round(t_sync * 1e3, 3),
        "pipelined_ms_per_solve": round(best * 1e3, 3),
        "superlu_ms_median": None,
        "vs_superlu": None,
        "max_rel_err_vs_superlu": None,
        "factor_reuse_ms_per_solve": None,
        "warm_compile_s": round(t_warm, 1),
        "plan_s": round(t_plan, 1),
    }
    print(f"PROBE_JSON {json.dumps(record)}", flush=True)

    # SuperLU baseline + accuracy on the identical system
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    vals = np.concatenate([np.asarray(asm._cell_mass).ravel(), asm._static_vals])
    A = sp.csc_matrix((vals, (asm._all_rows, asm._all_cols)),
                      shape=(asm.num_dofs,) * 2)
    b = np.asarray(asm._b_host)
    lu_times = []
    for _ in range(3):
        t0 = time.perf_counter()
        x_lu = spla.splu(A).solve(b)
        lu_times.append(time.perf_counter() - t0)
    t_lu = float(np.median(lu_times))
    x = _flatten_blocks_host(
        out[0], out[1], out[2], mesh.edge_color,
        edge_order=getattr(ex, "edge_order", None),
        bif_order=getattr(ex, "bif_order", None),
    )
    err = float(np.max(np.abs(x - x_lu)) / max(1.0, np.abs(x_lu).max()))
    print(f"{label}: SuperLU {t_lu * 1e3:.1f} ms; err {err:.2e}", flush=True)
    record.update(
        superlu_ms_median=round(t_lu * 1e3, 3),
        vs_superlu=round(t_lu / t_sync, 2),
        max_rel_err_vs_superlu=err,
    )
    if err >= 1e-8:
        record["error"] = f"accuracy mismatch vs SuperLU: {err:.3e}"
    print(f"PROBE_JSON {json.dumps(record)}", flush=True)

    # factor-reuse rhs-only (the MUMPS factor-once/re-solve contract)
    fr_ms = None
    try:
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
        fr_ms = bf * 1e3
        print(f"{label}: factor-reuse rhs-only {fr_ms:.2f} ms/solve",
              flush=True)
    except Exception as e:  # pragma: no cover - defensive
        print(f"{label}: factor-reuse skipped: {e!r}", flush=True)
    record["factor_reuse_ms_per_solve"] = (
        round(fr_ms, 3) if fr_ms is not None else None
    )
    print(f"PROBE_JSON {json.dumps(record)}", flush=True)


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
        probe(f"lattice{n_lat}", mesh, asm,
              lambda: asm.compute_forms(p_bc_ex=p_bc, R=R),
              {"lattice": [n_lat, n_lat]})
        del G, mesh, asm
    if n_web:
        G = make_random_network(n_web, keep=0.7, seed=42, arrays=True)
        mesh = NetworkMesh(G, N=2, color_strategy="fast")
        asm = HydraulicNetworkAssembler(mesh)
        R = np.random.default_rng(1).uniform(0.5, 3.0, mesh.num_edges)
        asm.compute_forms(p_bc_ex=p_bc, R=R)
        probe(f"web{n_web}", mesh, asm,
              lambda: asm.compute_forms(p_bc_ex=p_bc, R=R),
              {"junctions": n_web})


if __name__ == "__main__":
    main()
