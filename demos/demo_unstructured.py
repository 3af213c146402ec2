"""Unstructured capillary-web demo — the MUMPS-generality showcase.

A random Delaunay web (``make_random_network``) has irregular junction
degrees and cycles everywhere: no forest or lattice structure.  The
reference handles this class only because MUMPS is a general sparse
direct solver (reference ``solver.py:62``); here the sparse minimum-degree
cycle-core elimination (``ops/core_elim.py``) provides the same
generality on device — exact f64, host-planned structure.  The demo
solves one web, cross-checks against host LU, and exports the flow field.
"""

from pathlib import Path

import _bootstrap  # noqa: F401  (sys.path + platform setup)

import os  # noqa: E402

import numpy as np  # noqa: E402

from networks_fenicsx_tpu import (  # noqa: E402
    HydraulicNetworkAssembler,
    NetworkMesh,
    Solver,
    SolverOptions,
    network_generation,
)
from networks_fenicsx_tpu.io.vtk import VTK_LINE, write_vtu  # noqa: E402
from networks_fenicsx_tpu.post_processing import (  # noqa: E402
    export_functions,
    extract_global_flux,
)

n_sites = int(os.environ.get("NXFX_WEB_SITES", "900"))
G = network_generation.make_random_network(
    n_sites, keep=0.6, num_boundary=4, seed=12, arrays=True
)
network_mesh = NetworkMesh(G, N=2, color_strategy="fast")

assembler = HydraulicNetworkAssembler(network_mesh)
rng = np.random.default_rng(0)
R = rng.uniform(0.5, 3.0, network_mesh.num_edges)  # heterogeneous vessels
assembler.compute_forms(p_bc_ex=lambda x: x[0], R=R)

solver = Solver(assembler)
solver.assemble()
sol = solver.solve()
global_flux = extract_global_flux(network_mesh, sol)

# cross-check the sparse-core elimination against a host direct solve
ref_asm = HydraulicNetworkAssembler(network_mesh)
ref_asm.compute_forms(p_bc_ex=lambda x: x[0], R=R)
ref = Solver(ref_asm, options=SolverOptions(method="host_lu"))
ref.assemble()
ref.solve()
err = float(
    np.max(np.abs(np.asarray(solver.solution_vector()) - np.asarray(ref.solution_vector())))
    / max(1.0, float(np.abs(np.asarray(ref.solution_vector())).max()))
)
assert err < 1e-10, err

outdir = Path(__file__).parent / "results_unstructured"
export_functions(sol, outpath=outdir)
write_vtu(
    outdir / "global_flux.vtu",
    network_mesh.vertices,
    network_mesh.cells,
    VTK_LINE,
    cell_data={
        "global_flux": global_flux.values.reshape(network_mesh.num_cells, -1).mean(axis=1)
    },
)

from networks_fenicsx_tpu.solver import _plan_tree_elimination, attach_core_plan  # noqa: E402

plan = attach_core_plan(_plan_tree_elimination(assembler))
stats = plan.core_plan.stats if plan.core_plan is not None else None
print(
    f"unstructured web: {n_sites} sites, {network_mesh.num_edges} vessels, "
    f"{assembler.num_dofs} dofs; sparse core {stats}; "
    f"err vs host LU {err:.2e}"
)
