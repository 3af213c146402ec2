"""Lattice (capillary-mesh) network demo — a fully cyclic topology beyond
the reference's tree generators: flow enters one corner of an n×n grid and
drains from the opposite corner; the cycle-core direct solver handles the
loops exactly."""

from pathlib import Path

import _bootstrap  # noqa: F401  (sys.path + platform setup)

import numpy as np  # noqa: E402

from networks_fenicsx_tpu import (  # noqa: E402
    HydraulicNetworkAssembler,
    NetworkMesh,
    Solver,
    network_generation,
)
from networks_fenicsx_tpu.io.vtk import VTK_LINE, write_vtu  # noqa: E402
from networks_fenicsx_tpu.post_processing import export_functions, extract_global_flux  # noqa: E402

import os  # noqa: E402

n = int(os.environ.get("NXFX_GRID_N", "8"))
G = network_generation.make_grid(n, n, arrays=True)
network_mesh = NetworkMesh(G, N=3, color_strategy="fast")

assembler = HydraulicNetworkAssembler(network_mesh)
assembler.compute_forms(p_bc_ex=lambda x: x[0])

solver = Solver(assembler)
solver.assemble()
sol = solver.solve()
global_flux = extract_global_flux(network_mesh, sol)

outdir = Path(__file__).parent / "results_grid"
export_functions(sol, outpath=outdir)
write_vtu(
    outdir / "global_flux.vtu",
    network_mesh.vertices,
    network_mesh.cells,
    VTK_LINE,
    cell_data={"global_flux": global_flux.values.reshape(network_mesh.num_cells, -1).mean(axis=1)},
)

from networks_fenicsx_tpu.solver import _plan_tree_elimination  # noqa: E402

plan = _plan_tree_elimination(assembler)
print(
    f"grid {n}x{n}: {network_mesh.num_edges} vessels, "
    f"{len(network_mesh.bifurcation_values)} junctions "
    f"(cycle core: {plan.core_size}), method={solver.info.method}, "
    f"converged={solver.info.converged}"
)

# The exact separable-DCT direct solve (uniform lattice + scalar R) over
# the gather-free grid edge layout — auto-engaged above the dense
# threshold, forced here so the small demo exercises it too.
from networks_fenicsx_tpu import SolverOptions  # noqa: E402
from networks_fenicsx_tpu.solver import _GridPlan  # noqa: E402

solver_dct = Solver(
    assembler, options=SolverOptions(method="schur", schur_method="dct")
)
sol_dct = solver_dct.solve()
engaged = isinstance(
    getattr(solver_dct._executor, "blocked_plan", None), _GridPlan
)
err = max(
    float(np.max(np.abs(a.values - b.values))) for a, b in zip(sol, sol_dct)
)
print(
    f"exact DCT direct solve: grid layout engaged={engaged}, "
    f"max |Δ| vs cycle-core solve = {err:.2e}"
)
assert engaged and err < 1e-9
