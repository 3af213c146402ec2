"""Arterio-venous perfusion demo — the composite vascular flagship.

``make_vascular_bed`` joins the three structural families into one
physiological unit: a Murray's-law arterial tree perfuses a capillary
lattice that drains through a mirrored venous tree.  The reference's
generators are tree-only (reference ``network_generation.py:42,158``);
its MUMPS solver could consume such a composite, and here the
structure-adaptive peel-then-core elimination does the same on device —
the min-degree sparse core absorbs tree and lattice jointly, exact f64.

The demo solves one bed with Poiseuille resistances, cross-checks
against host LU, reports a perfusion-uniformity metric (the coefficient
of variation of per-terminal arteriole flux — the quantity physiologists
care about in capillary-bed models), and exports the flow field.
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

n_gen = int(os.environ.get("NXFX_BED_GENS", "4"))
nx_cells = int(os.environ.get("NXFX_BED_NX", "32"))
ny_cells = int(os.environ.get("NXFX_BED_NY", "20"))
G = network_generation.make_vascular_bed(n_gen, nx_cells, ny_cells, arrays=True)
network_mesh = NetworkMesh(G, N=2, color_strategy="fast")

assembler = HydraulicNetworkAssembler(network_mesh)
R = 1.0 / network_mesh.edge_radius**4  # Poiseuille resistance
assembler.compute_forms(p_bc_ex=lambda x: x[1], R=R)

solver = Solver(assembler)
solver.assemble()
sol = solver.solve()
global_flux = extract_global_flux(network_mesh, sol)

# cross-check the composite elimination against a host direct solve
ref_asm = HydraulicNetworkAssembler(network_mesh)
ref_asm.compute_forms(p_bc_ex=lambda x: x[1], R=R)
ref = Solver(ref_asm, options=SolverOptions(method="host_lu"))
ref.assemble()
ref.solve()
refv = np.asarray(ref.solution_vector())
err = float(
    np.max(np.abs(np.asarray(solver.solution_vector()) - refv))
    / max(1.0, float(np.abs(refv).max()))
)
assert err < 1e-10, err

# perfusion uniformity: flux through each terminal arteriole (the edges
# feeding the lattice top row from the tree).  A perfectly symmetric bed
# perfuses all terminals equally; asymmetry shows up as spread.
radius = np.asarray(network_mesh.edge_radius)
flux_cells = np.asarray(global_flux.values).reshape(network_mesh.num_cells, -1)
# cells are edge-major (N per edge): per-edge flux = mean over its cells
edge_flux = flux_cells.mean(axis=1).reshape(network_mesh.num_edges, -1).mean(axis=1)
edges_arr = np.asarray(network_mesh.edges)
# terminals structurally: source OUTSIDE the lattice, target in its top row
n_lattice = nx_cells * ny_cells
top_row_lo = (ny_cells - 1) * nx_cells
is_terminal = (
    (edges_arr[:, 0] >= n_lattice)
    & (edges_arr[:, 1] >= top_row_lo)
    & (edges_arr[:, 1] < n_lattice)
)
assert int(is_terminal.sum()) == 2**n_gen, int(is_terminal.sum())
q_term = np.abs(edge_flux[is_terminal])
cv = float(q_term.std() / q_term.mean())

outdir = Path(__file__).parent / "results_perfusion"
export_functions(sol, outpath=outdir)
write_vtu(
    outdir / "perfusion.vtu",
    network_mesh.vertices,
    network_mesh.cells,
    VTK_LINE,
    cell_data={
        "flux": flux_cells.mean(axis=1),
        "radius": radius[network_mesh.cell_edge],
    },
)

print(
    f"perfusion bed: {2**n_gen} terminals over a {nx_cells}x{ny_cells} "
    f"capillary lattice, {network_mesh.num_edges} vessels, "
    f"{assembler.num_dofs} dofs; method={solver.info.method}; "
    f"terminal-flux CV={cv:.3f}; err vs host LU {err:.2e}"
)
