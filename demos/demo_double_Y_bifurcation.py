"""Double-Y bifurcation demo (mirrors reference
``demos/demo_double_Y_bifurcation.py``): a wider two-generation tree with
``p = x`` boundary data."""

from pathlib import Path

import _bootstrap  # noqa: F401  (sys.path + platform setup)

from networks_fenicsx_tpu import (  # noqa: E402
    HydraulicNetworkAssembler,
    NetworkMesh,
    Solver,
    network_generation,
)
from networks_fenicsx_tpu.io.vtk import VTK_LINE, write_vtu  # noqa: E402
from networks_fenicsx_tpu.post_processing import export_functions, extract_global_flux  # noqa: E402

G = network_generation.make_tree(2, 3.1, 7.3)
network_mesh = NetworkMesh(G, N=5)

assembler = HydraulicNetworkAssembler(network_mesh)
assembler.compute_forms(p_bc_ex=lambda x: x[0])

solver = Solver(assembler)
solver.assemble()
sol = solver.solve()

outdir = Path(__file__).parent / "results_double_Y_bifurcation"
global_flux = extract_global_flux(network_mesh, sol)
export_functions(sol, outpath=outdir)
write_vtu(
    outdir / "global_flux.vtu",
    network_mesh.vertices,
    network_mesh.cells,
    VTK_LINE,
    cell_data={"global_flux": global_flux.values.reshape(network_mesh.num_cells, -1).mean(axis=1)},
)
print("double-Y: lambda =", sol[-1].values)
