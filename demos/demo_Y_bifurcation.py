"""Y-bifurcation demo (mirrors reference ``demos/demo_Y_bifurcation.py``):
a two-generation symmetric tree (one junction), pressure boundary condition
``p = y``, solve and export the global flux."""

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

outdir = Path(__file__).parent / "results_Y_bifurcation"
outdir.mkdir(exist_ok=True, parents=True)

# Create Y bifurcation graph
G = network_generation.make_tree(2, 1, 3)

network_mesh = NetworkMesh(G, N=4)

assembler = HydraulicNetworkAssembler(network_mesh)
assembler.compute_forms(p_bc_ex=lambda x: x[1])

solver = Solver(assembler)
solver.assemble()
sol = solver.solve()

global_flux = extract_global_flux(network_mesh, sol)

# Export results: global flux as per-cell data on the parent mesh
write_vtu(
    outdir / "global_flux.vtu",
    network_mesh.vertices,
    network_mesh.cells,
    VTK_LINE,
    cell_data={"global_flux": global_flux.values.reshape(network_mesh.num_cells, -1).mean(axis=1)},
)
export_functions(functions=sol, outpath=outdir)
print("Y-bifurcation: lambda =", sol[-1].values)
