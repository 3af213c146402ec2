"""Arterial tree demo (mirrors reference ``demos/demo_arterial_tree.py``):
a 5-generation Murray's-law tree, 40 elements per vessel, largest-first
coloring, nested (per-block) matrix kind.  As an extension over the
reference the per-edge radii drive a Poiseuille resistance R ∝ 1/r⁴."""

from pathlib import Path

import _bootstrap  # noqa: F401  (sys.path + platform setup)

import numpy as np  # noqa: E402

from networks_fenicsx_tpu import (  # noqa: E402
    HydraulicNetworkAssembler,
    NetworkMesh,
    Solver,
)
from networks_fenicsx_tpu.io.vtk import VTK_LINE, write_vtu  # noqa: E402
from networks_fenicsx_tpu.network_generation import make_arterial_tree  # noqa: E402
from networks_fenicsx_tpu.post_processing import export_functions, extract_global_flux  # noqa: E402


def p_bc_expr(x):
    return x[1]


n = 5
G = make_arterial_tree(N=n, direction=np.array([0.1, 1, 0]))

network_mesh = NetworkMesh(G, N=40, color_strategy="largest_first")
assembler = HydraulicNetworkAssembler(network_mesh, flux_degree=1, pressure_degree=0)
assembler.compute_forms(p_bc_ex=p_bc_expr)

solver = Solver(assembler, kind="nest")
solver.assemble()
sol = solver.solve()
global_flux = extract_global_flux(network_mesh, sol)

outdir = Path(__file__).parent / "results_arterial_tree"
outdir.mkdir(exist_ok=True)

write_vtu(
    outdir / f"n{n}" / "global_flux.vtu",
    network_mesh.vertices,
    network_mesh.cells,
    VTK_LINE,
    cell_data={"global_flux": global_flux.values.reshape(network_mesh.num_cells, -1).mean(axis=1)},
)
export_functions(functions=sol, outpath=outdir / f"n{n}")
print(
    f"arterial tree n={n}: {network_mesh.num_edges} vessels, "
    f"{assembler.num_dofs} dofs, |lambda| range "
    f"[{abs(sol[-1].values).min():.4f}, {abs(sol[-1].values).max():.4f}]"
)
