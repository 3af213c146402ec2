"""Multi-device demo: edge-partitioned solve over all available devices,
end-to-end through post-processing and file export.

The analog of running the reference demos under ``mpiexec -np 3``
(reference ``demos/test_demos.py:15-17``): the same network solved with
the edge axis sharded over a ``jax.sharding.Mesh``.  On a uniformly-binary
tree with per-edge coefficients the solver auto-selects the blocked
sharded path (per-device slice/concat programs + one psum of the tiny
top-tree system); run with ``NXFX_CPU_DEVICES=8 NXFX_PLATFORM=cpu`` to
exercise 8 virtual devices on CPU.
"""

from pathlib import Path

import _bootstrap  # noqa: F401  (sys.path + platform setup)

import numpy as np

import jax  # noqa: E402

from networks_fenicsx_tpu import (  # noqa: E402
    HydraulicNetworkAssembler,
    NetworkMesh,
    Solver,
    network_generation,
)
from networks_fenicsx_tpu.parallel import ShardedNetworkSolver  # noqa: E402
from networks_fenicsx_tpu.post_processing import (  # noqa: E402
    export_functions,
    extract_global_flux,
)

outdir = Path(__file__).parent / "results_sharded"
outdir.mkdir(exist_ok=True, parents=True)

G = network_generation.make_tree(n=6, H=1.0, W=3.0)
mesh = NetworkMesh(G, N=5, color_strategy="fast")

assembler = HydraulicNetworkAssembler(mesh)
R = np.linspace(1.0, 2.0, mesh.num_edges)
assembler.compute_forms(p_bc_ex=lambda x: x[1], R=R)

devices = jax.devices()
solver = ShardedNetworkSolver(assembler, devices=devices)
solver.assemble()
sol = solver.solve()
print(
    f"sharded solve over {len(devices)} device(s): method={solver.info.method}, "
    f"{mesh.num_edges} edges, {assembler.num_dofs} dofs"
)

# cross-check against the serial solve
assembler_s = HydraulicNetworkAssembler(mesh)
assembler_s.compute_forms(p_bc_ex=lambda x: x[1], R=R)
serial = Solver(assembler_s)
serial.assemble()
sol_serial = serial.solve()
for a, b in zip(sol, sol_serial):
    err = np.max(np.abs(a.values - b.values))
    assert err < 1e-11, (a.name, err)
print("sharded == serial verified (1e-11)")

global_flux = extract_global_flux(mesh, sol)
export_functions(functions=sol, outpath=outdir, time=0.0)
print(f"exported solution blocks + pvd stamps to {outdir.name}/")
