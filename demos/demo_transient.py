"""Transient-flow demo: time-varying inlet pressure on an arterial tree,
exported as a ParaView time series.

The reference writes timestamped frames through ADIOS2
(``demos/demo_Y_bifurcation.py`` via ``VTXWriter.write(t)``, reference
``post_processing.py:68-78``); here :class:`TimeSeriesWriter` produces
``.pvd`` collections referencing per-frame binary ``.vtu`` files.  The
fused Schur executor is built once and re-dispatched per step — the
serving pattern: only the boundary-pressure arrays change between frames.
"""

from pathlib import Path

import _bootstrap  # noqa: F401  (sys.path + platform setup)

import numpy as np

from networks_fenicsx_tpu import (  # noqa: E402
    HydraulicNetworkAssembler,
    NetworkMesh,
    Solver,
    network_generation,
)
from networks_fenicsx_tpu.io.vtk import read_pvd  # noqa: E402
from networks_fenicsx_tpu.post_processing import TimeSeriesWriter  # noqa: E402

outdir = Path(__file__).parent / "results_transient"
outdir.mkdir(exist_ok=True, parents=True)

G = network_generation.make_arterial_tree(N=4, direction=np.array([0.1, 1.0, 0.0]))
mesh = NetworkMesh(G, N=8, color_strategy="fast")
assembler = HydraulicNetworkAssembler(mesh)
R = 1.0 / mesh.edge_radius**4

solver = Solver(assembler)
writer = TimeSeriesWriter(outdir)

n_steps = 10
for step in range(n_steps):
    t = step / (n_steps - 1)
    amplitude = 1.0 + 0.5 * np.sin(2.0 * np.pi * t)  # pulsatile inlet

    def p_bc(x, amplitude=amplitude):
        return amplitude * x[1]

    assembler.compute_forms(p_bc_ex=p_bc, R=R)
    solver.assemble()
    sol = solver.solve()
    writer.write(sol, t)

assert writer.num_frames == n_steps
frames = read_pvd(outdir / "pressure.pvd")
assert len(frames) == n_steps
print(
    f"transient: wrote {writer.num_frames} frames to {outdir.name}/ "
    f"(pressure.pvd spans t={frames[0][0]:.2f}..{frames[-1][0]:.2f})"
)

# Factor-reuse variant of the same loop: R is fixed across frames, so the
# resistance-side elimination factors once and each step runs only the
# rhs half (the KSP/MUMPS factor-reuse pattern, reference solver.py:58-65).
from networks_fenicsx_tpu.solver import build_blocked_factorization  # noqa: E402

fac = build_blocked_factorization(assembler)
state = fac.factor(R)
for step in range(n_steps):
    t = step / (n_steps - 1)
    amplitude = 1.0 + 0.5 * np.sin(2.0 * np.pi * t)
    assembler.compute_forms(p_bc_ex=lambda x, a=amplitude: a * x[1], R=R)
    _, f_arg, sp_arg, ep_arg = assembler.schur_arguments(device=False)
    out = fac.solve(state, f_arg, sp_arg, ep_arg)
    x = fac.solution_vector(out)
    # cross-check one frame against the fused solver
    if step == n_steps // 2:
        solver.solve()
        ref = np.asarray(solver.solution_vector())
        assert np.abs(x - ref).max() <= 1e-11 * max(1.0, np.abs(ref).max())
print(f"factor-reuse: {n_steps} rhs-only solves against one factorization")
