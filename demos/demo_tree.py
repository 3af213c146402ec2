"""Mesh-refinement sweep on a 2-generation tree (mirrors reference
``demos/demo_tree.py``): N doubles each iteration; min/max/mean of the
global flux are tracked and plotted against the cell size."""

from pathlib import Path

import _bootstrap  # noqa: F401  (sys.path + platform setup)

import numpy as np  # noqa: E402

from networks_fenicsx_tpu import (  # noqa: E402
    HydraulicNetworkAssembler,
    NetworkMesh,
    Solver,
    network_generation,
)
from networks_fenicsx_tpu.post_processing import export_functions, extract_global_flux  # noqa: E402

outdir = Path(__file__).parent / "results_tree"
outdir.mkdir(exist_ok=True, parents=True)


def p_bc(x):
    return x[1]


min_q, max_q, mean_q = [], [], []

G = network_generation.make_tree(n=2, H=1, W=1)

N = 1
lcars: list[float] = []
n_iters = 10
for i in range(n_iters):
    N *= 2
    lcars.append(1.0 / N)

    network_mesh = NetworkMesh(G, N=N)
    assembler = HydraulicNetworkAssembler(network_mesh)
    assembler.compute_forms(p_bc_ex=p_bc)

    solver = Solver(assembler, kind="mpi")
    solver.assemble()
    sol = solver.solve()

    global_flux = extract_global_flux(network_mesh, sol)
    export_functions(sol, outpath=outdir / f"N_{N:d}")

    vals = np.asarray(global_flux.values)
    # cell-average of the DG flux for the mean (∫ q dx / ∫ dx)
    cellwise = vals.reshape(network_mesh.num_cells, -1).mean(axis=1)
    h = network_mesh.cell_h
    min_q.append(vals.min())
    max_q.append(vals.max())
    mean_q.append(float(np.sum(cellwise * h) / np.sum(h)))

print("lcar      min_q      max_q      mean_q")
for lc, mn, mx, me in zip(lcars, min_q, max_q, mean_q):
    print(f"{lc:8.5f} {mn:10.6f} {mx:10.6f} {me:10.6f}")

try:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(6.0, 4.0))
    for series, label in ((mean_q, "mean"), (max_q, "max"), (min_q, "min")):
        ax.semilogx(lcars, series, marker=".", linewidth=1.2, label=f"{label} global flux")
    ax.set_xlabel("characteristic element length")
    ax.set_ylabel("global flux")
    ax.set_title("flux statistics under mesh refinement (2-gen tree)")
    ax.legend(frameon=False)
    ax.grid(alpha=0.4)
    fig.tight_layout()
    fig.savefig(outdir / "convergence_flux_tree.png", dpi=150)
except ImportError:
    pass
