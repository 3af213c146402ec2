"""Generate committed golden solution files from the exact-rational solver.

Each golden pins the exact discrete solution of one reference demo
configuration (BASELINE.md's 1e-8 matching set: Y-bifurcation, double-Y,
tree N-sweep, arterial n=5/N=40) computed by ``scripts/exact_golden.py`` —
an implementation-independent Fraction-arithmetic solver sharing no code
with the production path.  ``tests/test_golden.py`` asserts every
production solver method reproduces these files.

Regenerate with real DOLFINx/MUMPS instead via
``scripts/make_goldens_dolfinx.py`` (requires the reference's container).

Usage: python scripts/make_goldens.py
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from exact_golden import exact_solve  # noqa: E402

OUTDIR = Path(__file__).resolve().parent.parent / "tests" / "goldens"


def p_bc_x(x):
    return x[0]


def p_bc_y(x):
    return x[1]


def build_graph(spec: dict):
    from networks_fenicsx_tpu import network_generation

    kind = spec["graph"]
    if kind == "tree":
        return network_generation.make_tree(spec["n"], spec["H"], spec["W"])
    if kind == "arterial":
        return network_generation.make_arterial_tree(
            N=spec["n"], direction=np.asarray(spec["direction"])
        )
    if kind == "grid":
        return network_generation.make_grid(spec["nx"], spec["ny"])
    if kind == "random":
        return network_generation.make_random_network(
            spec["n"],
            keep=spec["keep"],
            num_boundary=spec["num_boundary"],
            seed=spec["seed"],
        )
    raise ValueError(kind)


def edge_R(spec: dict, G):
    if spec.get("R") == "poiseuille":
        radius = np.array([G.edges[e]["radius"] for e in G.edges], dtype=np.float64)
        return 1.0 / radius**4
    if spec.get("R") == "seeded":
        # per-edge resistances in list(G.edges) order; the exact float64
        # values are embedded into the golden config so the consumer
        # never re-derives them (no RNG-drift risk)
        rng = np.random.default_rng(spec["seed"] + 1)
        return rng.uniform(0.5, 2.0, G.number_of_edges())
    return spec.get("R")


# The reference demo configurations (reference demos/demo_Y_bifurcation.py,
# demo_double_Y_bifurcation.py, demo_tree.py, demo_arterial_tree.py) plus
# two hardening variants: a nonzero source (within-edge flux variation) and
# Poiseuille R ~ 1/r^4 (wide-dynamic-range conductances).
CONFIGS: dict[str, dict] = {
    "y_bifurcation": dict(graph="tree", n=2, H=1.0, W=3.0, N=4, p_bc="y"),
    "double_y": dict(graph="tree", n=2, H=3.1, W=7.3, N=5, p_bc="x"),
    "tree_N2": dict(graph="tree", n=2, H=1.0, W=1.0, N=2, p_bc="y"),
    "tree_N16": dict(graph="tree", n=2, H=1.0, W=1.0, N=16, p_bc="y"),
    "tree_N256": dict(graph="tree", n=2, H=1.0, W=1.0, N=256, p_bc="y"),
    "tree4": dict(graph="tree", n=4, H=1.0, W=2.0, N=3, p_bc="y"),
    "y_source": dict(graph="tree", n=2, H=1.0, W=3.0, N=4, p_bc="y", f=2.5),
    "arterial": dict(
        graph="arterial", n=5, direction=[0.1, 1.0, 0.0], N=40, p_bc="y"
    ),
    "arterial_poiseuille": dict(
        graph="arterial",
        n=5,
        direction=[0.1, 1.0, 0.0],
        N=40,
        p_bc="y",
        R="poiseuille",
    ),
    # higher flux degree: pins the fixed-condensed-constant scalar/blocked
    # layouts (solver._condensed_scalar_constants) against exact arithmetic
    "tree3_k2": dict(
        graph="tree", n=3, H=1.0, W=2.0, N=3, p_bc="y", R=1.7, f=0.8,
        flux_degree=2,
    ),
    "y_k3": dict(
        graph="tree", n=2, H=1.0, W=3.0, N=4, p_bc="y", f=2.5, flux_degree=3
    ),
    # fully cyclic lattice (beyond the reference's generators): pins the
    # cycle-core elimination, the MG/Chebyshev CG paths AND the exact
    # separable-DCT direct solve against exact rational arithmetic
    "grid5x4": dict(graph="grid", nx=5, ny=4, N=2, p_bc="x", R=2.0, f=0.3),
    # unstructured Delaunay web (beyond the reference's generators):
    # irregular junction degrees + cycles everywhere — pins the
    # peel-then-core elimination AND (via test_golden's forced
    # dense_cutoff variant) the sparse min-degree core numeric phase
    # (ops/core_elim.py) against exact rational arithmetic
    "web48": dict(
        graph="random", n=48, keep=0.6, num_boundary=3, seed=5, N=2,
        p_bc="x", R="seeded", f=0.3,
    ),
}

P_BC = {"x": p_bc_x, "y": p_bc_y}


def main() -> None:
    OUTDIR.mkdir(parents=True, exist_ok=True)
    for name, spec in CONFIGS.items():
        G = build_graph(spec)
        R_val = edge_R(spec, G)
        res = exact_solve(
            G,
            spec["N"],
            P_BC[spec["p_bc"]],
            R=R_val,
            f=spec.get("f"),
            flux_degree=spec.get("flux_degree", 1),
        )
        cfg = {k: v for k, v in spec.items()}
        if spec.get("R") == "seeded":
            # embed the exact float64 values, in the same order as the
            # golden's "edges" list (list(G.edges) order)
            cfg["R"] = np.asarray(R_val).tolist()
        payload = {
            "config": cfg,
            "edges": res["edges"],
            "N": res["N"],
            "flux": res["flux"].tolist(),
            "pressure": res["pressure"].tolist(),
            "lam": {str(k): v for k, v in res["lam"].items()},
            "generator": "scripts/exact_golden.py (exact Fraction arithmetic)",
        }
        out = OUTDIR / f"{name}.json"
        out.write_text(json.dumps(payload))
        print(f"{name}: {len(res['edges'])} edges, N={res['N']}, "
              f"{len(res['lam'])} multipliers -> {out}")


if __name__ == "__main__":
    main()
