"""Post-processing: global flux extraction and VTU export."""

import numpy as np

from networks_fenicsx_tpu import (
    HydraulicNetworkAssembler,
    NetworkMesh,
    Solver,
    network_generation,
)
from networks_fenicsx_tpu.post_processing import (
    export_functions,
    export_submeshes,
    extract_global_flux,
)


def _solve_y(N=4):
    G = network_generation.make_tree(2, 1, 3)
    mesh = NetworkMesh(G, N=N)
    asm = HydraulicNetworkAssembler(mesh)
    asm.compute_forms(p_bc_ex=lambda x: x[1])
    solver = Solver(asm)
    solver.assemble()
    return mesh, solver.solve()


def test_extract_global_flux():
    mesh, sol = _solve_y()
    gq = extract_global_flux(mesh, sol)
    assert gq.name == "Global_Flux"
    vals = gq.values.reshape(mesh.num_cells, -1)
    # Y-bifurcation analytic: root edge flux 2/(s+1), branches 1/(s+1)
    s = np.sqrt(2.5)
    expected_edge = np.where(mesh.cell_edge == 0, 2.0 / (s + 1), 1.0 / (s + 1))
    np.testing.assert_allclose(
        vals, np.broadcast_to(expected_edge[:, None], vals.shape), atol=1e-9
    )


def test_export_functions(tmp_path):
    mesh, sol = _solve_y()
    export_functions(sol, outpath=tmp_path)
    M = mesh.num_edge_colors
    for i in range(M):
        assert (tmp_path / f"flux_{i}.vtu").exists()
    assert (tmp_path / "pressure.vtu").exists()
    assert (tmp_path / "lm.vtu").exists()
    text = (tmp_path / "pressure.vtu").read_text()
    assert "UnstructuredGrid" in text and "pressure" in text


def test_export_submeshes(tmp_path):
    mesh, _ = _solve_y()
    export_submeshes(mesh, tmp_path)  # xdmf (reference parity)
    for i in range(mesh.num_edge_colors):
        f = tmp_path / f"submesh_{i}.xdmf"
        assert f.exists()
        text = f.read_text()
        assert "Polyline" in text and "vertex_markers" in text
    export_submeshes(mesh, tmp_path, format="vtu")
    for i in range(mesh.num_edge_colors):
        assert (tmp_path / f"submesh_{i}.vtu").exists()


def test_global_flux_continuous_at_junction_balance():
    """Global flux values at a junction satisfy conservation when summed with
    in/out signs."""
    mesh, sol = _solve_y(N=2)
    gq = extract_global_flux(mesh, sol)
    vals = gq.values.reshape(mesh.num_cells, -1)
    N = mesh.N
    for b_idx, node in enumerate(mesh.bifurcation_values):
        qin = sum(vals[int(e) * N + (N - 1), -1] for e in mesh.in_edge_ids(b_idx))
        qout = sum(vals[int(e) * N, 0] for e in mesh.out_edge_ids(b_idx))
        assert abs(qin - qout) < 1e-9


def test_export_functions_high_degree_pressure(tmp_path):
    """Regression: continuous pressure of degree >= 2 has cell-interior dofs;
    the VTU must pair every written point with a value (VTK rejects
    NumberOfPoints > len(PointData))."""
    G = network_generation.make_tree(2, 1, 3)
    mesh = NetworkMesh(G, N=2)
    asm = HydraulicNetworkAssembler(mesh, flux_degree=2, pressure_degree=2)
    asm.compute_forms(p_bc_ex=lambda x: x[1])
    solver = Solver(asm)
    solver.assemble()
    sol = solver.solve()
    export_functions(sol, outpath=tmp_path)
    import re

    text = (tmp_path / "pressure.vtu").read_text()
    n_points = int(re.search(r'NumberOfPoints="(\d+)"', text).group(1))
    assert n_points == mesh.num_vertices
