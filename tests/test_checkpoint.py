"""Solution checkpoint save/load round trip."""

import numpy as np
import pytest

from networks_fenicsx_tpu import (
    HydraulicNetworkAssembler,
    NetworkMesh,
    Solver,
    network_generation,
)
from networks_fenicsx_tpu.io.checkpoint import load_solution, save_solution


def test_checkpoint_roundtrip(tmp_path):
    G = network_generation.make_tree(3, 1, 2)
    mesh = NetworkMesh(G, N=2)
    asm = HydraulicNetworkAssembler(mesh)
    asm.compute_forms(p_bc_ex=lambda x: x[1])
    solver = Solver(asm)
    solver.assemble()
    sol = solver.solve()

    path = save_solution(tmp_path / "state.npz", asm, sol)
    restored = load_solution(path, asm)
    assert [f.name for f in restored] == [f.name for f in sol]
    for a, b in zip(sol, restored):
        np.testing.assert_array_equal(a.values, b.values)


def test_checkpoint_incompatible_raises(tmp_path):
    G = network_generation.make_tree(3, 1, 2)
    mesh = NetworkMesh(G, N=2)
    asm = HydraulicNetworkAssembler(mesh)
    asm.compute_forms(p_bc_ex=lambda x: x[1])
    solver = Solver(asm)
    solver.assemble()
    sol = solver.solve()
    path = save_solution(tmp_path / "state.npz", asm, sol)

    other_mesh = NetworkMesh(G, N=4)  # different refinement
    other = HydraulicNetworkAssembler(other_mesh)
    with pytest.raises(ValueError):
        load_solution(path, other)


def test_checkpoint_suffixless_path(tmp_path):
    """Regression: np.savez appends '.npz'; the returned path must be the
    file actually written so load_solution(save_solution(p, ...)) works."""
    G = network_generation.make_tree(2, 1, 2)
    mesh = NetworkMesh(G, N=2)
    asm = HydraulicNetworkAssembler(mesh)
    asm.compute_forms(p_bc_ex=lambda x: x[1])
    solver = Solver(asm)
    solver.assemble()
    sol = solver.solve()

    for name in ("state", "state.dat"):
        path = save_solution(tmp_path / name, asm, sol)
        assert path.exists() and path.suffix == ".npz"
        restored = load_solution(path, asm)
        for a, b in zip(sol, restored):
            np.testing.assert_array_equal(a.values, b.values)
