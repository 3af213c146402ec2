"""Tests for the strip-sharded lattice executor (parallel/grid_sharded.py).

Pins that `ShardedNetworkSolver` auto-selects the grid executor on
uniform lattices, that its psum-assembled + replicated-DCT solve matches
the host direct solve at 1e-11 across device counts, coefficient modes,
flux degrees and ragged strip partitions (ny < D), and that non-lattice /
non-scalar-R inputs fall back to the general sharded pipeline.

The multi-device analog of the reference's ``mpiexec`` sweeps
(reference ``.github/workflows/test_package.yml:33-45``); ghost updates
≙ the two strip-window psums (reference ``assembly.py:363-367``).
"""

import numpy as np
import pytest

import jax

from networks_fenicsx_tpu import (
    HydraulicNetworkAssembler,
    NetworkMesh,
    Solver,
    SolverOptions,
    network_generation,
)
from networks_fenicsx_tpu.parallel import ShardedNetworkSolver


def _ref(asm):
    s = Solver(asm, options=SolverOptions(method="host_lu"))
    s.solve()
    return np.asarray(s.solution_vector())


@pytest.mark.parametrize(
    "dims,N,fd,fkind,nd",
    [
        ((6, 5), 2, 1, "scalar", 8),
        ((9, 16), 1, 1, "edge", 8),
        ((5, 7), 3, 2, "cell", 4),
        ((4, 9), 2, 1, "zero", 2),
        ((7, 3), 1, 1, "edge", 8),  # ny < D: ragged strips, inert devices
        ((5, 5), 2, 3, "scalar", 4),
    ],
)
def test_sharded_grid_matches_host_lu(dims, N, fd, fkind, nd):
    nx_, ny_ = dims
    rng = np.random.default_rng(nx_ * 31 + ny_)
    G = network_generation.make_grid(nx_, ny_, arrays=True)
    mesh = NetworkMesh(G, N=N)
    E, C = mesh.num_edges, mesh.num_edges * N
    f = {
        "zero": None,
        "scalar": 0.7,
        "edge": rng.uniform(0.5, 1.5, E),
        "cell": rng.uniform(-1.0, 1.0, C),
    }[fkind]
    asm = HydraulicNetworkAssembler(mesh, flux_degree=fd)
    kw = {} if f is None else {"f": f}
    asm.compute_forms(p_bc_ex=lambda x: x[0] + 0.2 * x[1], R=1.8, **kw)
    ss = ShardedNetworkSolver(asm, devices=jax.devices()[:nd])
    ss.assemble()
    sol = ss.solve()
    assert ss.info.method == "schur_sharded_grid"
    ref = _ref(asm)
    got = np.concatenate([fn.values for fn in sol])
    scale = max(1.0, np.abs(ref).max())
    np.testing.assert_allclose(got, ref, atol=1e-11 * scale)


def test_sharded_grid_matches_serial_grid_executor():
    """Sharded == serial grid executor bit-for-bit-ish (same DCT solve)."""
    G = network_generation.make_grid(8, 6, arrays=True)
    mesh = NetworkMesh(G, N=2)
    asm = HydraulicNetworkAssembler(mesh)
    asm.compute_forms(p_bc_ex=lambda x: x[0], f=0.3, R=2.0)
    s = Solver(asm, options=SolverOptions(method="schur", schur_method="dct"))
    s.solve()
    serial = np.asarray(s.solution_vector())
    ss = ShardedNetworkSolver(asm, devices=jax.devices()[:4])
    ss.assemble()
    sol = ss.solve()
    assert ss.info.method == "schur_sharded_grid"
    got = np.concatenate([fn.values for fn in sol])
    np.testing.assert_allclose(got, serial, atol=1e-12 * max(1.0, np.abs(serial).max()))


def test_sharded_grid_fallback_outside_envelope():
    """Per-edge R disqualifies the DCT plan: the sharded solver falls back
    to the general pipeline and still matches host LU."""
    rng = np.random.default_rng(11)
    G = network_generation.make_grid(6, 5, arrays=True)
    mesh = NetworkMesh(G, N=2)
    asm = HydraulicNetworkAssembler(mesh)
    asm.compute_forms(
        p_bc_ex=lambda x: x[0], R=rng.uniform(0.5, 2.0, mesh.num_edges)
    )
    ss = ShardedNetworkSolver(asm, devices=jax.devices()[:4])
    ss.assemble()
    sol = ss.solve()
    assert ss.info.method != "schur_sharded_grid"
    ref = _ref(asm)
    got = np.concatenate([fn.values for fn in sol])
    np.testing.assert_allclose(got, ref, atol=1e-8 * max(1.0, np.abs(ref).max()))


def test_sharded_grid_surfaces_lambda_residual():
    """The sharded grid executor surfaces the λ-system residual through
    SolveInfo (observability of the reduced-precision FFT fallback on
    very wide grids) instead of hardcoding 0.0."""
    G = network_generation.make_grid(6, 5, arrays=True)
    mesh = NetworkMesh(G, N=1)
    asm = HydraulicNetworkAssembler(mesh)
    asm.compute_forms(p_bc_ex=lambda x: x[0] + 0.3 * x[1], f=0.2, R=1.5)
    ss = ShardedNetworkSolver(asm, devices=jax.devices()[:4])
    ss.assemble()
    ss.solve()
    assert ss.info.method == "schur_sharded_grid"
    # exact direct solve: tiny but real floating-point residual
    assert 0.0 < ss.info.residual < 1e-10


@pytest.mark.parametrize("mesh_shape", [(2, 4), (4, 2), (8, 1)])
def test_sharded_grid_scenario_sweep(mesh_shape):
    """(S × edges) lattice scenario sweep over a 2-D device mesh through
    the exact DCT solve: scenario axis data-parallel, strips local —
    matches per-scenario serial solves at 1e-10 (closes the one sharding
    asymmetry: sharded_sweep previously took per-edge R only, which
    disqualifies the DCT and forced lattice sweeps onto one chip)."""
    from networks_fenicsx_tpu.parallel.sweep import sharded_sweep

    G = network_generation.make_grid(7, 6, arrays=True)
    mesh = NetworkMesh(G, N=2)
    asm = HydraulicNetworkAssembler(mesh)
    asm.compute_forms(p_bc_ex=lambda x: x[0] + 0.1 * x[1], f=0.3, R=2.0)
    scales = np.array([2.0, 0.7, 1.3, 3.1, 0.5])
    res = sharded_sweep(
        asm, scales, devices=jax.devices()[: mesh_shape[0] * mesh_shape[1]],
        mesh_shape=mesh_shape,
    )
    X = np.asarray(res.x)
    assert X.shape[0] == scales.size
    for i, c in enumerate(scales):
        asm_i = HydraulicNetworkAssembler(mesh)
        asm_i.compute_forms(p_bc_ex=lambda x: x[0] + 0.1 * x[1], f=0.3, R=float(c))
        s_i = Solver(asm_i, options=SolverOptions(method="host_lu"))
        s_i.solve()
        ref = np.asarray(s_i.solution_vector())
        err = np.max(np.abs(X[i] - ref)) / max(1.0, np.abs(ref).max())
        assert err < 1e-10, f"scenario {i}: {err}"


def test_sharded_sweep_scalar_requires_lattice():
    """Scalar-R sharded sweeps outside the lattice envelope fail loudly."""
    from networks_fenicsx_tpu.parallel.sweep import sharded_sweep

    G = network_generation.make_tree(4, 1.0, 2.0)
    mesh = NetworkMesh(G, N=1)
    asm = HydraulicNetworkAssembler(mesh)
    asm.compute_forms(p_bc_ex=lambda x: x[1], R=1.0)
    with pytest.raises(ValueError, match="uniform rectangular"):
        sharded_sweep(asm, np.array([1.0, 2.0]), devices=jax.devices()[:2])


def test_sharded_grid_sweep_rejects_scenario_matrix():
    """A (S, E) per-edge scenario matrix passed to a scalar-R lattice
    sweep must fail loudly — reshape(-1) previously turned it into S*E
    independent scalar scenarios silently."""
    from networks_fenicsx_tpu.parallel.sweep import sharded_sweep

    G = network_generation.make_grid(5, 4, arrays=True)
    mesh = NetworkMesh(G, N=1)
    asm = HydraulicNetworkAssembler(mesh)
    asm.compute_forms(p_bc_ex=lambda x: x[0], R=2.0)  # scalar mode
    bad = np.ones((3, mesh.num_edges))
    with pytest.raises(ValueError, match="1-D array of SCALAR"):
        sharded_sweep(asm, bad, devices=jax.devices()[:2])
