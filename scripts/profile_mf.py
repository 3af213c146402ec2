"""On-chip probe of the tree-multifrontal core engine (round-5 design).

Times plan/compile/factor/apply of :mod:`ops.multifrontal` on a per-edge
conductance lattice core and checks accuracy vs SuperLU.

Usage: python scripts/profile_mf.py [n_lattice] [leaf] [reps]
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from networks_fenicsx_tpu.ops.multifrontal import (  # noqa: E402
    _mf_apply,
    _mf_factor,
    plan_multifrontal,
)
from networks_fenicsx_tpu.utils.platform import enable_compilation_cache  # noqa: E402


def _pull(out):
    leaf = jax.tree_util.tree_leaves(out)[-1]
    np.asarray(jnp.ravel(leaf)[:1])


def bench(name, fn, *args, reps=8):
    t0 = time.perf_counter()
    out = fn(*args)
    _pull(out)
    t_c = time.perf_counter() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(reps)]
        _pull(outs[-1])
        best = min(best, (time.perf_counter() - t0) / reps)
        del outs
    print(f"{name:12s} {best * 1e3:9.2f} ms  (first call {t_c:.1f}s)",
          flush=True)
    return out, best


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    leaf = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    enable_compilation_cache()
    jax.config.update("jax_enable_x64", True)
    print(f"backend: {jax.default_backend()}, lattice {n}x{n}, leaf {leaf}",
          flush=True)

    idx = np.arange(n * n).reshape(n, n)
    h = np.stack([idx[:, :-1].ravel(), idx[:, 1:].ravel()], axis=1)
    v = np.stack([idx[:-1, :].ravel(), idx[1:, :].ravel()], axis=1)
    pairs = np.concatenate([h, v], axis=0)
    P = pairs.shape[0]
    core_pairs = np.concatenate(
        [pairs, np.arange(P, dtype=np.int64)[:, None]], axis=1
    )
    n_core = n * n

    t0 = time.perf_counter()
    plan = plan_multifrontal(core_pairs, n_core, leaf=leaf)
    t_plan = time.perf_counter() - t0
    if plan is None:
        print("planner refused", flush=True)
        return
    print(f"plan: {t_plan:.1f}s, {plan.stats}", flush=True)

    rng = np.random.default_rng(0)
    w = rng.uniform(0.5, 3.0, P)
    dc_h = np.zeros(n_core)
    np.add.at(dc_h, pairs[:, 0], w)
    np.add.at(dc_h, pairs[:, 1], w)
    dc_h = dc_h * 1.001 + 0.05
    rc_h = rng.standard_normal(n_core)

    plan_dev = jax.device_put(plan)
    dc = jnp.asarray(dc_h)
    wp = jnp.asarray(w)
    rc = jnp.asarray(rc_h)

    state, t_f = bench("factor", jax.jit(_mf_factor), plan_dev, dc, wp,
                       reps=reps)
    lam, t_a = bench("apply", jax.jit(_mf_apply), plan_dev, state, rc,
                     reps=reps)
    fused = jax.jit(lambda p, d, w_, r: _mf_apply(p, _mf_factor(p, d, w_), r))
    lam2, t_fu = bench("fused", fused, plan_dev, dc, wp, rc, reps=reps)

    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    A = sp.csc_matrix(
        (np.concatenate([dc_h, -w, -w]),
         (np.concatenate([np.arange(n_core), pairs[:, 0], pairs[:, 1]]),
          np.concatenate([np.arange(n_core), pairs[:, 1], pairs[:, 0]]))),
        shape=(n_core, n_core),
    )
    t0 = time.perf_counter()
    ref = spla.splu(A).solve(rc_h)
    t_slu = time.perf_counter() - t0
    err = np.max(np.abs(np.asarray(lam2) - ref)) / np.max(np.abs(ref))
    print(f"SuperLU {t_slu * 1e3:.1f} ms; fused {t_fu * 1e3:.1f} ms "
          f"({t_slu / t_fu:.1f}x); rel err {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
