"""Shared mixed-precision dense SPD solve (Jacobi-scaled f32 Cholesky
plus f64 iterative refinement).

Float64 Cholesky is emulated (slow) on TPU, so every dense SPD tail in
the solver — the dense Schur path, the dense cycle core of the tree
elimination, and the dense remainder of the sparse core elimination —
factorises the Jacobi-scaled matrix in f32 on the MXU and recovers full
f64 accuracy with residual refinement (residual matvecs in the compute
dtype).  The scaled matrix has unit diagonal, so the f32 factorisation
is well behaved; the pivot gate is the MUMPS zero-pivot analog (a
boundary-free network component makes the Laplacian singular — its
pivots collapse or go NaN, and the solve returns NaN so callers fail
loudly, matching the reference's ``ksp_error_if_not_converged``,
reference ``solver.py:64``).

One implementation so the pivot threshold and refinement count cannot
drift between the three call sites.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["scaled_cholesky_factor", "scaled_cholesky_solve"]

# Relative pivot collapse threshold (the singularity gate).
_PIVOT_RTOL = 1e-7
# Refinement passes: each contracts the error by ~kappa * eps_f32, so
# three passes reach f64 roundoff for the conditioning these tails see.
_N_REFINE = 3


def scaled_cholesky_factor(Lc: jnp.ndarray) -> dict:
    """Factor an SPD matrix: Jacobi scaling + f32 Cholesky + pivot gate.

    Returns a device pytree ``{"Lc", "chol", "dscale", "ok"}`` consumed by
    :func:`scaled_cholesky_solve`; ``ok`` is False when the pivots signal
    a (numerically) singular matrix.
    """
    dscale = jnp.sqrt(jnp.diagonal(Lc))
    Ls = (Lc / dscale[:, None]) / dscale[None, :]
    chol = jnp.linalg.cholesky(Ls.astype(jnp.float32))
    piv = jnp.diagonal(chol).astype(Lc.dtype)
    ok = jnp.all(jnp.isfinite(piv)) & (jnp.min(piv) > _PIVOT_RTOL * jnp.max(piv))
    return {"Lc": Lc, "chol": chol, "dscale": dscale, "ok": ok}


def scaled_cholesky_solve(
    state: dict, rhs: jnp.ndarray, n_refine: int = _N_REFINE
) -> jnp.ndarray:
    """Solve against a :func:`scaled_cholesky_factor` state for one rhs.

    Returns the refined f64-accurate solution, or NaN everywhere when the
    factor's pivot gate tripped (singular system).
    """
    Lc, chol, dscale, ok = (
        state["Lc"], state["chol"], state["dscale"], state["ok"]
    )
    dt = rhs.dtype

    def solve_scaled(rv):
        y = jax.scipy.linalg.cho_solve((chol, True), (rv / dscale).astype(jnp.float32))
        return y.astype(dt) / dscale

    x = solve_scaled(rhs)
    for _ in range(n_refine):
        x = x + solve_scaled(rhs - Lc @ x)
    return jnp.where(ok, x, jnp.nan)
