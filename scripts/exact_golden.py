"""Implementation-independent exact-rational reference solver.

Solves the dual-mixed hydraulic network system (P1 flux / DG0 pressure /
bifurcation multipliers — the reference discretisation of
``/root/reference/src/networks_fenicsx/assembly.py:99-101,178-184``) in
EXACT rational arithmetic (``fractions.Fraction``), assembling the discrete
saddle-point system directly from the graph with its own derivation of the
interval element matrices and solving it with a generic sparse
Markowitz-pivot Gaussian elimination.

Shares NO code with ``networks_fenicsx_tpu``'s assembly/solver path (it
does not import the package at all): graph geometry, incidence, element
matrices, boundary terms and the linear solve are all re-derived here, so
agreement with the production solvers is evidence independent of the
production implementation — the oracle role MUMPS/DOLFINx plays in
``scripts/make_goldens_dolfinx.py`` when the reference container is
available.

Unknown layout (canonical, per graph edge ``e`` in input order):
    q[e, 0..N]   P1 flux node values along the edge (source -> target)
    p[e, 0..N-1] DG0 cell pressures along the edge
    lam[b]       one multiplier per bifurcation (graph node with degree > 1)

Sign conventions follow the reference forms (validated against the
analytic Y-bifurcation solution lambda = -1/(sqrt(2.5)+1)):
    q-row:    M q  - p_left + p_right  (+ lam at in-edge end,
                                        - lam at out-edge start)
              rhs: -p_bc(start) at boundary starts, +p_bc(end) at ends
    p-row:    q_{c+1} - q_c = int_c f
    lam-row:  sum_in q_end - sum_out q_start = 0
"""

from __future__ import annotations

from fractions import Fraction
from typing import Callable, Mapping, Sequence

import numpy as np

__all__ = ["exact_solve", "sparse_exact_solve"]


def sparse_exact_solve(
    rows: Sequence[Mapping[int, Fraction]], rhs: Sequence[Fraction]
) -> list[Fraction]:
    """Exact sparse Gaussian elimination with Markowitz pivoting.

    Entirely generic — knows nothing about network structure.  In exact
    arithmetic any nonzero pivot is valid, so the pivot is chosen purely to
    minimise fill (Markowitz cost = (r_i - 1)(c_j - 1) over nonzero a_ij).
    """
    n = len(rows)
    # working copy: dict-of-dicts plus a column -> rows index
    A: list[dict[int, Fraction]] = [dict(r) for r in rows]
    b: list[Fraction] = list(rhs)
    col_rows: list[set[int]] = [set() for _ in range(n)]
    for i, r in enumerate(A):
        for j, v in list(r.items()):
            if v == 0:
                del r[j]
            else:
                col_rows[j].add(i)

    row_of_pivot: list[int] = [-1] * n  # elimination order -> row index
    col_of_pivot: list[int] = [-1] * n
    active_rows = set(range(n))
    active_cols = set(range(n))

    for step in range(n):
        # Markowitz pivot among a bounded candidate set (cheapest columns)
        best = None
        best_cost = None
        cand_cols = sorted(active_cols, key=lambda j: len(col_rows[j]))[:8]
        for j in cand_cols:
            for i in col_rows[j]:
                cost = (len(A[i]) - 1) * (len(col_rows[j]) - 1)
                if best_cost is None or cost < best_cost:
                    best, best_cost = (i, j), cost
                    if cost == 0:
                        break
            if best_cost == 0:
                break
        if best is None:
            raise ZeroDivisionError("structurally singular system")
        pi, pj = best
        piv = A[pi][pj]
        row_of_pivot[step] = pi
        col_of_pivot[step] = pj
        active_rows.discard(pi)
        active_cols.discard(pj)
        for j in A[pi]:
            col_rows[j].discard(pi)

        # eliminate column pj from all other active rows
        for i in list(col_rows[pj]):
            if i == pi:
                continue
            factor = A[i].pop(pj) / piv
            col_rows[pj].discard(i)
            if factor == 0:
                continue
            for j, v in A[pi].items():
                if j == pj:
                    continue
                new = A[i].get(j, Fraction(0)) - factor * v
                if new == 0:
                    if j in A[i]:
                        del A[i][j]
                        col_rows[j].discard(i)
                else:
                    if j not in A[i]:
                        col_rows[j].add(i)
                    A[i][j] = new
            b[i] -= factor * b[pi]

    # back-substitution in reverse elimination order
    x: list[Fraction] = [Fraction(0)] * n
    for step in range(n - 1, -1, -1):
        i = row_of_pivot[step]
        j = col_of_pivot[step]
        s = b[i]
        for jj, v in A[i].items():
            if jj != j:
                s -= v * x[jj]
        x[j] = s / A[i][j]
    return x


def _invert_fraction_matrix(V: list[list[Fraction]]) -> list[list[Fraction]]:
    """Exact Gauss-Jordan inverse of a square Fraction matrix."""
    n = len(V)
    A = [list(row) + [Fraction(int(i == j)) for j in range(n)] for i, row in enumerate(V)]
    for col in range(n):
        piv = next(r for r in range(col, n) if A[r][col] != 0)
        A[col], A[piv] = A[piv], A[col]
        pv = A[col][col]
        A[col] = [v / pv for v in A[col]]
        for r in range(n):
            if r != col and A[r][col] != 0:
                fac = A[r][col]
                A[r] = [a - fac * b for a, b in zip(A[r], A[col])]
    return [row[n:] for row in A]


def _exact_mass(k: int) -> list[list[Fraction]]:
    """Exact reference-interval P_k mass matrix (equispaced Lagrange).

    ``M[i][j] = ∫₀¹ φ_i φ_j dx`` with nodes ``l/k`` — every entry is
    rational (polynomial basis with rational coefficients integrated
    against monomials).  Independent re-derivation of
    ``ops/elements.mass_matrix`` for the oracle (shares no code)."""
    n = k + 1
    nodes = [Fraction(l, k) for l in range(n)]
    V = [[nodes[i] ** j for j in range(n)] for i in range(n)]
    C = _invert_fraction_matrix(V)  # φ_m(x) = Σ_j C[j][m] x^j
    H = [[Fraction(1, a + b + 1) for b in range(n)] for a in range(n)]
    return [
        [
            sum(C[a][i] * H[a][b] * C[b][j] for a in range(n) for b in range(n))
            for j in range(n)
        ]
        for i in range(n)
    ]


def exact_solve(
    G,
    N: int,
    p_bc: Callable[[np.ndarray], float],
    R: np.ndarray | float | None = None,
    f: float | None = None,
    flux_degree: int = 1,
):
    """Exact-rational solve of the discrete network system on ``G``.

    Args:
        G: ``networkx.DiGraph`` with ``pos`` node attributes (the demo
            generators' output format).
        N: Elements per edge.
        p_bc: Boundary pressure callable, evaluated at node coordinates
            (receives the (3,)-padded coordinate like the production API).
        R: Per-edge resistance array (float64) or scalar; default 1.
        f: Constant source; default 0.

    Returns:
        dict with float64 arrays ``flux`` (E, N+1), ``pressure`` (E, N),
        ``lam`` keyed by bifurcation node id, and the exact ``Fraction``
        lists under ``*_exact``.
    """
    edges = list(G.edges)
    E = len(edges)
    pos = {n_: np.asarray(G.nodes[n_]["pos"], dtype=np.float64) for n_ in G.nodes}

    def coord3(node):
        x = np.zeros(3)
        p = pos[node]
        x[: p.shape[0]] = p
        return x

    deg = {n_: G.degree(n_) for n_ in G.nodes}
    bif_nodes = sorted(n_ for n_ in G.nodes if deg[n_] > 1)
    bif_index = {n_: i for i, n_ in enumerate(bif_nodes)}
    B = len(bif_nodes)

    if R is None:
        R_arr = np.ones(E)
    elif np.isscalar(R):
        R_arr = np.full(E, float(R))
    else:
        R_arr = np.asarray(R, dtype=np.float64)
        assert R_arr.shape == (E,)
    f_frac = Fraction(0) if f is None else Fraction(float(f))
    k = int(flux_degree)
    Mhat = _exact_mass(k)  # for k=1: [[1/3, 1/6], [1/6, 1/3]]

    # unknown numbering: flux dofs are the k·N+1 equispaced Lagrange nodes
    # along each edge (cell-endpoint chain + k−1 interior nodes per cell,
    # in along-edge node order — the production layout)
    def q_dof(e, i):
        return e * (N * k + 1) + i

    qn = E * (N * k + 1)

    def p_dof(e, c):
        return qn + e * N + c

    pn = qn + E * N

    def l_dof(b):
        return pn + b

    n_unknowns = pn + B
    rows: list[dict[int, Fraction]] = [dict() for _ in range(n_unknowns)]
    rhs: list[Fraction] = [Fraction(0)] * n_unknowns

    def add(i, j, v):
        rows[i][j] = rows[i].get(j, Fraction(0)) + v

    for e, (u, v) in enumerate(edges):
        L = Fraction(float(np.linalg.norm(pos[v] - pos[u])))
        h = L / N
        Re = Fraction(float(R_arr[e]))
        # per-cell mass: (R h) · M̂ over the cell's k+1 local nodes
        a_c = Re * h
        for c in range(N):
            loc = [q_dof(e, c * k + l) for l in range(k + 1)]
            for li in range(k + 1):
                for lj in range(k + 1):
                    if Mhat[li][lj] != 0:
                        add(loc[li], loc[lj], a_c * Mhat[li][lj])
            # -int p dv/ds = p_c (φ_i(0) − φ_i(h)): endpoint basis only
            add(loc[0], p_dof(e, c), Fraction(1))
            add(loc[k], p_dof(e, c), Fraction(-1))
            # p-row: ∫ q' dx = q(right) − q(left) = f h
            add(p_dof(e, c), loc[k], Fraction(1))
            add(p_dof(e, c), loc[0], Fraction(-1))
            rhs[p_dof(e, c)] = f_frac * h

        if deg[u] > 1:  # out-edge of bifurcation u
            b = bif_index[u]
            add(q_dof(e, 0), l_dof(b), Fraction(-1))
            add(l_dof(b), q_dof(e, 0), Fraction(-1))
        else:  # boundary start
            rhs[q_dof(e, 0)] -= Fraction(float(p_bc(coord3(u))))
        if deg[v] > 1:  # in-edge of bifurcation v
            b = bif_index[v]
            add(q_dof(e, N * k), l_dof(b), Fraction(1))
            add(l_dof(b), q_dof(e, N * k), Fraction(1))
        else:  # boundary end
            rhs[q_dof(e, N * k)] += Fraction(float(p_bc(coord3(v))))

    x = sparse_exact_solve(rows, rhs)

    flux = np.array(
        [[float(x[q_dof(e, i)]) for i in range(N * k + 1)] for e in range(E)]
    )
    pressure = np.array(
        [[float(x[p_dof(e, c)]) for c in range(N)] for e in range(E)]
    )
    lam = {int(n_): float(x[l_dof(bif_index[n_])]) for n_ in bif_nodes}
    return {
        "edges": [(int(u), int(v)) for u, v in edges],
        "N": N,
        "flux": flux,
        "pressure": pressure,
        "lam": lam,
        "x_exact": x,
    }
