"""Sparse elimination of unstructured cyclic bifurcation cores.

The peel-then-core plan (:func:`networks_fenicsx_tpu.solver._plan_tree_elimination`)
eliminates tree parts fill-in-free; whatever cycle core remains was
previously factored **densely** (O(core³)) — fine for the small cores of
looped vessel networks, hopeless for large unstructured meshes.  This
module supplies the missing generality of the reference's sparse direct
solver (MUMPS, reference ``solver.py:62``): an exact sparse Cholesky-style
elimination of the SPD core Schur system with host-planned structure and a
device-executed numeric phase.

Design (TPU-first):

* **Host symbolic phase** (:func:`plan_core_elimination`): greedy
  minimum-degree *independent-set* ordering.  Each round eliminates a
  maximal independent set of currently-low-degree nodes; the fill edges a
  node's elimination creates among its neighbours get statically allocated
  value slots.  Rounds shrink the graph geometrically (a pure cycle halves
  every round), so the device program has O(log core) stages, not O(core).
* **Device numeric phase** (:func:`core_eliminate`): per round, one gather
  of neighbour off-diagonal values, batched rank-1 Schur updates, and
  host-pre-aggregated segment scatter-adds (sorted/unique target hints,
  the same idiom as the tree peel).  Everything is f64-exact — the
  elimination *is* an unpivoted Cholesky of an SPD matrix, so no pivoting
  or refinement is needed outside the tiny dense tail.
* **Dense tail**: once few nodes remain (or every remaining degree exceeds
  the padding cap) the residual system is solved with the existing
  mixed-precision dense Cholesky + iterative-refinement kernel.

The planner returns ``None`` when fill blows past its budget (strongly
non-planar cores); callers then keep the previous dense/CG behaviour.
"""

from __future__ import annotations

import typing

import numpy as np

import jax
import jax.numpy as jnp

from .mixed_precision import scaled_cholesky_factor, scaled_cholesky_solve

__all__ = [
    "CoreElimPlan",
    "nested_dissection_order",
    "plan_core_elimination",
    "core_eliminate",
    "_core_factor",
    "_core_apply",
]


def nested_dissection_order(
    core_pairs: np.ndarray, n_core: int, leaf: int = 64
) -> np.ndarray:
    """Level-structure nested-dissection elimination order.

    Recursive graph bisection: BFS levels from a pseudo-peripheral node
    split each component at the median level; that level's nodes form the
    separator, appended AFTER both halves.  Leaf components (< ``leaf``
    nodes) keep BFS order.  Where greedy minimum-degree fill blows up —
    large 2-D lattice cores are the canonical case (MUMPS uses METIS ND
    there) — this order bounds fill near the O(n log n) ND asymptotic,
    letting :func:`plan_core_elimination` stay within its budget.
    """
    # CSR adjacency
    ci = np.asarray(core_pairs[:, 0], dtype=np.int64)
    cj = np.asarray(core_pairs[:, 1], dtype=np.int64)
    src = np.concatenate([ci, cj])
    dst = np.concatenate([cj, ci])
    o = np.argsort(src, kind="stable")
    src, dst = src[o], dst[o]
    indptr = np.zeros(n_core + 1, dtype=np.int64)
    np.add.at(indptr, src + 1, 1)
    indptr = np.cumsum(indptr)

    def neighbors(v: int) -> np.ndarray:
        return dst[indptr[v] : indptr[v + 1]]

    order: list[np.ndarray] = []
    # worklist of (nodes, emit_after): separators are pushed to emit after
    # both halves complete (LIFO preserves the recursive emission order)
    in_part = np.full(n_core, -1, dtype=np.int64)  # partition stamp
    stamp = 0
    stack: list[tuple[np.ndarray, bool]] = [
        (np.arange(n_core, dtype=np.int64), False)
    ]
    while stack:
        nodes, is_sep = stack.pop()
        if is_sep or nodes.size <= leaf:
            order.append(nodes)
            continue
        stamp += 1
        in_part[nodes] = stamp
        # BFS levels from a pseudo-peripheral node of this part (first
        # BFS finds a far node; second BFS from it gives the levels).
        # Parts can be disconnected (separator removal); handle per seed.
        level = np.full(n_core, -1, dtype=np.int64)
        remaining = nodes
        comp_sets = []
        while remaining.size:
            seed = int(remaining[0])
            for _pass in range(2):
                level[nodes] = -1
                level[seed] = 0
                frontier = [seed]
                comp = [seed]
                far = seed
                lv = 0
                while frontier:
                    lv += 1
                    nxt = []
                    for v in frontier:
                        for w in neighbors(v):
                            w = int(w)
                            if in_part[w] == stamp and level[w] < 0:
                                level[w] = lv
                                nxt.append(w)
                                comp.append(w)
                    if nxt:
                        far = nxt[0]
                    frontier = nxt
                seed = far  # second pass starts from the far end
            comp_arr = np.asarray(comp, dtype=np.int64)
            # capture levels NOW — the next component's BFS resets them
            comp_sets.append((comp_arr, level[comp_arr].copy()))
            mask = np.ones(remaining.size, dtype=bool)
            mask[np.isin(remaining, comp_arr)] = False
            remaining = remaining[mask]
        for comp_arr, lvs in comp_sets:
            if comp_arr.size <= leaf:
                order.append(comp_arr)
                continue
            # separator: the THINNEST level within the middle band of the
            # cumulative count (35-65%) — exact-median levels on irregular
            # graphs can be fat, and separator width drives both fill and
            # the dense-tail size
            counts = np.bincount(lvs)
            cum = np.cumsum(counts)
            lo_b = int(np.searchsorted(cum, int(0.35 * comp_arr.size)))
            hi_b = int(np.searchsorted(cum, int(0.65 * comp_arr.size)))
            lo_b = min(max(lo_b, 1), counts.size - 1)
            hi_b = min(max(hi_b, lo_b), counts.size - 1)
            band = counts[lo_b : hi_b + 1]
            half = lo_b + int(np.argmin(band))
            sep = comp_arr[lvs == half]
            lo = comp_arr[lvs < half]
            hi = comp_arr[lvs > half]
            stack.append((sep, True))  # emitted after both halves (LIFO)
            if hi.size:
                stack.append((hi, False))
            if lo.size:
                stack.append((lo, False))
    out = np.concatenate(order) if order else np.empty(0, np.int64)
    assert out.size == n_core
    return out


class _Round(typing.NamedTuple):
    elim: np.ndarray  # (S,) core-rank node ids, sorted ascending
    nbr_node: np.ndarray  # (S, K) neighbour core-rank ids, pad = Bc
    nbr_slot: np.ndarray  # (S, K) value-slot ids, pad = n_slots (zero cell)
    # diagonal / rhs updates: flat indices into the (S*K) neighbour grid
    d_src: np.ndarray  # (M1,) valid entries
    d_seg: np.ndarray  # (M1,) segment id into d_tgt
    d_tgt: np.ndarray  # (U1,) unique sorted target node ids
    # off-diagonal Schur updates: index PAIRS into the (S*K) grid
    u_src_i: np.ndarray  # (M2,)
    u_src_j: np.ndarray  # (M2,)
    u_seg: np.ndarray  # (M2,) segment id into u_tgt
    u_tgt: np.ndarray  # (U2,) unique sorted target slot ids


class CoreElimPlan(typing.NamedTuple):
    """Host-planned sparse elimination of a cycle core (see module docs)."""

    n_core: int  # number of core nodes Bc
    n_slots: int  # off-diagonal value slots (original pairs + fill)
    init_slot: np.ndarray  # (P0,) global pair id feeding slot p (p < P0)
    rounds: tuple  # tuple[_Round]
    dense_nodes: np.ndarray  # (Bd,) core-rank ids solved densely at the top
    dense_pairs: np.ndarray  # (Pd, 3) (di, dj, slot) for the dense tail
    fill_slots: int  # diagnostic: slots added beyond the original pairs

    @property
    def stats(self) -> dict:
        return {
            "core": self.n_core,
            "rounds": len(self.rounds),
            "slots": self.n_slots,
            "fill": self.fill_slots,
            "dense_tail": int(self.dense_nodes.size),
        }


def plan_core_elimination(
    core_pairs: np.ndarray,
    n_core: int,
    dense_cutoff: int = 384,
    kcap: int = 32,
    max_fill_ratio: float = 60.0,
    max_slots: int = 20_000_000,
    tail_stop: bool = True,
    order: np.ndarray | None = None,
    dense_cap: int | None = None,
) -> CoreElimPlan | None:
    """Symbolic minimum-degree independent-set elimination.

    Args:
        core_pairs: ``(P0, 3)`` rows ``(ci, cj, pair_id)`` in core-rank
            numbering (the ``_TreePlan.core_pairs`` layout).
        n_core: number of core nodes.
        dense_cutoff: stop eliminating and solve the remainder densely
            once this few nodes remain.
        kcap: maximum neighbour count an eliminated node may have (bounds
            the per-round padding width).
        max_fill_ratio / max_slots: fill budget — beyond it the planner
            gives up (returns ``None``) and the caller keeps the dense/CG
            fallback.
        tail_stop: apply the diminishing-returns stop (see the loop
            comment).  ``False`` forces the sparse rounds all the way to
            ``dense_cutoff`` — used by tests that pin the sparse numeric
            phase on small cores where the stop would otherwise keep the
            whole core dense.
        order: optional elimination order (e.g.
            :func:`nested_dissection_order`): per round every alive node
            that is a rank-local-minimum among its alive neighbours
            eliminates (parallel pivoting — fill equals the sequential
            order's, rounds = elimination-tree height).  Bounds fill on
            large lattice-like cores where greedy min-degree blows the
            budget; wide separator cliques (degree > kcap under any
            order) land in the dense tail, as in a multifrontal solver.
        dense_cap: maximum dense-tail size (default
            ``max(dense_cutoff, 4096)``).  ND orders on big lattices
            stall with top-separator tails of 4-8k — MXU-cheap to factor
            densely, so the ND caller raises this.

    Returns None when the core is empty or the fill budget is exceeded.
    """
    P0 = int(core_pairs.shape[0])
    if n_core == 0:
        return None
    budget = min(max_slots, int(max(P0, n_core) * max_fill_ratio) + 1024)

    # adjacency: node -> {nbr: slot}
    adj: list[dict[int, int]] = [dict() for _ in range(n_core)]
    for p, (ci, cj, _pid) in enumerate(np.asarray(core_pairs, dtype=np.int64)):
        adj[int(ci)][int(cj)] = p
        adj[int(cj)][int(ci)] = p
    n_slots = P0
    alive = np.ones(n_core, dtype=bool)
    n_alive = n_core
    rounds: list[_Round] = []
    rank = None
    if order is not None:
        order = np.asarray(order, dtype=np.int64)
        rank = np.empty(n_core, dtype=np.int64)
        rank[order] = np.arange(n_core, dtype=np.int64)

    while n_alive > dense_cutoff:
        if rank is not None:
            # parallel pivoting consistent with the given order: eliminate
            # every alive node that is a rank-local-MINIMUM among its
            # alive neighbours (non-adjacent by construction; the fill is
            # exactly the sequential-order fill, rounds = elimination-tree
            # height).  Wide separator cliques serialize under any order,
            # so nodes beyond kcap are left for the dense tail.
            chosen = [
                v
                for v in range(n_core)
                if alive[v]
                and len(adj[v]) <= kcap
                and all(rank[w] > rank[v] for w in adj[v])
            ]
        else:
            # candidates: independent set of minimum-ish degree nodes
            degs = {v: len(adj[v]) for v in range(n_core) if alive[v]}
            dmin = min(degs.values())
            thresh = min(kcap, max(dmin + 2, 4))
            blocked = set()
            chosen = []
            for v in sorted(degs, key=degs.get):  # type: ignore[arg-type]
                if degs[v] > thresh:
                    break
                if v in blocked:
                    continue
                chosen.append(v)
                blocked.add(v)
                blocked.update(adj[v])
        if not chosen:
            break  # every remaining node exceeds kcap: dense tail
        # Diminishing-returns stop: once independent sets shrink to
        # slivers (fill pushes every degree near the threshold) a long
        # tail of tiny device rounds costs more fixed launches than one
        # mixed-precision dense solve of the remainder.  Measured at 10k
        # junctions: without the stop the last ~40 rounds eliminate 1-8
        # nodes each (76 rounds, 16k HLO lines); stopping at a ≤2048-node
        # remainder gives 25 rounds / ~4k lines with the dense tail still
        # MXU-cheap.  Only when the remainder fits the dense envelope.
        if tail_stop and n_alive <= 2048 and len(chosen) < max(16, n_alive // 32):
            break
        chosen.sort()
        K = max((len(adj[v]) for v in chosen), default=1)
        K = max(K, 1)
        S = len(chosen)
        nbr_node = np.full((S, K), n_core, dtype=np.int64)
        nbr_slot = np.full((S, K), -1, dtype=np.int64)  # fixed to n_slots later
        d_entries: list[tuple[int, int]] = []  # (flat_src, tgt_node)
        u_entries: list[tuple[int, int, int]] = []  # (src_i, src_j, tgt_slot)
        for s, v in enumerate(chosen):
            nbrs = sorted(adj[v].items())
            for k, (n, slot) in enumerate(nbrs):
                nbr_node[s, k] = n
                nbr_slot[s, k] = slot
                d_entries.append((s * K + k, n))
            # fill: clique among the neighbours
            for i in range(len(nbrs)):
                ni = nbrs[i][0]
                for j in range(i + 1, len(nbrs)):
                    nj = nbrs[j][0]
                    slot = adj[ni].get(nj)
                    if slot is None:
                        slot = n_slots
                        n_slots += 1
                        adj[ni][nj] = slot
                        adj[nj][ni] = slot
                    u_entries.append((s * K + i, s * K + j, slot))
            # remove v
            for n, _slot in nbrs:
                del adj[n][v]
            adj[v] = {}
            alive[v] = False
        n_alive -= S
        if n_slots > budget:
            return None

        d_src = np.array([e[0] for e in d_entries], dtype=np.int64)
        d_tgt_all = np.array([e[1] for e in d_entries], dtype=np.int64)
        d_tgt, d_seg = np.unique(d_tgt_all, return_inverse=True)
        if u_entries:
            u_src_i = np.array([e[0] for e in u_entries], dtype=np.int64)
            u_src_j = np.array([e[1] for e in u_entries], dtype=np.int64)
            u_tgt_all = np.array([e[2] for e in u_entries], dtype=np.int64)
            u_tgt, u_seg = np.unique(u_tgt_all, return_inverse=True)
        else:
            u_src_i = u_src_j = u_seg = np.empty(0, dtype=np.int64)
            u_tgt = np.empty(0, dtype=np.int64)
        rounds.append(
            _Round(
                elim=np.asarray(chosen, dtype=np.int64),
                nbr_node=nbr_node,
                nbr_slot=nbr_slot,
                d_src=d_src,
                d_seg=d_seg,
                d_tgt=d_tgt,
                u_src_i=u_src_i,
                u_src_j=u_src_j,
                u_seg=u_seg,
                u_tgt=u_tgt,
            )
        )

    dense_nodes = np.flatnonzero(alive).astype(np.int64)
    if dense_nodes.size > (
        dense_cap if dense_cap is not None else max(dense_cutoff, 4096)
    ):
        return None  # fill forced a huge dense tail: not worth it
    rank = np.full(n_core, -1, dtype=np.int64)
    rank[dense_nodes] = np.arange(dense_nodes.size)
    dense_pairs: list[tuple[int, int, int]] = []
    for v in dense_nodes:
        for n, slot in adj[int(v)].items():
            if v < n:
                dense_pairs.append((int(rank[v]), int(rank[n]), slot))
    dp = (
        np.asarray(dense_pairs, dtype=np.int64)
        if dense_pairs
        else np.empty((0, 3), dtype=np.int64)
    )
    # fix slot padding now that n_slots is final
    rounds = [
        r._replace(nbr_slot=np.where(r.nbr_slot < 0, n_slots, r.nbr_slot))
        for r in rounds
    ]
    return CoreElimPlan(
        n_core=n_core,
        n_slots=n_slots,
        init_slot=np.asarray(core_pairs[:, 2], dtype=np.int64),
        rounds=tuple(rounds),
        dense_nodes=dense_nodes,
        dense_pairs=dp,
        fill_slots=n_slots - P0,
    )


def _core_factor(
    plan: CoreElimPlan, dc: jnp.ndarray, w_pairs: jnp.ndarray
) -> dict:
    """Conductance-side half: value elimination + dense-tail Cholesky.

    Depends on the core diagonal ``dc`` and per-pair conductances only —
    the reusable factorization (MUMPS-factor analog).  Returns a device
    pytree consumed by :func:`_core_apply` per right-hand side.
    """
    dtype = dc.dtype
    # value slots: matrix off-diagonals (initially −w of the core pairs);
    # one trailing ZERO cell backs padded gathers and is never written.
    vals = jnp.zeros(plan.n_slots + 1, dtype)
    if plan.init_slot.size:
        vals = vals.at[jnp.arange(plan.init_slot.size)].set(
            -w_pairs[jnp.asarray(plan.init_slot)]
        )
    d = dc
    rounds: list = []
    for rd in plan.rounds:
        e = jnp.asarray(rd.elim)
        a = vals[jnp.asarray(rd.nbr_slot)]  # (S, K); pads read the zero cell
        inv = 1.0 / d[e]
        ainv = a * inv[:, None]
        if rd.d_src.size:
            aa = (a * ainv).reshape(-1)[jnp.asarray(rd.d_src)]
            d = d.at[jnp.asarray(rd.d_tgt)].add(
                -jax.ops.segment_sum(
                    aa, jnp.asarray(rd.d_seg), num_segments=rd.d_tgt.size
                ),
                indices_are_sorted=True,
                unique_indices=True,
            )
        # off-diagonal Schur (fill) updates
        if rd.u_src_i.size:
            contrib = a.reshape(-1)[jnp.asarray(rd.u_src_i)] * ainv.reshape(-1)[
                jnp.asarray(rd.u_src_j)
            ]
            vals = vals.at[jnp.asarray(rd.u_tgt)].add(
                -jax.ops.segment_sum(
                    contrib, jnp.asarray(rd.u_seg), num_segments=rd.u_tgt.size
                ),
                indices_are_sorted=True,
                unique_indices=True,
            )
        rounds.append((a, inv))

    state: dict = {"rounds": tuple(rounds)}
    if plan.dense_nodes.size:
        dn = jnp.asarray(plan.dense_nodes)
        Bd = int(plan.dense_nodes.size)
        Lc = jnp.zeros((Bd, Bd), dtype)
        Lc = Lc.at[jnp.arange(Bd), jnp.arange(Bd)].add(d[dn])
        if plan.dense_pairs.shape[0]:
            di = jnp.asarray(plan.dense_pairs[:, 0])
            dj = jnp.asarray(plan.dense_pairs[:, 1])
            ov = vals[jnp.asarray(plan.dense_pairs[:, 2])]
            Lc = Lc.at[di, dj].add(ov)
            Lc = Lc.at[dj, di].add(ov)
        # mixed-precision Cholesky + refinement (the shared dense-tail kernel)
        state["dense"] = scaled_cholesky_factor(Lc)
    return state


def _core_apply(
    plan: CoreElimPlan, state: dict, rc: jnp.ndarray
) -> jnp.ndarray:
    """Per-rhs half: forward rhs sweeps, dense-tail solve, back-substitution."""
    dtype = rc.dtype
    Bc = plan.n_core
    r = rc
    saved: list = []
    for rd, (a, inv) in zip(plan.rounds, state["rounds"]):
        e = jnp.asarray(rd.elim)
        rv = r[e]
        if rd.d_src.size:
            ainv = a * inv[:, None]
            rr = (ainv * rv[:, None]).reshape(-1)[jnp.asarray(rd.d_src)]
            r = r.at[jnp.asarray(rd.d_tgt)].add(
                -jax.ops.segment_sum(
                    rr, jnp.asarray(rd.d_seg), num_segments=rd.d_tgt.size
                ),
                indices_are_sorted=True,
                unique_indices=True,
            )
        saved.append((e, jnp.asarray(rd.nbr_node), a, inv, rv))

    lam = jnp.zeros(Bc + 1, dtype)  # +1: padded neighbour reads
    if plan.dense_nodes.size:
        dn = jnp.asarray(plan.dense_nodes)
        lam_d = scaled_cholesky_solve(state["dense"], r[dn])
        lam = lam.at[dn].set(lam_d)

    for e, nbr, a, inv, rv in reversed(saved):
        lam_n = lam[nbr]  # (S, K); pads read lam[Bc] == 0
        lam = lam.at[e].set(
            (rv - jnp.sum(a * lam_n, axis=1)) * inv,
            indices_are_sorted=True,
            unique_indices=True,
        )
    return lam[:Bc]


def core_eliminate(
    plan: CoreElimPlan, dc: jnp.ndarray, rc: jnp.ndarray, w_pairs: jnp.ndarray
) -> jnp.ndarray:
    """Numeric phase: solve the core system ``(diag dc, offdiag −w) λ = rc``.

    ``dc``/``rc`` are the core-rank diagonal/rhs with all peeled
    contributions folded in; ``w_pairs`` the aggregated per-pair
    conductances (callers may have psum-reduced them).  Returns ``λ_core``
    (non-finite when the dense tail detects singularity, matching the
    dense core path's convention).  Internally split into
    :func:`_core_factor` (conductance side) and :func:`_core_apply`
    (per rhs) so factor-reuse serving shares the exact same formulas.
    """
    return _core_apply(plan, _core_factor(plan, dc, w_pairs), rc)
