"""Locality-aware balanced graph partitioning (host-side, once per dataset).

Why this exists: the halo execution model (:mod:`llp_tpu.parallel.halo`)
range-partitions nodes by id, so its communication volume is set entirely by
how well node ids cluster the graph.  On id-shuffled graphs the boundary
sets are near-worst-case (BASELINE.md "halo comm-volume" table: halo beat
full replication only 1.35x on bytes at P=8) — the structural lever named
there is exactly this module: relabel nodes so contiguous id ranges are
low-cut clusters.  The same relabel concentrates each receiver window's
sender rows into a compact id range, which is the cache-locality story for
the single-chip SpMM gather (the measured 68% wall).

The algorithm (native ``llp_partition_graph`` with an identical numpy
fallback — :mod:`llp_tpu.native.lib`) is restreaming LDG: one linear
deterministic greedy pass over a BFS stream order, then capacitated
label-propagation restreams until convergence, then an exact-fill rebalance
so group sizes match the range partition's ``ceil(N/P)`` slots exactly.
Measured on the warm bench graph (scripts in tests): boundary rows shrink
~4x vs the id-range partition, reaching the planted-community oracle.

No counterpart in the reference (it is single-device); this is the
partitioner a DGL/ParMETIS-style distributed deployment supplies natively.
The relabel itself is an isomorphism applied with
:func:`llp_tpu.data.reorder.apply_order` — metrics are unchanged.
"""

from __future__ import annotations

import numpy as np

from llp_tpu.native import lib as native


def bfs_order(
    edge_index: np.ndarray,
    num_nodes: int,
    csr: tuple | None = None,
) -> np.ndarray:
    """Deterministic BFS node order; isolated nodes last.

    Seeds ascend by node id over degree>0 components; each BFS level is
    emitted in ascending id order (np.unique).  Vectorized per level.
    ``csr``: optional prebuilt (row_ptr, col) — callers that already built
    the CSR (partition_assign) skip a second O(E) sort.
    """
    edge_index = np.asarray(edge_index, dtype=np.int64)
    row_ptr, col = csr if csr is not None else native.build_csr(
        edge_index[0].astype(np.int32), edge_index[1].astype(np.int32),
        num_nodes,
    )
    row_ptr = row_ptr.astype(np.int64)
    deg = row_ptr[1:] - row_ptr[:-1]
    visited = deg == 0  # isolated nodes are appended at the end
    out = np.empty(num_nodes, np.int64)
    pos = 0
    ptr = 0
    while True:
        while ptr < num_nodes and visited[ptr]:
            ptr += 1
        if ptr >= num_nodes:
            break
        seed = ptr
        visited[seed] = True
        out[pos] = seed
        pos += 1
        frontier = np.array([seed], np.int64)
        while frontier.size:
            cnt = deg[frontier]
            tot = int(cnt.sum())
            if tot == 0:
                break
            idx = np.repeat(row_ptr[frontier], cnt) + (
                np.arange(tot) - np.repeat(np.cumsum(cnt) - cnt, cnt)
            )
            nxt = np.unique(col[idx].astype(np.int64))
            nxt = nxt[~visited[nxt]]
            visited[nxt] = True
            out[pos : pos + nxt.size] = nxt
            pos += nxt.size
            frontier = nxt
    iso = np.flatnonzero(deg == 0)
    out[pos : pos + iso.size] = iso
    assert pos + iso.size == num_nodes
    return out


def partition_assign(
    edge_index: np.ndarray,
    num_nodes: int,
    num_parts: int,
    *,
    method: str = "auto",
    max_passes: int = 30,
    slack: float = 0.04,
) -> np.ndarray:
    """(N,) int32 partition assignment, balanced to exact range-slot fills.

    Group p holds exactly ``ceil(N/P)`` nodes (the last group holds the
    remainder), so sorting nodes by (assignment, id) yields a relabeling
    under which the plain id-range partition of :func:`build_halo_partition`
    coincides with this partition.

    ``method``: ``"multilevel"`` (native METIS-style V-cycle — heavy-edge
    matching coarsen, coarsest LDG+LP, refine on the way back),
    ``"flat"`` (the restreaming LDG, identical in C++ and numpy), or
    ``"auto"``: run both and keep the lower-cut result — the two methods'
    label-propagation refinements settle in different basins and neither
    dominates (measured, collab stand-in: flat wins P=8 at 18.5%-cut vs
    29%, multilevel wins P=4 at 16.5% vs 28%); both are sub-second per
    million edges and this runs once per dataset.  Without the native
    library ``"auto"`` degrades to flat.
    """
    if num_parts <= 1:
        return np.zeros(num_nodes, np.int32)
    if method not in ("auto", "flat", "multilevel"):
        raise ValueError(f"unknown partition method {method!r}")
    edge_index = np.asarray(edge_index, dtype=np.int64)
    cap = -(-num_nodes // num_parts)
    cap2 = cap + max(1, int(cap * slack))
    row_ptr, col = native.build_csr(
        edge_index[0].astype(np.int32), edge_index[1].astype(np.int32),
        num_nodes,
    )
    candidates = []
    if method in ("auto", "multilevel"):
        # Coarsest-size choice: 1024 measured best at collab scale; keep
        # >= 16 clusters per part so the coarse LDG has placement freedom.
        coarsest = max(1024, 16 * num_parts)
        ml = native.partition_multilevel(
            row_ptr, col, num_parts, coarsest, max_passes, slack
        )
        if ml is None and method == "multilevel":
            raise RuntimeError(
                "partition method 'multilevel' needs the native library "
                "(g++); use method='flat' or 'auto'"
            )
        if ml is not None:
            candidates.append(ml)
    if method in ("auto", "flat"):
        order = bfs_order(edge_index, num_nodes, csr=(row_ptr, col))
        candidates.append(native.partition_graph(
            row_ptr, col, num_parts, max_passes, cap, cap2, order
        ))
    if len(candidates) > 1:
        cuts = [
            int((np.asarray(a)[edge_index[0]]
                 != np.asarray(a)[edge_index[1]]).sum())
            for a in candidates
        ]
        assign = candidates[int(np.argmin(cuts))]
    else:
        assign = candidates[0]
    return _exact_fill(assign, row_ptr.astype(np.int64), col, num_nodes,
                       num_parts, cap)


def _exact_fill(assign, row_ptr, col, n, p_, cap):
    """Rebalance slack surpluses to exact fills (cap, ..., cap, remainder).

    Moves the least-internally-connected members out of overfull groups into
    the underfull group where they have the most neighbors (deficit-capped).
    Deterministic: members tie-break ascending id, targets lowest id.
    """
    # Range-slot sizes: full cap slots, then the remainder, then (when
    # cap*p_ overshoots n by more than one slot) empty tail slots — exactly
    # the sizes owner = id // cap produces.
    req = np.minimum(cap, np.maximum(0, n - np.arange(p_, dtype=np.int64) * cap))
    load = np.bincount(assign, minlength=p_).astype(np.int64)
    deficit = req - load  # >0 where underfull
    for q in np.flatnonzero(load > req):
        members = np.flatnonzero(assign == q)
        cnt = (row_ptr[members + 1] - row_ptr[members]).astype(np.int64)
        tot = int(cnt.sum())
        flat = np.repeat(row_ptr[members], cnt) + (
            np.arange(tot) - np.repeat(np.cumsum(cnt) - cnt, cnt)
        )
        owner = np.repeat(np.arange(members.size), cnt)
        # per-(member, part) neighbor counts
        mat = np.zeros((members.size, p_), np.int64)
        np.add.at(mat, (owner, assign[col[flat]]), 1)
        internal = mat[:, q]
        move_order = np.lexsort((members, internal))  # least internal first
        surplus = int(load[q] - req[q])
        moved = 0
        for mi in move_order:
            if moved == surplus:
                break
            under = np.flatnonzero(deficit > 0)
            if not under.size:
                break
            tgt = under[int(np.argmax(mat[mi, under]))]
            assign[members[mi]] = tgt
            deficit[tgt] -= 1
            load[tgt] += 1
            load[q] -= 1
            moved += 1
    assert (np.bincount(assign, minlength=p_) == req).all()
    return assign


def locality_order(
    edge_index: np.ndarray,
    num_nodes: int,
    num_parts: int,
    *,
    method: str = "auto",
    max_passes: int = 30,
    slack: float = 0.04,
) -> np.ndarray:
    """Relabeling permutation: ``order[i]`` = original id of new node i.

    Nodes sort by (partition, original id); feed to
    :func:`llp_tpu.data.reorder.apply_order`.  Under the relabeled ids the
    id-range partition into ``num_parts`` equals the locality partition.
    """
    assign = partition_assign(
        edge_index, num_nodes, num_parts, method=method,
        max_passes=max_passes, slack=slack,
    )
    return np.lexsort((np.arange(num_nodes), assign))


def boundary_stats(
    edge_index: np.ndarray, assign: np.ndarray, num_parts: int
) -> dict:
    """Halo comm-volume diagnostics for an assignment.

    ``boundary_rows`` = Σ_(q,p) |B(q,p)| — the total halo rows one
    aggregation pass exchanges (each owner row sent once per requester);
    ``cut_edges`` = edges whose endpoints live on different parts;
    ``max_pair_rows`` = max |B(q,p)| — the padded slot count m the static
    all_to_all plan allocates per (owner, requester).
    """
    s, r = np.asarray(edge_index, np.int64)
    os_, or_ = assign[s], assign[r]
    m = os_ != or_
    keys = np.unique(s[m] * num_parts + or_[m])
    if keys.size:
        owner_of_key = assign[keys // num_parts]
        pair = owner_of_key.astype(np.int64) * num_parts + (keys % num_parts)
        pair_rows = np.bincount(pair, minlength=num_parts * num_parts)
        max_pair = int(pair_rows.max())
    else:
        max_pair = 0
    return dict(
        boundary_rows=int(keys.size),
        cut_edges=int(m.sum()),
        max_pair_rows=max_pair,
        loads=np.bincount(assign, minlength=num_parts).tolist(),
    )
