"""Locality-improving node reordering (host-side, once per dataset).

TPU kernels for sparse aggregation win when edges cluster into dense
adjacency tiles (see docs/archived/spmm_tile_kernel.py; tiling in data/tiles.py).  Reverse Cuthill–McKee over
the undirected graph produces exactly that: neighbors get nearby ids, so the
(receiver, sender) incidence concentrates near the diagonal.  The reorder is
an isomorphism applied at dataset-load time — features, edges, splits, and
teacher artifacts all live in the same relabeled id space, so every metric is
unchanged.
"""

from __future__ import annotations

import numpy as np


def rcm_order(edge_index: np.ndarray, num_nodes: int) -> np.ndarray:
    """Reverse Cuthill–McKee ordering.

    Returns ``order`` with ``order[i]`` = original id of the node placed at
    new position i.  BFS from minimum-degree seeds, neighbors visited in
    ascending-degree order, final sequence reversed.
    """
    edge_index = np.asarray(edge_index, dtype=np.int64)
    deg = np.bincount(edge_index[0], minlength=num_nodes)
    order_ptr = np.argsort(edge_index[0], kind="stable")
    col = edge_index[1][order_ptr]
    row_ptr = np.zeros(num_nodes + 1, np.int64)
    row_ptr[1:] = np.cumsum(deg)

    visited = np.zeros(num_nodes, bool)
    result = np.empty(num_nodes, np.int64)
    pos = 0
    # Seeds in ascending degree (isolated nodes first — they're cheap).
    for seed in np.argsort(deg, kind="stable"):
        if visited[seed]:
            continue
        visited[seed] = True
        result[pos] = seed
        head = pos
        pos += 1
        while head < pos:
            u = result[head]
            head += 1
            nbrs = col[row_ptr[u] : row_ptr[u + 1]]
            nbrs = nbrs[~visited[nbrs]]
            if nbrs.size:
                nbrs = np.unique(nbrs)  # dedup parallel edges
                nbrs = nbrs[~visited[nbrs]]
                nbrs = nbrs[np.argsort(deg[nbrs], kind="stable")]
                visited[nbrs] = True
                result[pos : pos + nbrs.size] = nbrs
                pos += nbrs.size
    assert pos == num_nodes
    return result[::-1].copy()


def apply_order(
    x: np.ndarray, edge_index: np.ndarray, order: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Relabel: new node i holds old node order[i].

    Returns (x_new, edge_index_new, inverse) where inverse[old_id] = new_id.
    """
    num_nodes = x.shape[0]
    inverse = np.empty(num_nodes, np.int64)
    inverse[order] = np.arange(num_nodes)
    return x[order], inverse[np.asarray(edge_index, np.int64)], inverse
