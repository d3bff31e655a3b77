"""Graph subsetting + external-graph export utilities.

Live replacements for the reference's two dead utilities:

* ``k_hop_subgraph`` — the working core of the reference's never-called
  ``randomly_drop_nodes_citation2`` (reference ``src/utils.py:107-146``,
  which builds a small ogbl-citation2 via a 4-hop subgraph of its first 30
  nodes): k-hop neighborhood expansion + induced-edge relabeling, as a
  host-side numpy op usable on any graph.
* ``export_npz`` — the capability of the reference's never-called
  ``preprocess_igb`` (reference ``src/utils.py:148-193``, which converted an
  external DGL graph into the repo's format): any external (x, edge_index)
  pair becomes a dataset via the ``{name}.npz`` interchange that
  :func:`llp_tpu.data.registry.get_dataset` loads — without igb/dgl deps.
"""

from __future__ import annotations

import numpy as np

from llp_tpu.data.io import save_dataset_npz


def k_hop_subgraph(
    edge_index: np.ndarray,
    num_nodes: int,
    seed_nodes: np.ndarray,
    num_hops: int,
):
    """Induced subgraph of the ``num_hops``-neighborhood around ``seed_nodes``.

    Neighborhood expansion follows edges in BOTH directions (like the
    reference's to_undirected-then-k_hop usage). Returns ``(nodes, sub_ei)``:
    the sorted kept node ids and the induced edges relabeled to ``0..len-1``.
    """
    edge_index = np.asarray(edge_index, dtype=np.int64)
    keep = np.zeros((num_nodes,), dtype=bool)
    keep[np.asarray(seed_nodes, dtype=np.int64)] = True
    src, dst = edge_index[0], edge_index[1]
    for _ in range(num_hops):
        frontier = keep[src] | keep[dst]
        before = keep.sum()
        keep[src[frontier]] = True
        keep[dst[frontier]] = True
        if keep.sum() == before:
            break
    nodes = np.flatnonzero(keep)
    emask = keep[src] & keep[dst]
    relabel = np.full((num_nodes,), -1, dtype=np.int64)
    relabel[nodes] = np.arange(nodes.shape[0], dtype=np.int64)
    sub = np.stack([relabel[src[emask]], relabel[dst[emask]]])
    return nodes, sub


def export_npz(path: str, x: np.ndarray, edge_index: np.ndarray) -> None:
    """Write an external graph as a registry-loadable ``{name}.npz`` dataset.

    ``x``: (N, D) float features; ``edge_index``: (2, E) int64 (pass both
    directions for undirected graphs, as the registry treats the edge list as
    the literal message graph).
    """
    x = np.asarray(x, dtype=np.float32)
    edge_index = np.asarray(edge_index, dtype=np.int64)
    if edge_index.ndim != 2 or edge_index.shape[0] != 2:
        raise ValueError(f"edge_index must be (2, E), got {edge_index.shape}")
    if edge_index.size and edge_index.max() >= x.shape[0]:
        raise ValueError("edge_index references nodes beyond x's row count")
    save_dataset_npz(path, x, edge_index)
