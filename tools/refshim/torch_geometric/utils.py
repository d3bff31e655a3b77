"""PyG ``torch_geometric.utils`` stand-ins (public-API semantics, plain torch).

Covered (= what the reference imports AND executes): ``negative_sampling``,
``add_self_loops``, ``train_test_split_edges``, ``subgraph``,
``to_undirected``. ``to_networkx``/``k_hop_subgraph`` are import-surface only
(dead reference code paths) and raise on call.

All randomness draws from the torch global RNG, so ``torch.manual_seed``
seeding in the reference (split seed 234, per-run ``seed_everything``)
reproduces runs exactly under this shim.
"""

import math

import torch


# --------------------------------------------------------------- small utils


def _num_nodes(edge_index, num_nodes=None):
    if num_nodes is not None:
        return int(num_nodes)
    return int(edge_index.max()) + 1 if edge_index.numel() else 0


def coalesce(edge_index, num_nodes=None):
    """Sort by (row, col) and drop duplicate edges."""
    n = _num_nodes(edge_index, num_nodes)
    key = edge_index[0].to(torch.long) * n + edge_index[1].to(torch.long)
    key = torch.unique(key, sorted=True)
    return torch.stack([key // n, key % n], dim=0)


def to_undirected(edge_index, num_nodes=None):
    """Concat with the flipped edges, then coalesce (PyG semantics)."""
    both = torch.cat([edge_index, edge_index.flip([0])], dim=-1)
    return coalesce(both, num_nodes)


def add_self_loops(edge_index, edge_attr=None, fill_value=None, num_nodes=None):
    n = _num_nodes(edge_index, num_nodes)
    loops = torch.arange(n, dtype=edge_index.dtype, device=edge_index.device)
    out = torch.cat([edge_index, torch.stack([loops, loops])], dim=-1)
    return out, edge_attr


def subgraph(subset, edge_index, edge_attr=None, relabel_nodes=False, num_nodes=None):
    """Edges whose both endpoints are in ``subset`` (bool mask or index
    tensor); optional dense relabeling in original node order."""
    if subset.dtype == torch.bool:
        mask = subset
    else:
        n = _num_nodes(edge_index, num_nodes)
        mask = torch.zeros(n, dtype=torch.bool)
        mask[subset] = True
    keep = mask[edge_index[0]] & mask[edge_index[1]]
    ei = edge_index[:, keep]
    attr = edge_attr[keep] if edge_attr is not None else None
    if relabel_nodes:
        relabel = torch.full((mask.numel(),), -1, dtype=torch.long)
        relabel[mask] = torch.arange(int(mask.sum()))
        ei = relabel[ei]
    return ei, attr


def to_networkx(*args, **kwargs):  # pragma: no cover - dead reference path
    raise NotImplementedError("refshim: to_networkx is import-surface only")


def k_hop_subgraph(*args, **kwargs):  # pragma: no cover - dead reference path
    raise NotImplementedError("refshim: k_hop_subgraph is import-surface only")


# ---------------------------------------------------------- negative sampling


def _directed_nonedge_perm(edge_index, n):
    """Random permutation of the complement of (edges ∪ self-loops) in
    flat row*n+col encoding."""
    mask = torch.ones(n, n, dtype=torch.bool)
    mask.fill_diagonal_(False)
    mask[edge_index[0], edge_index[1]] = False
    flat = mask.view(-1).nonzero(as_tuple=False).view(-1)
    return flat[torch.randperm(flat.numel())]


def negative_sampling(
    edge_index,
    num_nodes=None,
    num_neg_samples=None,
    method="sparse",
    force_undirected=False,
):
    """Uniform non-edges, excluding self-loops (PyG semantics; exact
    complement sampling without replacement — see refshim README).

    ``force_undirected=True`` samples ``num_neg_samples // 2`` upper-triangle
    pairs and returns both directions (PyG 2.x behavior: the caller-visible
    negative set contains each undirected pair twice).
    """
    del method  # dense/sparse only differ in PyG's internal strategy
    n = _num_nodes(edge_index, num_nodes)
    if num_neg_samples is None:
        num_neg_samples = edge_index.size(1)

    if force_undirected:
        m = num_neg_samples // 2
        und = to_undirected(edge_index, n)
        mask = torch.ones(n, n, dtype=torch.bool).triu(diagonal=1)
        mask[und[0], und[1]] = False
        flat = mask.view(-1).nonzero(as_tuple=False).view(-1)
        pick = flat[torch.randperm(flat.numel())[:m]]
        row, col = pick // n, pick % n
        return torch.stack(
            [torch.cat([row, col]), torch.cat([col, row])], dim=0
        )

    perm = _directed_nonedge_perm(edge_index, n)
    pick = perm[:num_neg_samples]
    return torch.stack([pick // n, pick % n], dim=0)


# ----------------------------------------------------- train_test_split_edges


def train_test_split_edges(data, val_ratio=0.05, test_ratio=0.1):
    """The deprecated PyG splitter the reference's ``do_edge_split`` drives
    (``src/utils.py:62-72``): upper-triangle permute/split, symmetrized
    (coalesced) train positives, val/test negatives drawn from the
    upper-triangle non-edge complement; sets ``train_neg_adj_mask``."""
    num_nodes = data.num_nodes
    row, col = data.edge_index
    edge_attr = data.edge_attr
    data.edge_index = None
    data.edge_attr = None

    mask = row < col
    row, col = row[mask], col[mask]
    if edge_attr is not None:
        edge_attr = edge_attr[mask]

    n_v = int(math.floor(val_ratio * row.size(0)))
    n_t = int(math.floor(test_ratio * row.size(0)))

    perm = torch.randperm(row.size(0))
    row, col = row[perm], col[perm]

    r, c = row[:n_v], col[:n_v]
    data.val_pos_edge_index = torch.stack([r, c], dim=0)
    r, c = row[n_v : n_v + n_t], col[n_v : n_v + n_t]
    data.test_pos_edge_index = torch.stack([r, c], dim=0)
    r, c = row[n_v + n_t :], col[n_v + n_t :]
    data.train_pos_edge_index = torch.stack([r, c], dim=0)
    data.train_pos_edge_index = to_undirected(data.train_pos_edge_index, num_nodes)

    neg_adj_mask = torch.ones(num_nodes, num_nodes, dtype=torch.bool)
    neg_adj_mask = neg_adj_mask.triu(diagonal=1)
    neg_adj_mask[row, col] = False

    neg_row, neg_col = neg_adj_mask.nonzero(as_tuple=False).t()
    perm = torch.randperm(neg_row.size(0))[: n_v + n_t]
    neg_row, neg_col = neg_row[perm], neg_col[perm]

    neg_adj_mask[neg_row, neg_col] = False
    data.train_neg_adj_mask = neg_adj_mask

    r, c = neg_row[:n_v], neg_col[:n_v]
    data.val_neg_edge_index = torch.stack([r, c], dim=0)
    r, c = neg_row[n_v:], neg_col[n_v:]
    data.test_neg_edge_index = torch.stack([r, c], dim=0)

    return data
