"""Seeded host-side dataset splitters (numpy), semantics-matched to the
reference's splitters.

* :func:`do_edge_split` — the SEAL-style transductive split (reference
  ``src/utils.py:62-105``): 5% val / 10% test of the unique undirected edges,
  train edges re-symmetrized, val/test negatives drawn without replacement
  from the i<j non-edges, train negatives drawn with the self-loop-augmented
  train graph excluded (one per directed train edge).
* :func:`do_production_edge_split` — the 8-step inductive "production" split
  (reference ``src/generate_production_split.py:32-95``): old/new node split,
  per-bucket (old-old / old-new / new-new) edge splits, relabeled training
  graph, RandomLinkSplit-style train/val message-passing split, merged
  inference graph, and one global shared negative set.

Exact torch RNG parity is impossible (different generators); parity is
distributional, with the split *structure* (set sizes, symmetry, disjointness,
bucket membership) matched exactly and property-tested.  Fixed seed 234 by
default, as in the reference.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict

import numpy as np


def _unique_undirected(edge_index: np.ndarray, num_nodes: int) -> np.ndarray:
    """Unique i<j pairs of an undirected (both-directions) edge list, (2, M)."""
    src, dst = edge_index
    mask = src < dst
    keys = np.unique(src[mask].astype(np.int64) * num_nodes + dst[mask].astype(np.int64))
    return np.stack([keys // num_nodes, keys % num_nodes])


def _sample_nonedges_upper(
    rng: np.random.Generator,
    num_samples: int,
    num_nodes: int,
    forbidden_keys: np.ndarray,
    *,
    distinct: bool = True,
) -> np.ndarray:
    """Sample i<j pairs avoiding ``forbidden_keys`` (sorted u*N+v keys).

    ``distinct=True`` rejects duplicates too (torch's mask-based sampler draws
    without replacement).  Rejection loop on the host — cheap at these scales.
    """
    out = np.empty((0,), dtype=np.int64)
    forbidden = np.sort(forbidden_keys)
    max_rounds = 64
    for _ in range(max_rounds):
        need = num_samples - out.size
        if need <= 0:
            break
        m = int(need * 1.5) + 16
        a = rng.integers(0, num_nodes, size=m)
        b = rng.integers(0, num_nodes, size=m)
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        ok = lo < hi
        keys = lo[ok].astype(np.int64) * num_nodes + hi[ok].astype(np.int64)
        idx = np.searchsorted(forbidden, keys)
        idx = np.clip(idx, 0, max(forbidden.size - 1, 0))
        if forbidden.size:
            keys = keys[forbidden[idx] != keys]
        if distinct:
            # Dedup in DRAW ORDER — setdiff1d/unique return SORTED keys, and
            # truncating a sorted oversample below keeps only the smallest
            # keys, biasing the whole set toward low node ids (a real bug
            # this code shipped with: mean sampled endpoint measured ~N/5
            # instead of N/3). Rejection sampling stays uniform only if
            # survivors keep their draw order.
            first = np.sort(np.unique(keys, return_index=True)[1])
            keys = keys[first]
            if out.size:
                so = np.sort(out)
                pos = np.clip(np.searchsorted(so, keys), 0, so.size - 1)
                keys = keys[so[pos] != keys]
        out = np.concatenate([out, keys])[:num_samples] if keys.size else out
    if out.size < num_samples:
        raise RuntimeError("could not sample enough non-edges")
    if distinct:
        out = out[rng.permutation(out.size)]
    return np.stack([out // num_nodes, out % num_nodes])


def _sample_nonedges_any_direction(
    rng: np.random.Generator,
    num_samples: int,
    num_nodes: int,
    forbidden_keys: np.ndarray,
) -> np.ndarray:
    """Sample ordered (i, j) pairs avoiding ``forbidden_keys`` (with repl.)."""
    forbidden = np.sort(forbidden_keys)
    out_a = np.empty((0,), dtype=np.int64)
    out_b = np.empty((0,), dtype=np.int64)
    for _ in range(64):
        need = num_samples - out_a.size
        if need <= 0:
            break
        m = int(need * 1.3) + 16
        a = rng.integers(0, num_nodes, size=m)
        b = rng.integers(0, num_nodes, size=m)
        keys = a.astype(np.int64) * num_nodes + b.astype(np.int64)
        if forbidden.size:
            idx = np.clip(np.searchsorted(forbidden, keys), 0, forbidden.size - 1)
            ok = forbidden[idx] != keys
            a, b = a[ok], b[ok]
        out_a = np.concatenate([out_a, a])[:num_samples]
        out_b = np.concatenate([out_b, b])[:num_samples]
    if out_a.size < num_samples:
        raise RuntimeError("could not sample enough non-edges")
    return np.stack([out_a, out_b])


def do_edge_split(
    x: np.ndarray,
    edge_index: np.ndarray,
    *,
    val_ratio: float = 0.05,
    test_ratio: float = 0.1,
    seed: int = 234,
    fast_split: bool = False,
) -> Dict[str, Dict[str, np.ndarray]]:
    """SEAL-style transductive split (reference utils.py:62-105).

    Returns the reference's ``split_edge`` dict: edges as (M, 2) arrays under
    ``split_edge[{'train','valid','test'}][{'edge','edge_neg'}]``.

    ``fast_split=True`` reproduces the reference's fast path (utils.py:74-96):
    train positives stay single-direction (NOT re-symmetrized), and all
    negatives come from one shared any-direction draw that only excludes real
    edges — so "(i,j) and (j,i) may both appear" and self-loops are possible,
    exactly as the reference comments warn.
    """
    num_nodes = int(x.shape[0])
    rng = np.random.default_rng(seed)
    uniq = _unique_undirected(edge_index, num_nodes)  # (2, M) i<j
    m = uniq.shape[1]
    n_v = int(np.floor(val_ratio * m))
    n_t = int(np.floor(test_ratio * m))
    perm = rng.permutation(m)
    uniq = uniq[:, perm]
    val_pos = uniq[:, :n_v]
    test_pos = uniq[:, n_v : n_v + n_t]
    train_uniq = uniq[:, n_v + n_t :]

    if fast_split:
        all_keys_f = (
            edge_index[0].astype(np.int64) * num_nodes
            + edge_index[1].astype(np.int64)
        )
        neg = _sample_nonedges_any_direction(rng, m, num_nodes, np.sort(all_keys_f))
        return {
            "train": {
                "edge": train_uniq.T.copy(),
                "edge_neg": neg[:, n_v + n_t :].T.copy(),
            },
            "valid": {"edge": val_pos.T.copy(), "edge_neg": neg[:, :n_v].T.copy()},
            "test": {
                "edge": test_pos.T.copy(),
                "edge_neg": neg[:, n_v : n_v + n_t].T.copy(),
            },
        }

    train_pos = np.concatenate([train_uniq, train_uniq[::-1]], axis=1)  # undirected

    # val/test negatives: i<j non-edges of the FULL graph, without replacement
    # (train_test_split_edges' neg_adj_mask path).
    all_keys = (
        uniq[0].astype(np.int64) * num_nodes + uniq[1].astype(np.int64)
    )
    neg = _sample_nonedges_upper(rng, n_v + n_t, num_nodes, all_keys)
    val_neg = neg[:, :n_v]
    test_neg = neg[:, n_v:]

    # train negatives: any-direction pairs excluding train edges + self-loops
    # (do_edge_split's negative_sampling over add_self_loops(train), one per
    # directed train edge).
    tr_keys = train_pos[0].astype(np.int64) * num_nodes + train_pos[1].astype(np.int64)
    loop_keys = np.arange(num_nodes, dtype=np.int64) * num_nodes + np.arange(
        num_nodes, dtype=np.int64
    )
    train_neg = _sample_nonedges_any_direction(
        rng, train_pos.shape[1], num_nodes, np.concatenate([tr_keys, loop_keys])
    )

    return {
        "train": {"edge": train_pos.T.copy(), "edge_neg": train_neg.T.copy()},
        "valid": {"edge": val_pos.T.copy(), "edge_neg": val_neg.T.copy()},
        "test": {"edge": test_pos.T.copy(), "edge_neg": test_neg.T.copy()},
    }


def _split_edges_bucket(
    rng: np.random.Generator,
    edge_index: np.ndarray,
    val_ratio: float,
    test_ratio: float,
):
    """Reference split_edges (generate_production_split.py:14-30).

    Dedup via src<=dst, shuffle, split; train and val re-symmetrized, test
    kept single-direction.
    """
    src, dst = edge_index
    mask = src <= dst
    idx = np.where(mask)[0]
    idx = idx[rng.permutation(idx.size)]
    num_val = int(val_ratio * idx.size)
    num_test = int(test_ratio * idx.size)
    num_train = idx.size - num_val - num_test
    tr = edge_index[:, idx[:num_train]]
    va = edge_index[:, idx[num_train : num_train + num_val]]
    te = edge_index[:, idx[num_train + num_val :]]
    tr = np.concatenate([tr, tr[::-1]], axis=1)
    va = np.concatenate([va, va[::-1]], axis=1)
    return tr, va, te


@dataclass
class ProductionSplit:
    """The 6-tuple artifact contract of the production splitter
    (reference generate_production_split.py:158 / train_teacher_gnn.py:347-366),
    flattened into named numpy arrays.

    Training graph node ids are relabeled to 0..n_old-1 (old nodes sorted by
    original id); inference/test/val-label edges use original ids.
    """

    training_x: np.ndarray          # (n_old, D)
    training_edge_index: np.ndarray  # (2, E_tr_msg) message+positive edges, symmetric, relabeled
    val_x: np.ndarray               # == training_x (val graph = old nodes)
    val_edge_index: np.ndarray      # (2, E_tr_msg) message graph for validation
    val_pos: np.ndarray             # (2, V) held-out val label edges (relabeled)
    val_neg: np.ndarray             # (2, V) sampled val negatives (relabeled)
    inference_x: np.ndarray         # (N, D) all nodes
    inference_edge_index: np.ndarray  # (2, E_inf) original ids
    test_old_old: np.ndarray        # (2, *) original ids, single direction
    test_old_new: np.ndarray
    test_new_new: np.ndarray
    test_merged: np.ndarray
    negative_samples: np.ndarray    # (2, Q) global shared negatives
    old_nodes: np.ndarray           # (n_old,) original ids of old nodes (sorted)
    new_nodes: np.ndarray           # original ids of new nodes


def do_production_edge_split(
    x: np.ndarray,
    edge_index: np.ndarray,
    *,
    test_ratio: float,
    val_node_ratio: float,
    val_ratio: float,
    old_old_extra_ratio: float = 0.1,
    seed: int = 234,
) -> ProductionSplit:
    """8-step production split (reference generate_production_split.py:32-95)."""
    num_nodes = int(x.shape[0])
    rng = np.random.default_rng(seed)
    edge_index = np.asarray(edge_index, dtype=np.int64)

    # Global negatives: round(test_ratio * E / 2) with force_undirected —
    # PyG's force_undirected sampler draws num//2 unique i<j pairs and
    # returns BOTH directions (2·(num//2) columns, each undirected negative
    # twice).  Reproduced exactly: the production evaluator thresholds
    # hits@K on this duplicated set (generate_production_split.py:46-47,
    # train_teacher_gnn.py:169,219-223), so the duplication is part of the
    # metric protocol (golden-gated in test_reference_golden.py).
    num_negatives = round(test_ratio * edge_index.shape[1] / 2)
    all_uniq = _unique_undirected(edge_index, num_nodes)
    all_keys = all_uniq[0] * num_nodes + all_uniq[1]
    neg_upper = _sample_nonedges_upper(
        rng, num_negatives // 2, num_nodes, all_keys
    )
    negative_samples = np.concatenate([neg_upper, neg_upper[::-1]], axis=1)

    # Step 1: old (train_mask) vs new (test_mask) nodes.
    n_new = int(round(val_node_ratio * num_nodes))
    perm = rng.permutation(num_nodes)
    new_nodes = np.sort(perm[:n_new])
    new_mask = np.zeros(num_nodes, dtype=bool)
    new_mask[new_nodes] = True
    old_mask = ~new_mask
    old_nodes = np.where(old_mask)[0]

    rows, cols = edge_index

    # Step 2: old-old edges -> train / val(extra) / test.
    oo = old_mask[rows] & old_mask[cols]
    old_old_train, old_old_val, old_old_test = _split_edges_bucket(
        rng, edge_index[:, oo], old_old_extra_ratio, test_ratio
    )

    # Step 3: old-new edges -> train / test (no val).
    on = (old_mask[rows] & new_mask[cols]) | (new_mask[rows] & old_mask[cols])
    old_new_train, _, old_new_test = _split_edges_bucket(
        rng, edge_index[:, on], 0.0, test_ratio
    )

    # Step 4: new-new edges -> train / test.
    nn = new_mask[rows] & new_mask[cols]
    new_new_train, _, new_new_test = _split_edges_bucket(
        rng, edge_index[:, nn], 0.0, test_ratio
    )

    # Step 5: merged test bundle.
    test_merged = np.concatenate([old_old_test, old_new_test, new_new_test], axis=1)

    # Step 6: training graph = subgraph(old nodes, old_old_train, relabel=True).
    relabel = -np.ones(num_nodes, dtype=np.int64)
    relabel[old_nodes] = np.arange(old_nodes.size)
    training_only_ei = relabel[old_old_train]
    training_only_x = x[old_nodes]

    # Step 7: RandomLinkSplit(num_val=0, num_test=val_ratio, is_undirected=True)
    # on the training graph: hold out val_ratio of the unique edges as val
    # labels; remaining edges (symmetric) are the message/positive graph for
    # BOTH training_data and val_data; val negatives sampled 1:1 from the
    # training graph's non-edges.
    n_old = old_nodes.size
    tr_uniq = _unique_undirected(training_only_ei, n_old)
    mu = tr_uniq.shape[1]
    n_val = int(np.floor(val_ratio * mu))
    p = rng.permutation(mu)
    val_label = tr_uniq[:, p[:n_val]]
    keep = tr_uniq[:, p[n_val:]]
    msg_ei = np.concatenate([keep, keep[::-1]], axis=1)
    tr_keys = tr_uniq[0] * n_old + tr_uniq[1]
    val_neg = _sample_nonedges_upper(rng, n_val, n_old, tr_keys)

    # Step 8: inference graph over ALL nodes (original ids).
    inference_edge_index = np.concatenate(
        [old_old_train, old_old_val, old_new_train, new_new_train], axis=1
    )

    return ProductionSplit(
        training_x=np.asarray(training_only_x, dtype=np.float32),
        training_edge_index=msg_ei.astype(np.int64),
        val_x=np.asarray(training_only_x, dtype=np.float32),
        val_edge_index=msg_ei.astype(np.int64),
        val_pos=val_label.astype(np.int64),
        val_neg=val_neg.astype(np.int64),
        inference_x=np.asarray(x, dtype=np.float32),
        inference_edge_index=inference_edge_index.astype(np.int64),
        test_old_old=old_old_test.astype(np.int64),
        test_old_new=old_new_test.astype(np.int64),
        test_new_new=new_new_test.astype(np.int64),
        test_merged=test_merged.astype(np.int64),
        negative_samples=negative_samples.astype(np.int64),
        old_nodes=old_nodes,
        new_nodes=new_nodes,
    )
