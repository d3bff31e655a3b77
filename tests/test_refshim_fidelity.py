"""Refshim edge-case fidelity (VERDICT r4 weak #3).

The golden harness executes the REAL reference code, but the shim's
SAGEConv/GCNConv/negative_sampling/random_walk/Evaluator stand-ins are
re-implementations of PyG/OGB *public* semantics — a shared misreading of a
corner would pass every golden gate.  These tests pin the shim against the
DOCUMENTED corner behavior of the real libraries, each expectation
hand-computed from the upstream docs/source semantics (PyG 2.x
`torch_geometric.utils.scatter`, `gcn_norm`, `negative_sampling`;
torch_cluster CPU `random_walk`; OGB `Evaluator.eval` for ogbl-ddi):

1. scatter mean: empty target rows are 0 (degree clamp), not NaN.
2. scatter max: empty rows are 0, but rows whose messages are all negative
   keep the true (negative) max — the 0-fill applies only to EMPTY rows.
3. gcn_norm: improved=True uses self-loop fill 2.0; with
   add_self_loops=False an isolated node's deg^-1/2 = inf is zeroed.
4. negative_sampling(force_undirected=True): each sampled undirected pair
   is returned in BOTH directions (2*(num//2) columns), no self-loops, no
   collisions with the undirected edge set in either direction.
5. random_walk: a dead-end (out-degree-0) node repeats itself for the rest
   of the walk; every step follows a real out-edge.
6. OGB Evaluator: hits@K = 1.0 when #negatives < K; otherwise the
   strictly-greater-than-Kth-best-negative fraction.

Reference call sites these semantics feed: src/sageconv_updated.py:86-89,
src/models.py:56-80, src/main.py:37-50,81, src/utils.py:70-72,
src/train_teacher_gnn.py:119-145.
"""

import os
import sys

import pytest

torch = pytest.importorskip("torch")

_REFSHIM = os.path.join(os.path.dirname(__file__), "..", "tools", "refshim")
if os.path.abspath(_REFSHIM) not in [os.path.abspath(p) for p in sys.path]:
    sys.path.insert(0, os.path.abspath(_REFSHIM))


# ------------------------------------------------------------- scatter corners


def test_scatter_mean_isolated_rows_are_zero():
    from torch_geometric.nn.conv import _scatter

    msgs = torch.tensor([[2.0, 4.0], [6.0, 8.0], [1.0, 1.0]])
    idx = torch.tensor([0, 0, 2])
    out = _scatter(msgs, idx, dim_size=4, reduce="mean")
    # row 0: mean of two messages; rows 1 and 3: NO messages -> exactly 0
    # (PyG clamps the divisor, it does not emit NaN), row 2: single message.
    assert torch.equal(
        out, torch.tensor([[4.0, 6.0], [0.0, 0.0], [1.0, 1.0], [0.0, 0.0]])
    )
    assert not torch.isnan(out).any()


def test_scatter_max_zero_fill_only_for_empty_rows():
    from torch_geometric.nn.conv import _scatter

    msgs = torch.tensor([[-3.0], [-5.0], [2.0]])
    idx = torch.tensor([0, 0, 1])
    out = _scatter(msgs, idx, dim_size=3, reduce="max")
    # row 0's messages are all NEGATIVE: the max is -3 (scatter_reduce with
    # include_self=False — the 0 init does NOT participate for rows that
    # receive messages); row 2 is empty -> 0.
    assert torch.equal(out, torch.tensor([[-3.0], [2.0], [0.0]]))


def test_sageconv_isolated_node_output_is_linl_bias_plus_root():
    """End-to-end through SAGEConv: an isolated target aggregates 0, so its
    output is exactly lin_l.bias + lin_r(x_i) (lin_r bias-free in PyG)."""
    from torch_geometric.nn.conv import SAGEConv

    torch.manual_seed(0)
    conv = SAGEConv(3, 2)
    x = torch.randn(4, 3)
    # edges j->i: node 3 receives nothing
    ei = torch.tensor([[0, 1], [1, 2]])
    out = conv(x, ei)
    want_iso = conv.lin_l.bias + conv.lin_r(x[3])
    assert torch.allclose(out[3], want_iso, atol=1e-6)
    # and node 2 aggregates exactly x[1] (single in-edge)
    want_2 = conv.lin_l(x[1]) + conv.lin_r(x[2])
    assert torch.allclose(out[2], want_2, atol=1e-6)


# ----------------------------------------------------------------- gcn_norm


def test_gcn_norm_improved_fill_and_handcomputed_weights():
    from torch_geometric.nn.conv import gcn_norm

    # path graph 0-1 (both directions), n=2
    ei = torch.tensor([[0, 1], [1, 0]])
    _, w = gcn_norm(ei, num_nodes=2, improved=False)
    # deg-hat = 2 each; edge weight = 1/sqrt(2*2) = 0.5; self-loops 0.5
    assert torch.allclose(w, torch.tensor([0.5, 0.5, 0.5, 0.5]))
    _, w2 = gcn_norm(ei, num_nodes=2, improved=True)
    # improved: fill 2 -> deg-hat = 3; edges 1/3, self-loops 2/3
    assert torch.allclose(w2, torch.tensor([1 / 3, 1 / 3, 2 / 3, 2 / 3]))


def test_gcn_norm_isolated_node_inf_to_zero():
    from torch_geometric.nn.conv import gcn_norm

    ei = torch.tensor([[0, 1], [1, 0]])
    # n=3: node 2 is isolated; WITHOUT self-loops its deg^-1/2 = inf must be
    # zeroed (PyG masked_fill), never propagated.
    ei2, w = gcn_norm(ei, num_nodes=3, add_self_loops=False)
    assert torch.isfinite(w).all()
    assert ei2.size(1) == 2
    # with self-loops the isolated node's only weight is its self-loop 1/1
    ei3, w3 = gcn_norm(ei, num_nodes=3, add_self_loops=True)
    iso_self = (ei3[0] == 2) & (ei3[1] == 2)
    assert torch.allclose(w3[iso_self], torch.tensor([1.0]))
    assert torch.isfinite(w3).all()


# ------------------------------------------------------- negative_sampling


def test_negative_sampling_force_undirected_pair_semantics():
    from torch_geometric.utils import negative_sampling

    torch.manual_seed(3)
    n = 12
    ei = torch.tensor([[0, 1, 2, 3, 4], [1, 2, 3, 4, 5]])
    neg = negative_sampling(
        ei, num_nodes=n, num_neg_samples=7, force_undirected=True
    )
    # PyG 2.x: samples num//2 undirected pairs, returns BOTH directions ->
    # 2*(7//2) = 6 columns; first half mirrors second half.
    assert neg.size(1) == 6
    m = neg.size(1) // 2
    assert torch.equal(neg[0, :m], neg[1, m:])
    assert torch.equal(neg[1, :m], neg[0, m:])
    # no self-loops, no true edges in either direction
    assert (neg[0] != neg[1]).all()
    true_set = {(int(a), int(b)) for a, b in ei.t().tolist()}
    true_set |= {(b, a) for a, b in true_set}
    for a, b in neg.t().tolist():
        assert (a, b) not in true_set


# ------------------------------------------------------------- random_walk


def test_random_walk_dead_end_repeats_and_edges_followed():
    import torch_cluster

    torch.manual_seed(0)
    # directed star into node 3: 0->3, 1->3, 2->3; 3 has NO out-edges
    row = torch.tensor([0, 1, 2])
    col = torch.tensor([3, 3, 3])
    walks = torch_cluster.random_walk(
        row, col, torch.tensor([0, 3]), walk_length=4, num_nodes=4
    )
    assert walks.shape == (2, 5)
    # from 0: one hop to 3, then stuck at 3 (torch_cluster CPU semantics:
    # a node with no neighbors stays in place)
    assert walks[0].tolist() == [0, 3, 3, 3, 3]
    # starting AT the dead end: the whole walk is the start node
    assert walks[1].tolist() == [3, 3, 3, 3, 3]
    # and every transition is a real edge or a dead-end self-repeat
    edges = {(0, 3), (1, 3), (2, 3)}
    for r in walks:
        for a, b in zip(r[:-1].tolist(), r[1:].tolist()):
            assert (a, b) in edges or (a == b and a == 3)


# ---------------------------------------------------------------- Evaluator


def test_evaluator_fewer_than_k_negatives_is_one():
    from ogb.linkproppred import Evaluator

    ev = Evaluator("ogbl-ddi")
    ev.K = 20
    out = ev.eval({
        "y_pred_pos": torch.tensor([0.1, 0.2]),
        "y_pred_neg": torch.zeros(19),  # < K negatives
    })
    # OGB's _eval_hits: if len(neg) < K the metric is defined as 1.0
    assert out["hits@20"] == 1.0


def test_evaluator_threshold_is_strictly_greater_than_kth_best():
    from ogb.linkproppred import Evaluator

    ev = Evaluator("ogbl-ddi")
    ev.K = 3
    neg = torch.tensor([0.9, 0.8, 0.7, 0.1, 0.2])  # 3rd best = 0.7
    pos = torch.tensor([0.95, 0.7, 0.71, 0.1])
    out = ev.eval({"y_pred_pos": pos, "y_pred_neg": neg})
    # strictly greater: 0.95 and 0.71 count, 0.7 (== kth) does NOT
    assert out["hits@3"] == pytest.approx(2 / 4)
