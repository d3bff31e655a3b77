"""Halo exchange comm-volume accounting (VERDICT r3, item 4).

The overlap story for the halo SpMM cannot be measured on one chip, but its
COMMUNICATION VOLUME is statically checkable: the rows device q sends
requester p must be exactly the true boundary set B(q,p) = unique remote
senders owned by q among p's received edges — no more (silent over-padding
inflates every exchange), no fewer (missing rows corrupt aggregation).
These tests recompute the boundary sets independently from the raw edge
list and pin ``build_halo_partition``'s plan to them; the bytes model the
numbers feed is recorded in BASELINE.md (halo comm-volume section).
"""

from __future__ import annotations

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from llp_tpu.core.graph import build_graph  # noqa: E402
from llp_tpu.parallel.halo import build_halo_partition  # noqa: E402


def _random_graph(rng, n, e, weighted=False):
    src = rng.integers(0, n, size=e)
    dst = rng.integers(0, n, size=e)
    keep = src != dst
    ei = np.stack([src[keep], dst[keep]])
    w = rng.random(ei.shape[1]).astype(np.float32) + 0.1 if weighted else None
    return build_graph(ei, n, edge_weight=w)


def _true_boundary_sets(graph, p_, n_per):
    """B[q][p] = sorted q-local rows requester p needs from owner q."""
    e = graph.num_edges
    send = np.asarray(graph.senders)[:e].astype(np.int64)
    recv = np.asarray(graph.receivers)[:e].astype(np.int64)
    b = [[np.zeros(0, np.int64) for _ in range(p_)] for _ in range(p_)]
    for p in range(p_):
        es = send[recv // n_per == p]
        remote = np.unique(es[es // n_per != p])
        for q in range(p_):
            rows = remote[remote // n_per == q]
            b[q][p] = rows - q * n_per
    return b


@pytest.mark.parametrize("seed,n,e,p_", [(0, 97, 600, 4), (1, 256, 3000, 8), (2, 50, 120, 4)])
@pytest.mark.parametrize("weighted", [False, True])
def test_halo_plan_matches_true_boundary_sets(seed, n, e, p_, weighted):
    rng = np.random.default_rng(seed)
    graph = _random_graph(rng, n, e, weighted)
    part = build_halo_partition(graph, p_)
    n_per = part.n_per
    b = _true_boundary_sets(graph, p_, n_per)

    # m — the padded per-(owner,requester) slot count — must be EXACTLY the
    # largest true boundary set (>=1 for the degenerate empty case): any
    # larger silently inflates every exchange buffer.
    true_m = max(
        (len(b[q][p]) for q in range(p_) for p in range(p_)), default=0
    )
    assert part.m == max(true_m, 1)

    send_idx = np.asarray(part.send_idx)
    for q in range(p_):
        for p in range(p_):
            rows = b[q][p]
            got = send_idx[q, p]
            # the first |B| slots are the sorted boundary rows...
            np.testing.assert_array_equal(got[: len(rows)], rows)
            # ...and the tail is zero padding (gathering row 0 — harmless
            # duplicate traffic already counted by the bytes model).
            assert (got[len(rows):] == 0).all()

    # Edge conservation: every real edge lands in exactly one local or
    # remote slot of its receiver's shard (pad receivers point at n_per).
    e_real = graph.num_edges
    n_loc = int((np.asarray(part.loc_recv) < n_per).sum())
    n_rem = int((np.asarray(part.rem_recv) < n_per).sum())
    assert n_loc + n_rem == e_real

    if weighted:
        w = np.asarray(graph.edge_weight)[:e_real]
        tot = float(np.asarray(part.loc_w).sum() + np.asarray(part.rem_w).sum())
        assert tot == pytest.approx(float(w.sum()), rel=1e-5)


def test_halo_bytes_model_collab_scale():
    """The BASELINE.md comm-volume table's inputs, regenerated and pinned:
    per-aggregation bytes for halo exchange (padded P·(P-1)·m rows/device)
    vs full feature replication vs psum-DP partial aggregates."""
    rng = np.random.default_rng(7)
    n, e, p_, d = 4096, 40000, 8, 128
    graph = _random_graph(rng, n, e)
    part = build_halo_partition(graph, p_)
    b = _true_boundary_sets(graph, p_, part.n_per)
    true_rows = sum(len(b[q][p]) for q in range(p_) for p in range(p_) if q != p)
    padded_rows = p_ * (p_ - 1) * part.m  # all_to_all buffers, self excluded

    halo_bytes = padded_rows * d * 4
    replicate_bytes = p_ * (n - part.n_per) * d * 4  # all_gather the rest
    psum_bytes = p_ * n * d * 4                      # psum of partial aggs

    # Padding overhead is bounded: m is the max boundary set, so padded
    # traffic is at most P(P-1)/sum-ratio of true; on uniform random graphs
    # the groups are balanced and the ratio stays small.
    assert padded_rows >= true_rows
    assert padded_rows <= 2 * true_rows
    # The design premise: the halo exchange moves far fewer bytes than
    # either replication strategy at sparse boundaries.
    assert halo_bytes < replicate_bytes
    assert halo_bytes < psum_bytes


def test_locality_reorder_shrinks_halo_volume():
    """The round-4 partitioner closes the BASELINE.md caveat ('under a plain
    range partition halo beats replication only 1.35x ... the structural
    lever is locality-aware node ordering'): relabeling with locality_order
    before partitioning must shrink BOTH the padded plan (m) and the true
    exchanged rows on a community graph — here by >= 2x."""
    from llp_tpu.data.partition import locality_order
    from llp_tpu.data.reorder import apply_order
    from llp_tpu.data.synthetic import sbm_graph

    n, p_ = 4000, 8
    ei, _ = sbm_graph(n, 16, 10.0, seed=5)
    x = np.zeros((n, 1), np.float32)
    g0 = build_graph(ei, n)
    part0 = build_halo_partition(g0, p_)
    order = locality_order(ei, n, p_)
    _, ei2, _ = apply_order(x, ei, order)
    g1 = build_halo_partition(build_graph(ei2, n), p_)

    def true_rows(g, part):
        b = _true_boundary_sets(g, p_, part.n_per)
        return sum(len(b[q][p]) for q in range(p_) for p in range(p_))

    r0 = true_rows(g0, part0)
    r1 = true_rows(build_graph(ei2, n), g1)
    assert r1 * 2 < r0, (r0, r1)
    # The PADDED plan (m = max pair) improves less than the true rows: the
    # locality partition skews the per-pair boundary sizes, and the static
    # all_to_all pads every pair to the max (collab-scale measurements:
    # m shrinks 1.3-1.7x while true rows shrink 2-4x — BASELINE.md).
    assert g1.m <= part0.m
