"""Native (C++) sampler library: compilation, correctness, determinism."""

import numpy as np
import pytest

from llp_tpu.core import build_graph
from llp_tpu.data.synthetic import sbm_graph
from llp_tpu.native import (
    build_csr,
    native_available,
    random_walks,
    sample_negative_edges,
)


@pytest.fixture(scope="module")
def graph_np():
    ei, _ = sbm_graph(500, 4, 8.0, seed=3)
    row_ptr, col = build_csr(ei[0], ei[1], 500)
    return ei, row_ptr, col


def test_native_compiles():
    assert native_available(), "g++ build of sampler.cpp failed"


def test_build_csr_matches_graph_container(graph_np):
    ei, row_ptr, col = graph_np
    g = build_graph(ei, 500)
    np.testing.assert_array_equal(row_ptr, np.asarray(g.row_ptr))
    np.testing.assert_array_equal(col, np.asarray(g.col)[: ei.shape[1]])


def test_walks_follow_edges(graph_np):
    ei, row_ptr, col = graph_np
    adj = {}
    for u, v in ei.T:
        adj.setdefault(int(u), set()).add(int(v))
    starts = np.arange(500, dtype=np.int32)
    out = random_walks(row_ptr, col, starts, 5, seed=7)
    assert out.shape == (500, 6)
    np.testing.assert_array_equal(out[:, 0], starts)
    for row in out:
        for a, b in zip(row[:-1], row[1:]):
            if int(a) in adj:
                assert int(b) in adj[int(a)]
            else:
                assert int(b) == int(a)


def test_walks_deterministic(graph_np):
    _, row_ptr, col = graph_np
    starts = np.arange(100, dtype=np.int32)
    a = random_walks(row_ptr, col, starts, 8, seed=11)
    b = random_walks(row_ptr, col, starts, 8, seed=11)
    np.testing.assert_array_equal(a, b)
    c = random_walks(row_ptr, col, starts, 8, seed=12)
    assert not np.array_equal(a, c)


def test_walk_uniformity():
    ei = np.array([[0, 0, 0, 0, 1, 2, 3, 4], [1, 2, 3, 4, 0, 0, 0, 0]])
    row_ptr, col = build_csr(ei[0], ei[1], 5)
    starts = np.zeros(8000, np.int32)
    out = random_walks(row_ptr, col, starts, 1, seed=5)
    counts = np.bincount(out[:, 1], minlength=5)[1:]
    assert counts.min() > 1700  # E=2000 each

def test_negative_sampling_excludes(graph_np):
    ei, _, _ = graph_np
    n = 500
    keys = np.sort(ei[0].astype(np.int64) * n + ei[1].astype(np.int64))
    neg = sample_negative_edges(keys, n, 5000, seed=3)
    nk = neg[0].astype(np.int64) * n + neg[1].astype(np.int64)
    assert np.intersect1d(nk, keys).size == 0
    assert neg.min() >= 0 and neg.max() < n


def test_negative_sampling_large_n():
    # Beyond the on-device int32 limit: collab-scale node count.
    n = 250_000
    keys = np.sort(
        np.random.default_rng(0).integers(0, n * n, size=10_000, dtype=np.int64)
    )
    neg = sample_negative_edges(keys, n, 100_000, seed=9, force_undirected=True)
    assert (neg[0] < neg[1]).all()
    nk = neg[0].astype(np.int64) * n + neg[1].astype(np.int64)
    assert np.intersect1d(nk, keys).size == 0


def test_negative_sampling_deterministic(graph_np):
    ei, _, _ = graph_np
    keys = np.sort(ei[0].astype(np.int64) * 500 + ei[1].astype(np.int64))
    a = sample_negative_edges(keys, 500, 1000, seed=4)
    b = sample_negative_edges(keys, 500, 1000, seed=4)
    np.testing.assert_array_equal(a, b)
