"""SpMM vs dense adjacency reference (SURVEY.md §4: per-kernel unit tests)."""

import jax.numpy as jnp
import numpy as np
import pytest

from llp_tpu.core import build_graph
from llp_tpu.ops import spmm


def _dense_ref(A, x, reduce):
    x = np.asarray(x, np.float64)
    if reduce == "sum":
        return A @ x
    if reduce == "mean":
        deg = A.sum(1, keepdims=True)
        return (A @ x) / np.maximum(deg, 1.0)
    out = np.zeros((A.shape[0], x.shape[1]))
    for v in range(A.shape[0]):
        nbrs = np.where(A[v] > 0)[0]
        if nbrs.size:
            out[v] = x[nbrs].max(0)
    return out


@pytest.mark.parametrize("reduce", ["sum", "mean", "max"])
def test_spmm_matches_dense(small_graph, rng, reduce):
    g, A, ei, _ = small_graph
    x = jnp.asarray(rng.normal(size=(g.num_nodes, 24)), jnp.float32)
    out = np.asarray(spmm(g, x, reduce))
    ref = _dense_ref(A, x, reduce)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_spmm_isolated_nodes(rng):
    # Node 4 has no in-edges: mean and max must be exactly 0 (torch_sparse
    # empty-row convention, sageconv_updated.py:86-89).
    ei = np.array([[0, 1, 2], [1, 2, 0]])
    g = build_graph(ei, 5)
    x = jnp.asarray(rng.normal(size=(5, 8)), jnp.float32)
    for reduce in ("sum", "mean", "max"):
        out = np.asarray(spmm(g, x, reduce))
        np.testing.assert_array_equal(out[4], np.zeros(8))
        np.testing.assert_array_equal(out[3], np.zeros(8))


def test_spmm_edge_weight(small_graph, rng):
    g, A, ei, _ = small_graph
    x = jnp.asarray(rng.normal(size=(g.num_nodes, 16)), jnp.float32)
    w = jnp.asarray(rng.random(g.num_padded_edges), jnp.float32)
    out = np.asarray(spmm(g, x, "sum", edge_weight=w))
    # Weights align with the graph's canonical (receiver-sorted) edge order.
    Aw = np.zeros_like(A)
    wn = np.asarray(w)
    send = np.asarray(g.senders)
    recv = np.asarray(g.receivers)
    for e in range(g.num_edges):
        Aw[recv[e], send[e]] += wn[e]
    np.testing.assert_allclose(out, Aw @ np.asarray(x, np.float64), atol=1e-4)


def test_spmm_bf16_accumulates_fp32(small_graph, rng):
    g, A, _, _ = small_graph
    x32 = jnp.asarray(rng.normal(size=(g.num_nodes, 32)), jnp.float32)
    out_bf = np.asarray(spmm(g, x32.astype(jnp.bfloat16), "sum").astype(jnp.float32))
    ref = _dense_ref(A, np.asarray(x32), "sum")
    # bf16 inputs, fp32 accumulation: error bounded by input rounding only.
    assert np.abs(out_bf - ref).max() < 0.15
