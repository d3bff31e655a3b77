"""Property tests for the PRNG-keyed samplers (SURVEY.md §4: degree-respecting
walks, no-false-negative negatives)."""

import jax
import jax.numpy as jnp
import numpy as np

from llp_tpu.core import build_graph
from llp_tpu.sample import (
    edge_hash_keys,
    random_walk,
    sample_contexts,
    sample_negative_edges,
    sample_uniform_edges,
)


def test_negative_edges_avoid_exclusion_set(small_graph):
    g, _, ei, _ = small_graph
    keys = jnp.asarray(edge_hash_keys(ei, g.num_nodes))
    neg = np.asarray(
        sample_negative_edges(jax.random.PRNGKey(0), keys, 500, g.num_nodes)
    )
    forbidden = set(map(tuple, ei.T.tolist()))
    hits = sum((int(a), int(b)) in forbidden for a, b in neg.T)
    assert hits == 0
    assert neg.shape == (2, 500)
    assert neg.min() >= 0 and neg.max() < g.num_nodes


def test_negative_edges_force_undirected(small_graph):
    g, _, ei, _ = small_graph
    keys = jnp.asarray(edge_hash_keys(ei, g.num_nodes))
    neg = np.asarray(
        sample_negative_edges(
            jax.random.PRNGKey(1), keys, 300, g.num_nodes, force_undirected=True
        )
    )
    assert (neg[0] < neg[1]).all()  # strictly upper: no self-loops
    forbidden = set(map(tuple, ei.T.tolist()))
    assert sum((int(a), int(b)) in forbidden for a, b in neg.T) == 0


def test_negative_edges_deterministic(small_graph):
    g, _, ei, _ = small_graph
    keys = jnp.asarray(edge_hash_keys(ei, g.num_nodes))
    a = sample_negative_edges(jax.random.PRNGKey(7), keys, 100, g.num_nodes)
    b = sample_negative_edges(jax.random.PRNGKey(7), keys, 100, g.num_nodes)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_uniform_edges_shape():
    e = sample_uniform_edges(jax.random.PRNGKey(0), 64, 1000)
    assert e.shape == (2, 64)
    assert int(e.max()) < 1000


def test_random_walk_follows_edges(small_graph):
    g, _, ei, _ = small_graph
    adj = {}
    for u, v in ei.T:
        adj.setdefault(int(u), set()).add(int(v))
    start = jnp.arange(g.num_nodes, dtype=jnp.int32)
    walk = np.asarray(random_walk(jax.random.PRNGKey(0), g, start, 4))
    assert walk.shape == (g.num_nodes, 5)
    for row in walk:
        for a, b in zip(row[:-1], row[1:]):
            if int(a) in adj:
                assert int(b) in adj[int(a)]
            else:
                assert int(b) == int(a)  # isolated: stay in place


def test_random_walk_isolated_node_stays():
    ei = np.array([[0, 1], [1, 0]])
    g = build_graph(ei, 3)
    walk = np.asarray(
        random_walk(jax.random.PRNGKey(0), g, jnp.asarray([2], jnp.int32), 3)
    )
    np.testing.assert_array_equal(walk, [[2, 2, 2, 2]])


def test_random_walk_uniform_over_neighbors():
    # Star center 0 with 4 leaves: 1-step distribution ~ uniform.
    ei = np.array([[0, 0, 0, 0, 1, 2, 3, 4], [1, 2, 3, 4, 0, 0, 0, 0]])
    g = build_graph(ei, 5)
    start = jnp.zeros((4000,), jnp.int32)
    walk = np.asarray(random_walk(jax.random.PRNGKey(3), g, start, 1))
    counts = np.bincount(walk[:, 1], minlength=5)[1:]
    assert counts.min() > 800  # E[count] = 1000

def test_sample_contexts_layout(small_graph):
    g, _, ei, _ = small_graph
    anchors = jnp.arange(10, dtype=jnp.int32)
    step, hops, ns_rate = 3, 2, 2
    s = np.asarray(
        sample_contexts(
            jax.random.PRNGKey(0),
            g,
            anchors,
            ps_method="nb",
            step=step,
            hops=hops,
            ns_rate=ns_rate,
        )
    )
    # (B, 1 + step*hops*(1+ns_rate)) with col 0 = anchor (main.py:45,183).
    assert s.shape == (10, 1 + step * hops * (1 + ns_rate))
    np.testing.assert_array_equal(s[:, 0], np.arange(10))


def test_sample_contexts_rw_mode(small_graph):
    g, _, _, _ = small_graph
    anchors = jnp.arange(6, dtype=jnp.int32)
    s = sample_contexts(
        jax.random.PRNGKey(1), g, anchors, ps_method="rw", step=2, hops=3, ns_rate=1
    )
    assert s.shape == (6, 1 + 2 * 3 * 2)
