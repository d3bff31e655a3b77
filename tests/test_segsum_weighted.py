"""Edge-weighted blocked-segsum SpMM: parity + both grads vs the XLA path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llp_tpu.core import build_graph
from llp_tpu.data.synthetic import sbm_graph
from llp_tpu.ops import spmm
from llp_tpu.ops.pallas.segsum_kernel import prepare_segsum


@pytest.fixture(scope="module")
def wgraph():
    ei, _ = sbm_graph(300, 4, 8.0, seed=21)
    g = build_graph(ei, 300)
    prepare_segsum(g, weighted=True)
    rng = np.random.default_rng(5)
    # Canonical-order padded weights; values past num_edges are garbage on
    # purpose (the weighted path must ignore them).
    w = rng.normal(size=(g.num_padded_edges,)).astype(np.float32)
    w[g.num_edges:] = 777.0
    return g, jnp.asarray(w)


@pytest.mark.parametrize("reduce", ["sum", "mean"])
def test_weighted_segsum_matches_xla(wgraph, reduce):
    g, w = wgraph
    x = jnp.asarray(np.random.default_rng(0).normal(size=(300, 40)), jnp.float32)
    a = np.asarray(spmm(g, x, reduce, edge_weight=w, impl="xla"))
    b = np.asarray(spmm(g, x, reduce, edge_weight=w, impl="segsum"))
    np.testing.assert_allclose(a, b, atol=1e-4)


@pytest.mark.parametrize("reduce", ["sum", "mean"])
def test_weighted_segsum_grads_match_xla(wgraph, reduce):
    g, w = wgraph
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(300, 24)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(24,)), jnp.float32)

    def loss(impl):
        return lambda xx, ww: jnp.sum(
            jnp.tanh(spmm(g, xx, reduce, edge_weight=ww, impl=impl)) * v
        )

    gxa, gwa = jax.grad(loss("xla"), argnums=(0, 1))(x, w)
    gxb, gwb = jax.grad(loss("segsum"), argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gxa), np.asarray(gxb), atol=1e-4)
    # The XLA path differentiates through the masked-message expression, so
    # its dw is 0 on padded entries too — both must agree everywhere.
    np.testing.assert_allclose(np.asarray(gwa), np.asarray(gwb), atol=1e-4)
    assert np.all(np.asarray(gwb)[g.num_edges:] == 0.0)


def test_weighted_segsum_inside_jit_after_prepare(wgraph):
    g, w = wgraph
    x = jnp.asarray(np.random.default_rng(3).normal(size=(300, 16)), jnp.float32)

    @jax.jit
    def f(graph, xx, ww):
        return spmm(graph, xx, "mean", edge_weight=ww, impl="segsum")

    out = np.asarray(f(g, x, w))
    ref = np.asarray(spmm(g, x, "mean", edge_weight=w, impl="xla"))
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_weighted_segsum_unprepared_tracer_falls_back():
    ei, _ = sbm_graph(100, 3, 5.0, seed=22)
    g = build_graph(ei, 100)
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.normal(size=(100, 8)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(g.num_padded_edges,)), jnp.float32)

    @jax.jit
    def f(graph, xx, ww):
        return spmm(graph, xx, "sum", edge_weight=ww, impl="segsum")

    out = np.asarray(f(g, x, w))
    ref = np.asarray(spmm(g, x, "sum", edge_weight=w, impl="xla"))
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_weighted_segsum_unweighted_equivalence(wgraph):
    # weight == 1 on real edges must reproduce the unweighted kernel exactly.
    g, _ = wgraph
    x = jnp.asarray(np.random.default_rng(7).normal(size=(300, 32)), jnp.float32)
    ones = jnp.ones((g.num_padded_edges,), jnp.float32)
    a = np.asarray(spmm(g, x, "mean", impl="segsum"))
    b = np.asarray(spmm(g, x, "mean", edge_weight=ones, impl="segsum"))
    np.testing.assert_allclose(a, b, atol=1e-5)
