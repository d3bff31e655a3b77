"""Blocked-segsum SpMM integration: parity + grad vs the XLA path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llp_tpu.core import build_graph
from llp_tpu.data.synthetic import sbm_graph
from llp_tpu.ops import spmm
from llp_tpu.ops.pallas.segsum_kernel import prepare_segsum


@pytest.fixture(scope="module")
def graph400():
    ei, _ = sbm_graph(400, 4, 9.0, seed=13)
    g = build_graph(ei, 400)
    prepare_segsum(g)
    return g


@pytest.mark.parametrize("reduce", ["sum", "mean"])
def test_segsum_spmm_matches_xla(graph400, reduce):
    g = graph400
    x = jnp.asarray(np.random.default_rng(0).normal(size=(400, 40)), jnp.float32)
    a = np.asarray(spmm(g, x, reduce, impl="xla"))
    b = np.asarray(spmm(g, x, reduce, impl="segsum"))
    np.testing.assert_allclose(a, b, atol=1e-4)


def test_segsum_spmm_grad_matches_xla(graph400):
    g = graph400
    x = jnp.asarray(np.random.default_rng(1).normal(size=(400, 24)), jnp.float32)
    w = jnp.asarray(np.random.default_rng(2).normal(size=(24,)), jnp.float32)

    def loss(impl):
        return lambda xx: jnp.sum(jnp.tanh(spmm(g, xx, "mean", impl=impl)) * w)

    ga = np.asarray(jax.grad(loss("xla"))(x))
    gb = np.asarray(jax.grad(loss("segsum"))(x))
    np.testing.assert_allclose(ga, gb, atol=1e-4)


def test_segsum_inside_jit_after_prepare(graph400):
    g = graph400
    x = jnp.asarray(np.random.default_rng(3).normal(size=(400, 16)), jnp.float32)

    @jax.jit
    def f(graph, xx):
        return spmm(graph, xx, "mean", impl="segsum")

    out = np.asarray(f(g, x))
    ref = np.asarray(spmm(g, x, "mean", impl="xla"))
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_segsum_unprepared_tracer_falls_back():
    # A fresh graph inside jit without prepare: silently uses the XLA path.
    ei, _ = sbm_graph(100, 3, 5.0, seed=14)
    g = build_graph(ei, 100)
    x = jnp.asarray(np.random.default_rng(4).normal(size=(100, 8)), jnp.float32)

    @jax.jit
    def f(graph, xx):
        return spmm(graph, xx, "mean", impl="segsum")

    out = np.asarray(f(g, x))
    ref = np.asarray(spmm(g, x, "mean", impl="xla"))
    np.testing.assert_allclose(out, ref, atol=1e-5)