"""Pallas blocked-tile SpMM: parity with the XLA path (interpret mode on CPU,
compiled on TPU), forward + backward, and integration through the SAGE conv."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llp_tpu.core import build_graph
from llp_tpu.data.synthetic import sbm_graph
from llp_tpu.ops import spmm
from llp_tpu.ops.pallas.spmm_kernel import (
    build_tiles,
    prepare_pallas,
    spmm_tiles_apply,
)


@pytest.fixture(scope="module")
def graph300():
    ei, _ = sbm_graph(300, 4, 8.0, seed=9)
    return build_graph(ei, 300), ei


def test_tiles_structure(graph300):
    g, ei = graph300
    tiles, rr, rs, _ = build_tiles(ei[1], ei[0], 300)  # receivers, senders
    tr = np.asarray(tiles.tile_rows)
    assert (np.diff(tr) >= 0).all()  # sorted by output row-block
    coords = np.asarray(tiles.coords)
    n_real = int((coords >= 0).sum())
    assert n_real == ei.shape[1]
    assert rr.size == 0 and rs.size == 0  # no residual at threshold 0


def test_tiles_hybrid_residual(graph300):
    g, ei = graph300
    tiles, rr, rs, _ = build_tiles(ei[1], ei[0], 300, min_tile_edges=64)
    n_tiled = int((np.asarray(tiles.coords) >= 0).sum())
    assert n_tiled + rr.size == ei.shape[1]
    assert rr.size > 0  # sparse tiles exist in this graph


@pytest.mark.parametrize("reduce", ["sum", "mean"])
def test_pallas_matches_xla(graph300, reduce):
    g, _ = graph300
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(300, 48)), jnp.float32)
    prepare_pallas(g)
    ref = np.asarray(spmm(g, x, reduce, impl="xla"))
    out = np.asarray(spmm(g, x, reduce, impl="pallas"))
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_pallas_grad_matches_xla(graph300):
    g, _ = graph300
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(300, 32)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(32,)), jnp.float32)
    prepare_pallas(g)

    def loss(impl):
        return lambda xx: jnp.sum(jnp.tanh(spmm(g, xx, "mean", impl=impl)) * w)

    g_ref = np.asarray(jax.grad(loss("xla"))(x))
    g_pal = np.asarray(jax.grad(loss("pallas"))(x))
    np.testing.assert_allclose(g_pal, g_ref, atol=1e-4)


def test_pallas_inside_jit(graph300):
    g, _ = graph300
    prepare_pallas(g)
    x = jnp.asarray(np.random.default_rng(2).normal(size=(300, 16)), jnp.float32)

    @jax.jit
    def f(graph, xx):
        return spmm(graph, xx, "mean", impl="pallas")

    out = np.asarray(f(g, x))
    ref = np.asarray(spmm(g, x, "mean", impl="xla"))
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_pallas_through_sage(graph300):
    from llp_tpu.models import apply_sage, init_sage

    g, _ = graph300
    prepare_pallas(g)
    params = init_sage(jax.random.PRNGKey(0), 16, 24, 24, 2)
    x = jnp.asarray(np.random.default_rng(3).normal(size=(300, 16)), jnp.float32)
    a = np.asarray(apply_sage(params, g, x, impl="xla"))
    b = np.asarray(apply_sage(params, g, x, impl="pallas"))
    np.testing.assert_allclose(a, b, atol=1e-3)


def test_nonmultiple_dims(graph300):
    # N=300 (not multiple of 128), D=50 (not multiple of 128): padding path.
    g, ei = graph300
    tiles, _, _, _ = build_tiles(ei[1], ei[0], 300)
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(300, 50)), jnp.float32)
    out = np.asarray(spmm_tiles_apply(tiles, x, 300))
    ref = np.asarray(spmm(g, x, "sum", impl="xla"))
    np.testing.assert_allclose(out, ref, atol=1e-4)
