"""Model-layer semantics vs independent torch re-implementations.

The reference's exact module math (reference src/models.py, sageconv_updated.py)
is re-expressed here in plain torch (CPU) and compared against our JAX modules
with identical copied weights — the per-layer allclose parity gate from
BASELINE.md, minus PyG (unavailable offline).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from llp_tpu.core import build_graph
from llp_tpu.models import (
    apply_gcn,
    apply_link_predictor,
    apply_mlp,
    apply_sage,
    init_gcn,
    init_link_predictor,
    init_mlp,
    init_sage,
)


def _torch_linear(w, b=None):
    din, dout = w.shape
    lin = torch.nn.Linear(din, dout, bias=b is not None)
    with torch.no_grad():
        lin.weight.copy_(torch.from_numpy(np.asarray(w).T.copy()))
        if b is not None:
            lin.bias.copy_(torch.from_numpy(np.asarray(b).copy()))
    return lin


def test_mlp_matches_torch(rng):
    params = init_mlp(jax.random.PRNGKey(0), 3, 12, 16, 16)
    x = rng.normal(size=(20, 12)).astype(np.float32)
    out = np.asarray(apply_mlp(params, jnp.asarray(x)))

    # Reference MLP.forward (models.py:45-54): linear, then (not last) relu.
    t = torch.from_numpy(x)
    lins = [_torch_linear(l["w"], l["b"]) for l in params["layers"]]
    for i, lin in enumerate(lins):
        t = lin(t)
        if i != len(lins) - 1:
            t = torch.relu(t)
    np.testing.assert_allclose(out, t.detach().numpy(), atol=1e-5)


def test_mlp_single_layer():
    params = init_mlp(jax.random.PRNGKey(1), 1, 8, 99, 5)
    assert len(params["layers"]) == 1
    x = jnp.ones((3, 8))
    assert apply_mlp(params, x).shape == (3, 5)


@pytest.mark.parametrize("conv", ["sage", "sage_updated"])
def test_sage_matches_manual(small_graph, rng, conv):
    g, A, _, _ = small_graph
    n = g.num_nodes
    params = init_sage(jax.random.PRNGKey(2), 10, 16, 16, 2)
    x = rng.normal(size=(n, 10)).astype(np.float32)
    out = np.asarray(apply_sage(params, g, jnp.asarray(x), conv=conv))

    deg = A.sum(1, keepdims=True)
    Am = A / np.maximum(deg, 1.0)

    def conv_ref(cp, h):
        wl, bl = np.asarray(cp["lin_l"]["w"]), np.asarray(cp["lin_l"]["b"])
        wr = np.asarray(cp["lin_r"]["w"])
        if conv == "sage":
            # PyG SAGEConv: W_l·mean_j(x_j) + b + W_r·x (aggregate-then-linear)
            return (Am @ h) @ wl + bl + h @ wr
        # SAGEConv_updated (sageconv_updated.py:71-76): mean_j(W_l·x_j + b) + W_r·x
        return Am @ (h @ wl + bl) + h @ wr

    h = conv_ref(params["convs"][0], x.astype(np.float64))
    h = np.maximum(h, 0.0)
    h = conv_ref(params["convs"][1], h)
    np.testing.assert_allclose(out, h, atol=1e-4)


def test_sage_variants_differ_only_on_isolated_nodes(rng):
    # Same weights, graph with an isolated node: outputs agree except where
    # in-degree == 0 (bias inside vs outside the mean).
    ei = np.array([[0, 1, 1, 0], [1, 0, 2, 2]])
    g = build_graph(ei, 4)  # node 3 isolated
    params = init_sage(jax.random.PRNGKey(3), 6, 8, 8, 2)
    x = jnp.asarray(rng.normal(size=(4, 6)), jnp.float32)
    a = np.asarray(apply_sage(params, g, x, conv="sage"))
    b = np.asarray(apply_sage(params, g, x, conv="sage_updated"))
    np.testing.assert_allclose(a[:3], b[:3], atol=1e-4)


def test_gcn_matches_manual(small_graph, rng):
    g, A, _, _ = small_graph
    n = g.num_nodes
    params = init_gcn(jax.random.PRNGKey(4), 10, 16, 16, 2)
    x = rng.normal(size=(n, 10)).astype(np.float32)
    out = np.asarray(apply_gcn(params, g, jnp.asarray(x)))

    # x' = D^-1/2 (A+I) D^-1/2 x W + b  (PyG GCNConv on unweighted edges)
    Ah = (A > 0).astype(np.float64) + np.eye(n)
    d = Ah.sum(1)
    Dm = np.diag(1.0 / np.sqrt(d))
    S = Dm @ Ah @ Dm

    def conv_ref(cp, h):
        return S @ h @ np.asarray(cp["lin"]["w"]) + np.asarray(cp["lin"]["b"])

    h = conv_ref(params["convs"][0], x.astype(np.float64))
    h = np.maximum(h, 0.0)
    h = conv_ref(params["convs"][1], h)
    np.testing.assert_allclose(out, h, atol=1e-4)


def test_link_predictor_inner(rng):
    hi = jnp.asarray(rng.normal(size=(7, 16)), jnp.float32)
    hj = jnp.asarray(rng.normal(size=(7, 16)), jnp.float32)
    p = init_link_predictor(jax.random.PRNGKey(5), "inner", 16, 16)
    out = np.asarray(apply_link_predictor(p, hi, hj, mode="inner"))
    ref = 1.0 / (1.0 + np.exp(-np.sum(np.asarray(hi) * np.asarray(hj), -1)))
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_link_predictor_mlp_matches_torch(rng):
    p = init_link_predictor(jax.random.PRNGKey(6), "mlp", 16, 16, 1, 2)
    hi = rng.normal(size=(9, 16)).astype(np.float32)
    hj = rng.normal(size=(9, 16)).astype(np.float32)
    out = np.asarray(apply_link_predictor(p, jnp.asarray(hi), jnp.asarray(hj), mode="mlp"))

    # Reference LinkPredictor.forward (models.py:139-150).
    t = torch.from_numpy(hi) * torch.from_numpy(hj)
    lins = [_torch_linear(l["w"], l["b"]) for l in p["lins"]]
    for lin in lins[:-1]:
        t = torch.relu(lin(t))
    t = torch.sigmoid(lins[-1](t)).squeeze(-1)
    np.testing.assert_allclose(out, t.detach().numpy(), atol=1e-5)


def test_link_predictor_batched_contexts(rng):
    # Student KD scores (B, C, D) blocks (main.py:184-187): broadcasting path.
    p = init_link_predictor(jax.random.PRNGKey(7), "mlp", 8, 8, 1, 2)
    hi = jnp.asarray(rng.normal(size=(4, 5, 8)), jnp.float32)
    hj = jnp.asarray(rng.normal(size=(4, 5, 8)), jnp.float32)
    out = apply_link_predictor(p, hi, hj, mode="mlp")
    assert out.shape == (4, 5)
