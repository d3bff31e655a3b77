"""Inter-layer norm semantics vs torch (nn.LayerNorm / nn.BatchNorm1d).

The reference models accept norm_type in {"none","batch","layer"}
(reference src/models.py:14-37,84-101) and apply the norm before ReLU
(src/models.py:50-51,114-115).  Batch norm is the one stateful layer;
these tests pin the numerics (train-mode biased variance, unbiased
running buffers with momentum 0.1, eval from the buffers) and check the
state threads correctly through the MLP/SAGE foward and the jitted
training epochs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from llp_tpu.core import build_graph
from llp_tpu.data.synthetic import community_features, sbm_graph
from llp_tpu.models.mlp import apply_mlp, init_mlp
from llp_tpu.models.norms import apply_norm, init_norm
from llp_tpu.models.sage import apply_sage, init_sage
from llp_tpu.sample.negative import edge_hash_keys
from llp_tpu.train.teacher import init_teacher_params, make_teacher_epoch_fn


def test_batch_norm_matches_torch_train_then_eval(rng):
    dim = 16
    params, state = init_norm("batch", dim)
    bn = torch.nn.BatchNorm1d(dim)

    # Several train steps: outputs AND running buffers must track torch.
    for step in range(3):
        x = rng.normal(size=(40, dim)).astype(np.float32) * (step + 1) + step
        y, state = apply_norm("batch", params, state, jnp.asarray(x), train=True)
        bn.train()
        yt = bn(torch.from_numpy(x)).detach().numpy()
        np.testing.assert_allclose(np.asarray(y), yt, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(state["mean"]), bn.running_mean.numpy(), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(state["var"]), bn.running_var.numpy(), atol=1e-4
        )

    # Eval: normalize by the running buffers, buffers unchanged.
    x = rng.normal(size=(7, dim)).astype(np.float32)
    y, state2 = apply_norm("batch", params, state, jnp.asarray(x), train=False)
    bn.eval()
    yt = bn(torch.from_numpy(x)).detach().numpy()
    np.testing.assert_allclose(np.asarray(y), yt, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(state2["mean"]), np.asarray(state["mean"]))


def test_layer_norm_matches_torch(rng):
    dim = 24
    params, state = init_norm("layer", dim)
    x = rng.normal(size=(10, dim)).astype(np.float32)
    y, _ = apply_norm("layer", params, state, jnp.asarray(x), train=True)
    ln = torch.nn.LayerNorm(dim)
    yt = ln(torch.from_numpy(x)).detach().numpy()
    np.testing.assert_allclose(np.asarray(y), yt, atol=1e-5)


def test_batch_norm_gradients_flow_through_scale_bias(rng):
    dim = 8
    params, state = init_norm("batch", dim)
    x = jnp.asarray(rng.normal(size=(12, dim)).astype(np.float32))

    def loss(p, s):
        y, ns = apply_norm("batch", p, s, x, train=True)
        return jnp.sum(y**2), ns

    (_, new_state), grads = jax.value_and_grad(loss, argnums=(0, 1), has_aux=True)(
        params, state
    )
    gp, gs = grads
    assert float(jnp.abs(gp["scale"]).sum()) > 0
    # Running buffers never enter the train-mode loss: zero grads.
    np.testing.assert_array_equal(np.asarray(gs["mean"]), 0.0)
    np.testing.assert_array_equal(np.asarray(gs["var"]), 0.0)
    # And the aux state moved away from init.
    assert float(jnp.abs(new_state["mean"]).sum()) > 0


def test_mlp_batch_norm_matches_torch_stack(rng):
    params = init_mlp(jax.random.PRNGKey(0), 3, 12, 16, 16, norm_type="batch")
    x = rng.normal(size=(30, 12)).astype(np.float32)
    h, new_state = apply_mlp(
        params, jnp.asarray(x), train=True, dropout=0.0, norm_type="batch"
    )
    assert len(new_state) == 2

    t = torch.from_numpy(x)
    for i, layer in enumerate(params["layers"]):
        lin = torch.nn.Linear(*layer["w"].shape)
        with torch.no_grad():
            lin.weight.copy_(torch.from_numpy(np.asarray(layer["w"]).T.copy()))
            lin.bias.copy_(torch.from_numpy(np.asarray(layer["b"]).copy()))
        t = lin(t)
        if i != len(params["layers"]) - 1:
            bn = torch.nn.BatchNorm1d(t.shape[1])
            bn.train()
            t = torch.relu(bn(t))
    np.testing.assert_allclose(np.asarray(h), t.detach().numpy(), atol=1e-4)


def test_sage_batch_norm_threads_state(rng):
    n, d = 30, 10
    ei = np.stack(
        [np.arange(n, dtype=np.int64), (np.arange(n, dtype=np.int64) + 1) % n]
    )
    g = build_graph(ei, n)
    params = init_sage(jax.random.PRNGKey(3), d, 16, 16, 3, norm_type="batch")
    x = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    h, new_state = apply_sage(params, g, x, train=True, norm_type="batch")
    assert h.shape == (n, 16)
    assert len(new_state) == 2
    for st0, st1 in zip(params["norm_state"], new_state):
        assert not np.allclose(np.asarray(st0["mean"]), np.asarray(st1["mean"]))
    # Eval mode keeps the buffers.
    h2, state_eval = apply_sage(params, g, x, train=False, norm_type="batch")
    for st0, st1 in zip(params["norm_state"], state_eval):
        np.testing.assert_array_equal(np.asarray(st0["mean"]), np.asarray(st1["mean"]))


@pytest.mark.parametrize("norm_type", ["layer", "batch"])
def test_teacher_epoch_with_norms_trains(norm_type):
    ei, comm = sbm_graph(200, 4, 6.0, seed=5)
    x = jnp.asarray(community_features(comm, 32, kind="gauss", seed=5))
    g = build_graph(ei, 200)
    pos = jnp.asarray(ei.T.astype(np.int32))
    keys = jnp.asarray(edge_hash_keys(ei, 200))
    epoch_fn, tx = make_teacher_epoch_fn(
        encoder="sage", predictor_mode="mlp", dropout=0.0,
        num_nodes=g.num_nodes, num_pos_edges=int(pos.shape[0]),
        link_batch_size=256, neg_mode="dense", lr=0.01, norm_type=norm_type,
    )
    params = init_teacher_params(
        jax.random.PRNGKey(0), encoder="sage", in_channels=int(x.shape[1]),
        hidden_channels=32, num_layers=2, predictor_mode="mlp",
        norm_type=norm_type,
    )
    if norm_type == "batch":
        init_mean = np.asarray(params["encoder"]["norm_state"][0]["mean"]).copy()
    opt_state = tx.init(params)
    losses = []
    for ep in range(8):
        params, opt_state, loss = epoch_fn(
            params, opt_state, jax.random.PRNGKey(ep), g, x, pos, keys
        )
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0] * 0.9
    if norm_type == "batch":
        moved = np.asarray(params["encoder"]["norm_state"][0]["mean"])
        assert not np.allclose(moved, init_mean)


def test_transductive_eval_with_batch_norm():
    from llp_tpu.evaln.transductive import make_transductive_eval_fn

    ei, comm = sbm_graph(120, 3, 5.0, seed=7)
    x = jnp.asarray(community_features(comm, 16, kind="gauss", seed=7))
    g = build_graph(ei, 120)
    params = init_teacher_params(
        jax.random.PRNGKey(1), encoder="sage", in_channels=16,
        hidden_channels=24, num_layers=2, predictor_mode="mlp",
        norm_type="batch",
    )
    eval_fn = make_transductive_eval_fn(
        encoder="sage", predictor_mode="mlp", hits_ks=(10, 20), norm_type="batch"
    )
    e = jnp.asarray(ei.T[:40].astype(np.int32))
    results, h = eval_fn(params, g, x, e, e, e, e)
    assert h.shape == (120, 24)
    for leaf in jax.tree_util.tree_leaves(results):
        assert np.all(np.isfinite(np.asarray(leaf)))
