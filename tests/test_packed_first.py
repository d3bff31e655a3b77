"""Packed layer-1 input (round 5).

``pack_first_layer_input`` concatenates the two epoch-invariant arrays the
hoisted teacher needs — x and mean_agg(x) — into ONE lane-aligned (N, 2D)
array, and ``apply_encoder(..., packed_first=True)`` consumes it with a
single stacked-weight matmul: ``[x | agg] @ [[W_r],[W_l]] = x W_r + agg W_l``.

Why it exists: bf16 (N, D) arrays with D < 128 tile-pad to 128 HBM lanes —
at N=10M/D=64 the separate x + in-program x_agg cost 2.38 GB EACH padded
(plus XLA kept a loop-invariant copy of x), which pushed the 10M teacher
epoch program to 16.95 GB on a 15.75 GB chip.  Packing removes ~4.8 GB.

Semantics anchor: layer 1 of the reference teacher forward
(src/models.py:101-108, src/sageconv_updated.py:65-81) — identical math up
to float reassociation (one fused 2D-contraction instead of two D ones).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llp_tpu.core import build_graph
from llp_tpu.data.synthetic import community_features, sbm_graph
from llp_tpu.models.encoder import (
    apply_encoder,
    init_encoder,
    pack_first_layer_input,
    precompute_first_aggregation,
)


@pytest.fixture(scope="module")
def problem():
    ei, comm = sbm_graph(300, 4, 6.0, seed=21)
    x = jnp.asarray(community_features(comm, 24, kind="gauss", seed=21))
    g = build_graph(ei.astype(np.int64), 300)
    return g, x, ei


@pytest.mark.parametrize("conv", ["sage", "sage_updated"])
@pytest.mark.parametrize("layers", [1, 2, 3])
def test_packed_forward_matches_hoisted(problem, conv, layers):
    g, x, _ = problem
    params = init_encoder(jax.random.PRNGKey(3), "sage", 24, 16, 16, layers)
    x_agg = precompute_first_aggregation("sage", g, x, conv=conv)
    xp = pack_first_layer_input(g, x)
    np.testing.assert_allclose(
        np.asarray(xp), np.asarray(jnp.concatenate([x, x_agg], axis=1)),
        rtol=1e-6,
    )
    kw = dict(conv=conv, dropout=0.5, train=True, rng=jax.random.PRNGKey(7))
    ref = apply_encoder("sage", params, g, x, x_agg=x_agg, **kw)
    got = apply_encoder("sage", params, g, xp, packed_first=True, **kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5,
                               atol=1e-5)


def test_packed_isolated_nodes_bias_gate():
    """sage_updated's hoisted bias must drop on isolated rows through the
    packed path too (b ⊙ 1{deg>0})."""
    ei = np.array([[0, 1], [1, 2]])  # node 3 isolated
    g = build_graph(ei, 4)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(4, 8)), jnp.float32)
    params = init_encoder(jax.random.PRNGKey(0), "sage", 8, 8, 8, 2)
    xp = pack_first_layer_input(g, x)
    ref = apply_encoder("sage", params, g, x, conv="sage_updated",
                        x_agg=precompute_first_aggregation(
                            "sage", g, x, conv="sage_updated"))
    got = apply_encoder("sage", params, g, xp, conv="sage_updated",
                        packed_first=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5,
                               atol=1e-6)


@pytest.mark.parametrize("conv", ["sage", "sage_updated"])
def test_packed_single_layer_last_rows(problem, conv):
    g, x, _ = problem
    params = init_encoder(jax.random.PRNGKey(5), "sage", 24, 16, 16, 1)
    xp = pack_first_layer_input(g, x)
    idx = jnp.asarray([5, 299, 0, 17], jnp.int32)
    full = apply_encoder("sage", params, g, xp, conv=conv, packed_first=True)
    rows = apply_encoder("sage", params, g, xp, conv=conv, packed_first=True,
                         last_rows=idx)
    np.testing.assert_allclose(
        np.asarray(rows), np.asarray(jnp.take(full, idx, axis=0)),
        rtol=1e-5, atol=1e-6,
    )


def test_packed_weighted_graph(problem):
    """Weighted graphs: the packed agg is the weighted mean and the
    sage_updated bias gate keys on the WEIGHTED degree."""
    _, x, ei = problem
    w = np.abs(np.random.default_rng(3).normal(size=ei.shape[1])) + 0.1
    g = build_graph(ei.astype(np.int64), 300, edge_weight=w)
    params = init_encoder(jax.random.PRNGKey(8), "sage", 24, 16, 16, 2)
    for conv in ("sage", "sage_updated"):
        x_agg = precompute_first_aggregation("sage", g, x, conv=conv)
        ref = apply_encoder("sage", params, g, x, conv=conv, x_agg=x_agg)
        got = apply_encoder("sage", params, g, pack_first_layer_input(g, x),
                            conv=conv, packed_first=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


def test_packed_rejects_non_sage(problem):
    g, x, _ = problem
    params = init_encoder(jax.random.PRNGKey(0), "gcn", 24, 16, 16, 2)
    with pytest.raises(ValueError, match="packed_first"):
        apply_encoder("gcn", params, g, x, packed_first=True)
    sp = init_encoder(jax.random.PRNGKey(0), "sage", 24, 16, 16, 2)
    with pytest.raises(ValueError, match="mutually exclusive"):
        apply_encoder("sage", sp, g, jnp.concatenate([x, x], 1),
                      packed_first=True, x_agg=x)


@pytest.mark.parametrize("conv", ["sage", "sage_updated"])
@pytest.mark.parametrize("gather_last,remat", [(False, False), (True, True)])
def test_teacher_epoch_packed_trajectory_matches(problem, conv, gather_last,
                                                 remat):
    """A packed_x=True teacher epoch (fed the packed array) reproduces the
    standard hoisted epoch's loss and params — same dropout/negative RNG
    stream, layer-1 math identical up to reassociation."""
    from llp_tpu.train.teacher import init_teacher_params, make_teacher_epoch_fn

    g, x, ei = problem
    pos = jnp.asarray(ei.T.astype(np.int32))
    kw = dict(
        encoder="sage", conv=conv, predictor_mode="mlp", dropout=0.5,
        num_nodes=300, num_pos_edges=int(pos.shape[0]),
        link_batch_size=256, neg_mode="uniform", lr=0.01,
        gather_last=gather_last, remat=remat,
    )
    params0 = init_teacher_params(
        jax.random.PRNGKey(0), encoder="sage", in_channels=24,
        hidden_channels=16, num_layers=2, predictor_mode="mlp",
    )

    def run(packed):
        fn, tx = make_teacher_epoch_fn(**kw, packed_x=packed)
        xin = pack_first_layer_input(g, x) if packed else x
        p = jax.tree_util.tree_map(jnp.copy, params0)
        s = tx.init(p)
        losses = []
        for i in range(2):
            p, s, loss = fn(p, s, jax.random.PRNGKey(40 + i), g, xin, pos,
                            jnp.zeros((1,), jnp.int32))
            losses.append(float(loss))
        return p, losses

    p_a, l_a = run(False)
    p_b, l_b = run(True)
    np.testing.assert_allclose(l_b, l_a, rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(p_a),
                    jax.tree_util.tree_leaves(p_b)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=2e-4,
                                   atol=2e-5)


def test_teacher_packed_rejects_gcn():
    from llp_tpu.train.teacher import make_teacher_epoch_fn

    with pytest.raises(ValueError, match="packed_x"):
        make_teacher_epoch_fn(
            encoder="gcn", predictor_mode="mlp", num_nodes=10,
            num_pos_edges=10, link_batch_size=4, packed_x=True,
        )
