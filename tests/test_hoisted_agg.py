"""Layer-1 aggregation hoisting (precompute_first_aggregation).

The input features never change during training, and linear aggregations
commute with the layer weights, so the first layer's full-graph SpMM can run
once per epoch instead of once per batch (the reference recomputes it every
batch, reference train_teacher_gnn.py:40-44).  These tests pin exactness of
the rewrite for every encoder/conv variant, including the isolated-node bias
edge case of sage_updated.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llp_tpu.core import build_graph
from llp_tpu.data.synthetic import community_features, sbm_graph
from llp_tpu.models.encoder import apply_encoder, precompute_first_aggregation
from llp_tpu.models.gcn import init_gcn
from llp_tpu.models.sage import init_sage


def _graph_with_isolated(rng, n=50, d=16):
    # ring over the first n-3 nodes; last 3 nodes isolated
    m = n - 3
    ei = np.stack([np.arange(m, dtype=np.int64), (np.arange(m) + 1) % m])
    g = build_graph(ei, n)
    x = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    return g, x


@pytest.mark.parametrize("conv", ["sage", "sage_updated"])
def test_sage_hoist_matches_direct(rng, conv):
    g, x = _graph_with_isolated(rng)
    params = init_sage(jax.random.PRNGKey(0), 16, 24, 24, 2)
    direct = apply_encoder("sage", params, g, x, conv=conv)
    x_agg = precompute_first_aggregation("sage", g, x, conv=conv)
    hoisted = apply_encoder("sage", params, g, x, conv=conv, x_agg=x_agg)
    np.testing.assert_allclose(
        np.asarray(hoisted), np.asarray(direct), rtol=1e-5, atol=1e-5
    )


def test_gcn_hoist_matches_direct(rng):
    g, x = _graph_with_isolated(rng)
    params = init_gcn(jax.random.PRNGKey(1), 16, 24, 24, 2)
    direct = apply_encoder("gcn", params, g, x)
    x_agg = precompute_first_aggregation("gcn", g, x)
    hoisted = apply_encoder("gcn", params, g, x, x_agg=x_agg)
    np.testing.assert_allclose(
        np.asarray(hoisted), np.asarray(direct), rtol=1e-5, atol=1e-5
    )


def test_single_layer_hoist(rng):
    g, x = _graph_with_isolated(rng)
    params = init_sage(jax.random.PRNGKey(2), 16, 24, 24, 1)
    direct = apply_encoder("sage", params, g, x, conv="sage_updated")
    x_agg = precompute_first_aggregation("sage", g, x)
    hoisted = apply_encoder(
        "sage", params, g, x, conv="sage_updated", x_agg=x_agg
    )
    np.testing.assert_allclose(
        np.asarray(hoisted), np.asarray(direct), rtol=1e-5, atol=1e-5
    )


def test_mlp_rejects_x_agg():
    from llp_tpu.models.mlp import init_mlp

    params = init_mlp(jax.random.PRNGKey(0), 2, 8, 8, 8)
    with pytest.raises(ValueError):
        apply_encoder("mlp", params, None, jnp.ones((4, 8)), x_agg=jnp.ones((4, 8)))
    assert precompute_first_aggregation("mlp", None, jnp.ones((4, 8))) is None


def test_teacher_epoch_unchanged_by_hoist(rng):
    """Gradient-level check: the hoisted epoch reproduces the direct math.

    A hand-rolled epoch that recomputes the layer-1 aggregation every batch
    (the reference's order of operations) must match the production epoch_fn
    — same RNG consumption, same batch schedule, no x_agg.
    """
    from llp_tpu.models.encoder import apply_encoder
    from llp_tpu.models.predictor import apply_link_predictor
    from llp_tpu.ops.losses import bce_loss
    from llp_tpu.sample.negative import edge_hash_keys, sample_negative_edges
    from llp_tpu.train.optim import adam_init, adam_update, clip_by_group_norm
    from llp_tpu.train.teacher import init_teacher_params, make_teacher_epoch_fn

    ei, comm = sbm_graph(150, 3, 5.0, seed=3)
    x = jnp.asarray(community_features(comm, 16, kind="gauss", seed=3))
    g = build_graph(ei, 150)
    e = int(ei.shape[1])
    b = 128
    steps = -(-e // b)
    pos = jnp.asarray(ei.T.astype(np.int32))
    keys = jnp.asarray(edge_hash_keys(ei, 150))
    epoch_fn, tx = make_teacher_epoch_fn(
        encoder="sage", predictor_mode="mlp", dropout=0.0,
        num_nodes=150, num_pos_edges=e,
        link_batch_size=b, neg_mode="dense", lr=0.01,
    )
    params = init_teacher_params(
        jax.random.PRNGKey(0), encoder="sage", in_channels=16,
        hidden_channels=16, num_layers=2, predictor_mode="mlp",
    )
    copy = lambda t: jax.tree_util.tree_map(lambda a: a.copy(), t)
    key = jax.random.PRNGKey(7)
    p1, _, l1 = epoch_fn(copy(params), tx.init(copy(params)), key, g, x, pos, keys)

    # Hand-rolled direct epoch: identical key stream/batching, NO hoist.
    def direct_batch_loss(p, rng, edges, mask):
        k_drop, k_pred, k_neg = jax.random.split(rng, 3)
        h = apply_encoder("sage", p["encoder"], g, x, dropout=0.0, train=True,
                          rng=k_drop, conv="sage")  # recomputes spmm(x)
        neg = sample_negative_edges(k_neg, keys, b, 150)
        src = jnp.concatenate([edges[:, 0], neg[0]])
        dst = jnp.concatenate([edges[:, 1], neg[1]])
        out = apply_link_predictor(
            p["predictor"], jnp.take(h, src, axis=0), jnp.take(h, dst, axis=0),
            mode="mlp", dropout=0.0, train=True, rng=k_pred,
        )
        labels = jnp.concatenate([jnp.ones((b,)), jnp.zeros((b,))])
        return bce_loss(out, labels, jnp.concatenate([mask, mask]))

    tx2, _ = adam_init({}, 0.01)
    p2 = copy(params)
    s2 = tx2.init(p2)
    k_perm, k_steps = jax.random.split(key)
    perm = jax.random.permutation(k_perm, e)
    perm = jnp.concatenate([perm, jnp.full((steps * b - e,), e, perm.dtype)])
    perm = perm.reshape(steps, b)
    for i in range(steps):
        idx = perm[i]
        mask = idx < e
        edges = pos[jnp.clip(idx, 0, e - 1)]
        _, grads = jax.value_and_grad(direct_batch_loss)(
            p2, jax.random.fold_in(k_steps, i), edges, mask
        )
        grads = clip_by_group_norm(grads, 1.0)
        p2, s2 = adam_update(tx2, grads, s2, p2)

    assert np.isfinite(float(l1))
    for a, c in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), rtol=1e-5, atol=1e-6)


def test_hoist_profitability_gate():
    """Linear-then-aggregate SAGE (the D >> H coauthor-physics setting) must
    NOT hoist when one width-D SpMM costs more than steps width-H SpMMs —
    the epoch still produces correct finite results either way."""
    from llp_tpu.sample.negative import edge_hash_keys
    from llp_tpu.train.teacher import init_teacher_params, make_teacher_epoch_fn

    ei, comm = sbm_graph(120, 3, 5.0, seed=9)
    d_wide = 512  # D >> H * steps (steps=1 here, H=16)
    x = jnp.asarray(
        np.random.default_rng(9).normal(size=(120, d_wide)), jnp.float32
    )
    g = build_graph(ei, 120)
    pos = jnp.asarray(ei.T.astype(np.int32))
    keys = jnp.asarray(edge_hash_keys(ei, 120))
    epoch_fn, tx = make_teacher_epoch_fn(
        encoder="sage", conv="sage_updated", predictor_mode="mlp", dropout=0.0,
        num_nodes=120, num_pos_edges=int(pos.shape[0]),
        link_batch_size=4096, neg_mode="dense", lr=0.01,
    )
    params = init_teacher_params(
        jax.random.PRNGKey(0), encoder="sage", in_channels=d_wide,
        hidden_channels=16, num_layers=2, predictor_mode="mlp",
    )
    # The gate decision is internal; correctness must hold regardless:
    p, _, loss = epoch_fn(params, tx.init(params), jax.random.PRNGKey(1),
                          g, x, pos, keys)
    assert np.isfinite(float(loss))
    # And the jaxpr must NOT contain a width-512 aggregation when unprofitable
    # (the hoisted x_agg would be (120, 512); unhoisted layer-1 spmm runs at
    # width 16). Check via the compiled HLO text for a 120x512 segment result.
    import jax as _jax

    jaxpr = _jax.make_jaxpr(
        lambda p_, s_: epoch_fn(p_, s_, jax.random.PRNGKey(1), g, x, pos, keys)
    )(params, tx.init(params))
    assert "f32[120,512]" not in str(jaxpr).split("scan")[0].replace(" ", "")
