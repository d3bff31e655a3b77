"""Last-layer row gathering (round 5).

``apply_encoder(..., last_rows=idx)`` returns ``apply_encoder(...)[idx]``
without materializing the final (N, H) layer — the projection commutes with
row gathering (for the aggregate convs, via the same linearity identities
the layer-1 hoist uses).  The teacher epoch's ``gather_last=True`` feeds the
decoder's endpoint rows through it; at N=10M/H=128 this removes the two
biggest per-step tensors (final embedding + its cotangent, ~2.5 GB each).

Reference anchor: the rows this computes are exactly the
``h[edge[0]], h[edge[1]]`` gathers of the reference hot loops
(src/train_teacher_gnn.py:58, src/main.py:184).
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
    precompute_first_aggregation,
)


@pytest.fixture(scope="module")
def problem():
    ei, comm = sbm_graph(300, 4, 6.0, seed=11)
    x = jnp.asarray(community_features(comm, 24, kind="gauss", seed=11))
    g = build_graph(ei.astype(np.int64), 300)
    idx = jnp.asarray(
        np.random.default_rng(0).integers(0, 300, size=64), jnp.int32
    )
    return g, x, ei, idx


CASES = [
    ("sage", "sage", 2), ("sage", "sage_updated", 2), ("gcn", "sage", 2),
    ("mlp", "sage", 2), ("sage", "sage", 1), ("sage", "sage_updated", 1),
    ("gcn", "sage", 1), ("sage", "sage", 3),
]


@pytest.mark.parametrize("encoder,conv,layers", CASES)
@pytest.mark.parametrize("hoist", [False, True])
def test_last_rows_matches_full_then_gather(problem, encoder, conv, layers,
                                            hoist):
    g, x, ei, idx = problem
    if hoist and encoder == "mlp":
        pytest.skip("mlp has nothing to hoist")
    params = init_encoder(
        jax.random.PRNGKey(3), encoder, 24, 16, 16, layers
    )
    x_agg = (
        precompute_first_aggregation(encoder, g, x, conv=conv)
        if hoist else None
    )
    kw = dict(conv=conv, dropout=0.5, train=True,
              rng=jax.random.PRNGKey(7), x_agg=x_agg)
    full = apply_encoder(encoder, params, g, x, **kw)
    rows = apply_encoder(encoder, params, g, x, last_rows=idx, **kw)
    np.testing.assert_allclose(
        np.asarray(rows), np.asarray(jnp.take(full, idx, axis=0)),
        rtol=1e-5, atol=1e-5,
    )


def test_last_rows_isolated_nodes_sage_updated():
    """The sage_updated bias gate (b ⊙ 1{deg>0}) must hold row-wise: an
    isolated node's gathered row drops the aggregation bias exactly like
    the full forward."""
    ei = np.array([[0, 1], [1, 2]])  # node 3 isolated
    g = build_graph(ei, 4)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(4, 8)), jnp.float32)
    params = init_encoder(jax.random.PRNGKey(0), "sage", 8, 8, 8, 2)
    idx = jnp.asarray([3, 0], jnp.int32)
    full = apply_encoder("sage", params, g, x, conv="sage_updated")
    rows = apply_encoder("sage", params, g, x, conv="sage_updated",
                         last_rows=idx)
    np.testing.assert_allclose(
        np.asarray(rows), np.asarray(jnp.take(full, idx, axis=0)),
        rtol=1e-5, atol=1e-6,
    )


@pytest.mark.parametrize("encoder,conv", [
    ("sage", "sage"), ("sage", "sage_updated"), ("gcn", "sage"),
])
@pytest.mark.parametrize("remat", [False, True])
def test_teacher_epoch_gather_last_trajectory_matches(problem, encoder, conv,
                                                      remat):
    """gather_last=True (and the remat knob that makes it fit at 10M) must
    reproduce the normal epoch's loss AND params (the losses/grads flow
    through identical values up to reassociation; remat changes only WHEN
    values are computed, not what)."""
    from llp_tpu.train.teacher import init_teacher_params, make_teacher_epoch_fn

    g, x, ei, _ = problem
    pos = jnp.asarray(ei.T.astype(np.int32))
    kw = dict(
        encoder=encoder, conv=conv, predictor_mode="mlp", dropout=0.5,
        num_nodes=300, num_pos_edges=int(pos.shape[0]),
        link_batch_size=256, neg_mode="uniform", lr=0.01,
    )
    params0 = init_teacher_params(
        jax.random.PRNGKey(0), encoder=encoder, in_channels=24,
        hidden_channels=16, num_layers=2, predictor_mode="mlp",
    )

    def run(gather_last, rm=False):
        fn, tx = make_teacher_epoch_fn(**kw, gather_last=gather_last,
                                       remat=rm)
        p = jax.tree_util.tree_map(jnp.copy, params0)
        s = tx.init(p)
        losses = []
        for i in range(2):
            p, s, loss = fn(p, s, jax.random.PRNGKey(40 + i), g, x, pos,
                            jnp.zeros((1,), jnp.int32))
            losses.append(float(loss))
        return p, losses

    p_a, l_a = run(False)
    p_b, l_b = run(True, rm=remat)
    np.testing.assert_allclose(l_b, l_a, rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(p_a),
                    jax.tree_util.tree_leaves(p_b)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=2e-4,
                                   atol=2e-5)


def test_teacher_epoch_attached_graph_matches_and_const_free(problem):
    """The teacher epoch over an attach_segsum graph: same trajectory as
    the cached-layout path, and the traced program carries NO large
    constants (the layouts arrive as jit arguments — the property that
    makes huge graphs compilable over a remote relay)."""
    from llp_tpu.ops.pallas.segsum_kernel import attach_segsum, prepare_segsum
    from llp_tpu.train.teacher import init_teacher_params, make_teacher_epoch_fn

    g, x, ei, _ = problem
    pos = jnp.asarray(ei.T.astype(np.int32))
    kw = dict(
        encoder="sage", conv="sage", predictor_mode="mlp", dropout=0.0,
        num_nodes=300, num_pos_edges=int(pos.shape[0]),
        link_batch_size=256, neg_mode="uniform", lr=0.01,
        spmm_impl="segsum", gather_last=True,
    )
    params0 = init_teacher_params(
        jax.random.PRNGKey(1), encoder="sage", in_channels=24,
        hidden_channels=16, num_layers=2, predictor_mode="mlp",
    )

    def run(graph):
        fn, tx = make_teacher_epoch_fn(**kw)
        p = jax.tree_util.tree_map(jnp.copy, params0)
        s = tx.init(p)
        p, s, loss = fn(p, s, jax.random.PRNGKey(9), graph, x, pos,
                        jnp.zeros((1,), jnp.int32))
        return p, float(loss)

    prepare_segsum(g)
    p_cached, l_cached = run(g)
    g_att = attach_segsum(build_graph(ei.astype(np.int64), 300))
    p_att, l_att = run(g_att)
    assert l_att == pytest.approx(l_cached, rel=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(p_cached),
                    jax.tree_util.tree_leaves(p_att)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-5,
                                   atol=1e-6)

    fn, tx = make_teacher_epoch_fn(**kw)
    jaxpr = jax.make_jaxpr(
        lambda p, s, graph: fn(p, s, jax.random.PRNGKey(9), graph, x, pos,
                               jnp.zeros((1,), jnp.int32))
    )(params0, tx.init(params0), g_att)
    big = [np.asarray(c).nbytes for c in jaxpr.consts
           if hasattr(c, "nbytes") and np.asarray(c).nbytes > 65536]
    assert not big, f"large constants leaked into the epoch program: {big}"


def test_teacher_epoch_donate_x_matches(problem):
    """donate_x=True re-emits the (unchanged) feature matrix as a 4th
    output and must not change the trajectory — the knob exists because a
    non-donated x used inside the nested loops kept a full internal copy
    (2.4 GB at N=10M)."""
    from llp_tpu.train.teacher import init_teacher_params, make_teacher_epoch_fn

    g, x, ei, _ = problem
    pos = jnp.asarray(ei.T.astype(np.int32))
    kw = dict(
        encoder="sage", conv="sage", predictor_mode="mlp", dropout=0.0,
        num_nodes=300, num_pos_edges=int(pos.shape[0]),
        link_batch_size=256, neg_mode="uniform", lr=0.01, gather_last=True,
        remat=True,
    )
    params0 = init_teacher_params(
        jax.random.PRNGKey(0), encoder="sage", in_channels=24,
        hidden_channels=16, num_layers=2, predictor_mode="mlp",
    )
    fn_a, tx = make_teacher_epoch_fn(**kw)
    p_a = jax.tree_util.tree_map(jnp.copy, params0)
    p_a, s_a, l_a = fn_a(p_a, tx.init(p_a), jax.random.PRNGKey(5), g, x, pos,
                         jnp.zeros((1,), jnp.int32))
    fn_b, _ = make_teacher_epoch_fn(**kw, donate_x=True)
    xb = jnp.copy(x)
    p_b = jax.tree_util.tree_map(jnp.copy, params0)
    p_b, s_b, l_b, xb = fn_b(p_b, tx.init(p_b), jax.random.PRNGKey(5), g, xb,
                             pos, jnp.zeros((1,), jnp.int32))
    assert float(l_b) == pytest.approx(float(l_a), rel=1e-6)
    np.testing.assert_array_equal(np.asarray(xb), np.asarray(x))
    for a, b in zip(jax.tree_util.tree_leaves(p_a),
                    jax.tree_util.tree_leaves(p_b)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
