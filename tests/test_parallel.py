"""Multi-device (8 virtual CPU devices) tests for the sharded training path —
the CPU-mesh "fake backend" gate (SURVEY.md §4)."""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llp_tpu.core import build_graph
from llp_tpu.data.synthetic import sbm_graph
from llp_tpu.ops import spmm
from llp_tpu.parallel import (
    make_mesh,
    make_sharded_spmm,
    make_sharded_student_step,
    make_sharded_teacher_step,
    shard_edges,
)
from llp_tpu.train.student import init_student_params
from llp_tpu.train.teacher import init_teacher_params

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


@pytest.fixture(scope="module")
def setup():
    ei, comm = sbm_graph(96, 4, 6.0, seed=2)
    g = build_graph(ei, 96)
    g = shard_edges(g, 8)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(96, 32)), jnp.float32)
    return g, x


def test_sharded_spmm_matches_single_device(setup):
    g, x = setup
    mesh = make_mesh(8)
    sh_spmm = make_sharded_spmm(mesh, g.num_nodes)
    for reduce in ("sum", "mean"):
        ref = np.asarray(spmm(g, x, reduce))
        out = np.asarray(
            sh_spmm(g.senders, g.receivers, g.edge_mask, g.in_degree, x, reduce)
        )
        np.testing.assert_allclose(out, ref, atol=1e-4)


def test_sharded_teacher_step_runs_and_learns(setup):
    g, x = setup
    mesh = make_mesh(8)
    step_fn, tx = make_sharded_teacher_step(
        mesh, num_nodes=g.num_nodes, dropout=0.0, lr=0.01
    )
    params = init_teacher_params(
        jax.random.PRNGKey(0), encoder="sage", in_channels=32,
        hidden_channels=16, num_layers=2, predictor_mode="mlp",
    )
    opt_state = tx.init(params)
    rng = np.random.default_rng(3)
    b = 64  # 8 per device
    pos = jnp.asarray(np.asarray(jax.device_get(g.senders))[:b].reshape(b, 1))
    pos = jnp.concatenate([pos, jnp.asarray(np.asarray(jax.device_get(g.receivers))[:b].reshape(b, 1))], axis=1)
    neg = jnp.asarray(rng.integers(0, g.num_nodes, size=(b, 2)), jnp.int32)
    mask = jnp.ones((b,), bool)

    losses = []
    for i in range(5):
        params, opt_state, loss = step_fn(
            params, opt_state, jax.random.PRNGKey(i), g.senders, g.receivers,
            g.edge_mask, g.in_degree, x, pos, neg, mask,
        )
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]  # optimizes


def test_sharded_student_step_runs(setup):
    g, x = setup
    mesh = make_mesh(8)
    step_fn, tx = make_sharded_student_step(
        mesh, num_nodes=g.num_nodes, dropout=0.0, lr=0.01,
        rw_step=2, hops=2, ns_rate=1,
    )
    params = init_student_params(
        jax.random.PRNGKey(0), in_channels=32, hidden_channels=16,
        num_layers=2, predictor_mode="mlp",
    )
    teacher = init_teacher_params(
        jax.random.PRNGKey(1), encoder="sage", in_channels=32,
        hidden_channels=16, num_layers=2, predictor_mode="mlp",
    )
    t_h = jnp.asarray(np.random.default_rng(2).normal(size=(96, 16)), jnp.float32)
    opt_state = tx.init(params)

    anchors = jnp.arange(32, dtype=jnp.int32)
    amask = jnp.ones((32,), bool)
    pos = jnp.stack(
        [g.senders[:32].astype(jnp.int32), g.receivers[:32].astype(jnp.int32)], axis=1
    )
    neg = jnp.asarray(
        np.random.default_rng(4).integers(0, 96, size=(32, 2)), jnp.int32
    )
    bmask = jnp.ones((32,), bool)

    params, opt_state, loss = step_fn(
        params, opt_state, jax.random.PRNGKey(5), g, x, t_h,
        teacher["predictor"], anchors, amask, pos, neg, bmask,
    )
    assert np.isfinite(float(loss))


def test_sharded_hits_auc_matches_single_device():
    from llp_tpu.ops.metrics import hits_at_k, roc_auc
    from llp_tpu.parallel.eval import make_sharded_hits_auc

    mesh = make_mesh(8)
    rng = np.random.default_rng(7)
    pos = jnp.asarray(rng.normal(size=200).astype(np.float32))
    neg = jnp.asarray(rng.normal(size=512).astype(np.float32))
    fn = make_sharded_hits_auc(mesh, (10, 20, 50))
    out = fn(pos, neg)
    for k in (10, 20, 50):
        ref = float(hits_at_k(pos, neg, k))
        assert abs(float(out[f"Hits@{k}"]) - ref) < 1e-6
    assert abs(float(out["AUC"]) - float(roc_auc(pos, neg))) < 1e-6


def test_measure_scaling_runs():
    from llp_tpu.parallel import measure_scaling

    res = measure_scaling((1, 4), n_nodes=256, dim=32, hidden=32, batch=128, steps=2)
    assert 1 in res and 4 in res
    assert res[1]["edges_per_sec"] > 0
    assert "efficiency" in res[4]


def test_sharded_segsum_spmm_matches_single_device(setup):
    from llp_tpu.ops.pallas.segsum_kernel import build_shard_layouts
    from llp_tpu.parallel.sharded import make_sharded_segsum_spmm

    g, x = setup
    mesh = make_mesh(8)
    layouts = build_shard_layouts(g, 8)
    sh = make_sharded_segsum_spmm(mesh, layouts, g.num_nodes)
    for reduce in ("sum", "mean"):
        ref = np.asarray(spmm(g, x, reduce))
        out = np.asarray(sh(x, g.in_degree, reduce))
        np.testing.assert_allclose(out, ref, atol=1e-4)

    # Gradients route through the per-shard backward layouts.
    def f_sh(x_):
        return jnp.sum(sh(x_, g.in_degree, "mean") ** 2)

    def f_ref(x_):
        return jnp.sum(spmm(g, x_, "mean") ** 2)

    np.testing.assert_allclose(
        np.asarray(jax.grad(f_sh)(x)), np.asarray(jax.grad(f_ref)(x)), atol=1e-3
    )


def test_sharded_teacher_step_with_segsum_layouts(setup):
    from llp_tpu.ops.pallas.segsum_kernel import build_shard_layouts

    g, x = setup
    mesh = make_mesh(8)
    layouts = build_shard_layouts(g, 8)
    step_fn, tx = make_sharded_teacher_step(
        mesh, num_nodes=g.num_nodes, dropout=0.0, lr=0.01,
        segsum_layouts=layouts,
    )
    params = init_teacher_params(
        jax.random.PRNGKey(0), encoder="sage", in_channels=32,
        hidden_channels=16, num_layers=2, predictor_mode="mlp",
    )
    opt_state = tx.init(params)
    rng = np.random.default_rng(3)
    b = 64
    pos = jnp.asarray(np.asarray(jax.device_get(g.senders))[:b].reshape(b, 1))
    pos = jnp.concatenate(
        [pos, jnp.asarray(np.asarray(jax.device_get(g.receivers))[:b].reshape(b, 1))],
        axis=1,
    )
    neg = jnp.asarray(rng.integers(0, g.num_nodes, size=(b, 2)), jnp.int32)
    mask = jnp.ones((b,), bool)

    # Kernel path must agree with the scatter path step-for-step.
    step_ref, tx_ref = make_sharded_teacher_step(
        mesh, num_nodes=g.num_nodes, dropout=0.0, lr=0.01
    )
    p_ref = jax.tree_util.tree_map(lambda a: a.copy(), params)
    s_ref = tx_ref.init(p_ref)

    losses, losses_ref = [], []
    for i in range(5):
        params, opt_state, loss = step_fn(
            params, opt_state, jax.random.PRNGKey(i), g.senders, g.receivers,
            g.edge_mask, g.in_degree, x, pos, neg, mask,
        )
        p_ref, s_ref, l_ref = step_ref(
            p_ref, s_ref, jax.random.PRNGKey(i), g.senders, g.receivers,
            g.edge_mask, g.in_degree, x, pos, neg, mask,
        )
        losses.append(float(loss))
        losses_ref.append(float(l_ref))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    np.testing.assert_allclose(losses, losses_ref, rtol=1e-4, atol=1e-4)


def test_halo_spmm_matches_single_device(setup):
    from llp_tpu.parallel.halo import (
        build_halo_partition,
        make_halo_spmm,
        pad_nodes,
    )

    g, x = setup
    mesh = make_mesh(8)
    part = build_halo_partition(g, 8)
    spmm_fn = make_halo_spmm(mesh, part)
    xs = pad_nodes(x, part)
    degs = pad_nodes(np.asarray(jax.device_get(g.in_degree)), part)

    @partial(jax.jit, static_argnames="reduce")
    def run(xs_, reduce):
        return spmm_fn(xs_, degs, reduce)

    for reduce in ("sum", "mean"):
        ref = np.asarray(spmm(g, x, reduce))
        out = np.asarray(run(xs, reduce))[: g.num_nodes]
        np.testing.assert_allclose(out, ref, atol=1e-4)

    # Gradients reverse the halo exchange (transpose all_to_all + scatter).
    def f_sh(xs_):
        return jnp.sum(spmm_fn(xs_, degs, "mean") ** 2)

    def f_ref(x_):
        return jnp.sum(spmm(g, x_, "mean") ** 2)

    gsh = np.asarray(jax.jit(jax.grad(f_sh))(xs))[: g.num_nodes]
    gref = np.asarray(jax.grad(f_ref)(x))
    np.testing.assert_allclose(gsh, gref, atol=1e-3)


def test_halo_sage_forward_matches_single_device(setup):
    from llp_tpu.models.sage import apply_sage, init_sage
    from llp_tpu.parallel.halo import (
        build_halo_partition,
        make_halo_sage_forward,
        pad_nodes,
    )

    g, x = setup
    mesh = make_mesh(8)
    part = build_halo_partition(g, 8)
    fwd = make_halo_sage_forward(mesh, part)
    params = init_sage(jax.random.PRNGKey(4), int(x.shape[1]), 16, 16, 2)
    xs = pad_nodes(x, part)
    degs = pad_nodes(np.asarray(jax.device_get(g.in_degree)), part)
    for conv in ("sage", "sage_updated"):
        ref = np.asarray(apply_sage(params, g, x, conv=conv))
        out = np.asarray(jax.jit(fwd, static_argnames="conv")(params, xs, degs, conv=conv))
        np.testing.assert_allclose(out[: g.num_nodes], ref, rtol=1e-4, atol=1e-4)


def test_halo_teacher_step_matches_replicated_step(setup):
    """Feature-sharded train step == the replicated-feature DP step,
    loss-for-loss over several updates (same math, different sharding)."""
    from llp_tpu.parallel.halo import (
        build_halo_partition,
        make_halo_teacher_step,
        pad_nodes,
    )

    g, x = setup
    mesh = make_mesh(8)
    part = build_halo_partition(g, 8)
    xs = pad_nodes(x, part)
    degs = pad_nodes(np.asarray(jax.device_get(g.in_degree)), part)

    step_halo, tx_h = make_halo_teacher_step(
        mesh, part, dropout=0.0, lr=0.01
    )
    step_rep, tx_r = make_sharded_teacher_step(
        mesh, num_nodes=g.num_nodes, dropout=0.0, lr=0.01
    )
    params = init_teacher_params(
        jax.random.PRNGKey(0), encoder="sage", in_channels=32,
        hidden_channels=16, num_layers=2, predictor_mode="mlp",
    )
    copy = lambda t: jax.tree_util.tree_map(lambda a: a.copy(), t)
    ph, sh = copy(params), tx_h.init(copy(params))
    pr, sr = copy(params), tx_r.init(copy(params))

    rng = np.random.default_rng(3)
    b = 64
    pos = jnp.asarray(
        np.stack(
            [
                np.asarray(jax.device_get(g.senders))[:b],
                np.asarray(jax.device_get(g.receivers))[:b],
            ],
            axis=1,
        )
    )
    neg = jnp.asarray(rng.integers(0, g.num_nodes, size=(b, 2)), jnp.int32)
    mask = jnp.ones((b,), bool)

    lh, lr_ = [], []
    for i in range(5):
        ph, sh, loss_h = step_halo(
            ph, sh, jax.random.PRNGKey(i), xs, degs, pos, neg, mask
        )
        pr, sr, loss_r = step_rep(
            pr, sr, jax.random.PRNGKey(i), g.senders, g.receivers,
            g.edge_mask, g.in_degree, x, pos, neg, mask,
        )
        lh.append(float(loss_h))
        lr_.append(float(loss_r))
    assert np.isfinite(lh).all()
    assert lh[-1] < lh[0]
    np.testing.assert_allclose(lh, lr_, rtol=1e-4, atol=1e-4)


def test_sharded_teacher_step_matches_single_device(setup):
    """Ground truth: the DP step == a hand-rolled single-device step (same
    model math, same batch, no sharding) — pins the psum'd-gradient fix."""
    from llp_tpu.models.encoder import apply_encoder
    from llp_tpu.models.predictor import apply_link_predictor
    from llp_tpu.ops.losses import bce_loss
    from llp_tpu.train.optim import adam_init, adam_update, clip_by_group_norm

    g, x = setup
    mesh = make_mesh(8)
    step_fn, tx = make_sharded_teacher_step(
        mesh, num_nodes=g.num_nodes, dropout=0.0, lr=0.01
    )
    params = init_teacher_params(
        jax.random.PRNGKey(0), encoder="sage", in_channels=32,
        hidden_channels=16, num_layers=2, predictor_mode="mlp",
    )
    copy = lambda t: jax.tree_util.tree_map(lambda a: a.copy(), t)
    ps, ss = copy(params), tx.init(copy(params))

    rng = np.random.default_rng(3)
    b = 64
    pos_np = np.stack(
        [
            np.asarray(jax.device_get(g.senders))[:b],
            np.asarray(jax.device_get(g.receivers))[:b],
        ],
        axis=1,
    )
    pos = jnp.asarray(pos_np)
    neg = jnp.asarray(rng.integers(0, g.num_nodes, size=(b, 2)), jnp.int32)
    mask = jnp.ones((b,), bool)

    def single_loss(p):
        h = apply_encoder("sage", p["encoder"], g, x, train=False)
        src = jnp.concatenate([pos[:, 0], neg[:, 0]])
        dst = jnp.concatenate([pos[:, 1], neg[:, 1]])
        out = apply_link_predictor(
            p["predictor"], jnp.take(h, src, axis=0), jnp.take(h, dst, axis=0),
            mode="mlp", train=False,
        )
        labels = jnp.concatenate([jnp.ones((b,)), jnp.zeros((b,))])
        return bce_loss(out, labels, jnp.concatenate([mask, mask]))

    tx1, _ = adam_init({}, 0.01)
    p1, s1 = copy(params), tx1.init(copy(params))

    for i in range(4):
        ps, ss, loss_sh = step_fn(
            ps, ss, jax.random.PRNGKey(i), g.senders, g.receivers,
            g.edge_mask, g.in_degree, x, pos, neg, mask,
        )
        l1, grads = jax.value_and_grad(single_loss)(p1)
        grads = clip_by_group_norm(grads, 1.0)
        p1, s1 = adam_update(tx1, grads, s1, p1)
        np.testing.assert_allclose(float(loss_sh), float(l1), rtol=1e-5)
    # The per-step loss equality ON EVOLVING PARAMS is the functional gate:
    # step i+1's loss reflects step i's update (pre-psum-fix this diverged to
    # 4e-2 relative by step 3). A raw end-state param compare is unstable for
    # near-zero-gradient entries under Adam (fp-noise grads -> O(lr) update
    # differences without any loss effect), so it is intentionally omitted.


def test_sharded_student_step_matches_single_device(setup):
    """With the KD terms off (llp_d=llp_r=0) the student step is plain BCE —
    exact ground truth against a hand-rolled single-device step (covers the
    psum'd-gradient fix on the student path)."""
    from llp_tpu.models.mlp import apply_mlp
    from llp_tpu.models.predictor import apply_link_predictor
    from llp_tpu.ops.losses import bce_loss
    from llp_tpu.train.optim import adam_init, adam_update, clip_by_group_norm

    g, x = setup
    mesh = make_mesh(8)
    step_fn, tx = make_sharded_student_step(
        mesh, num_nodes=g.num_nodes, dropout=0.0, lr=0.01,
        true_label=1.0, llp_d=0.0, llp_r=0.0, rw_step=2, hops=1, ns_rate=1,
    )
    params = init_student_params(
        jax.random.PRNGKey(0), in_channels=32, hidden_channels=16,
        num_layers=2, predictor_mode="mlp",
    )
    teacher = init_teacher_params(
        jax.random.PRNGKey(1), encoder="sage", in_channels=32,
        hidden_channels=16, num_layers=2, predictor_mode="mlp",
    )
    t_h = jnp.asarray(np.random.default_rng(2).normal(size=(96, 16)), jnp.float32)
    copy = lambda t: jax.tree_util.tree_map(lambda a: a.copy(), t)
    ps, ss = copy(params), tx.init(copy(params))

    rng = np.random.default_rng(4)
    b = 32
    anchors = jnp.arange(b, dtype=jnp.int32)
    amask = jnp.ones((b,), bool)
    pos = jnp.stack(
        [g.senders[:b].astype(jnp.int32), g.receivers[:b].astype(jnp.int32)],
        axis=1,
    )
    neg = jnp.asarray(rng.integers(0, 96, size=(b, 2)), jnp.int32)
    bmask = jnp.ones((b,), bool)

    def single_loss(p):
        h = apply_mlp(p["encoder"], x)
        src = jnp.concatenate([pos[:, 0], neg[:, 0]])
        dst = jnp.concatenate([pos[:, 1], neg[:, 1]])
        out = apply_link_predictor(
            p["predictor"], jnp.take(h, src, axis=0), jnp.take(h, dst, axis=0),
            mode="mlp", train=False,
        )
        labels = jnp.concatenate([jnp.ones((b,)), jnp.zeros((b,))])
        return bce_loss(out, labels, jnp.concatenate([bmask, bmask]))

    tx1, _ = adam_init({}, 0.01)
    p1, s1 = copy(params), tx1.init(copy(params))
    for i in range(4):
        ps, ss, loss_sh = step_fn(
            ps, ss, jax.random.PRNGKey(i), g, x, t_h, teacher["predictor"],
            anchors, amask, pos, neg, bmask,
        )
        l1, grads = jax.value_and_grad(single_loss)(p1)
        grads = clip_by_group_norm(grads, 1.0)
        p1, s1 = adam_update(tx1, grads, s1, p1)
        np.testing.assert_allclose(float(loss_sh), float(l1), rtol=1e-5)


def test_halo_partition_non_divisible_and_isolated():
    """n % P != 0 (padded owner rows) and isolated nodes must stay exact."""
    from llp_tpu.parallel.halo import (
        build_halo_partition,
        make_halo_spmm,
        pad_nodes,
    )

    n = 97  # 8 shards -> n_per=13, 7 padded rows on the last shard
    m = 90  # nodes 90..96 isolated
    ei = np.stack(
        [np.arange(m, dtype=np.int64), (np.arange(m, dtype=np.int64) + 7) % m]
    )
    both = np.concatenate([ei, ei[::-1]], axis=1)
    g = build_graph(both, n)
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.normal(size=(n, 16)), jnp.float32)

    mesh = make_mesh(8)
    part = build_halo_partition(g, 8)
    spmm_fn = make_halo_spmm(mesh, part)
    xs = pad_nodes(x, part)
    degs = pad_nodes(np.asarray(jax.device_get(g.in_degree)), part)
    for reduce in ("sum", "mean"):
        ref = np.asarray(spmm(g, x, reduce))
        out = np.asarray(
            partial(jax.jit, static_argnames="reduce")(
                lambda xs_, reduce: spmm_fn(xs_, degs, reduce)
            )(xs, reduce=reduce)
        )[:n]
        np.testing.assert_allclose(out, ref, atol=1e-4)
        # isolated nodes aggregate to zero under both reduces
        np.testing.assert_array_equal(out[m:], 0.0)


def test_sharded_topk_partners_matches_single_device():
    from llp_tpu.models.predictor import init_link_predictor
    from llp_tpu.parallel.eval import make_sharded_topk_partners
    from llp_tpu.serve import top_k_partners

    mesh = make_mesh(8)
    rng = np.random.default_rng(11)
    n, h_dim, k = 203, 16, 6
    h = jnp.asarray(rng.normal(size=(n, h_dim)), jnp.float32)
    pred = init_link_predictor(jax.random.PRNGKey(3), "mlp", h_dim, h_dim, 1, 2)
    qi = jnp.asarray(np.array([0, 50, 202], np.int32))

    n_pad = ((n + 7) // 8) * 8
    h_pad = jnp.concatenate([h, jnp.zeros((n_pad - n, h_dim), jnp.float32)])
    fn = make_sharded_topk_partners(
        mesh, k=k, mode="mlp", num_nodes=n, block=16
    )
    vals, ids = fn(pred, h_pad, jnp.take(h, qi, axis=0), qi)

    ref_vals, ref_ids = top_k_partners(pred, h, qi, k=k, mode="mlp", block=64)
    np.testing.assert_allclose(np.asarray(vals), np.asarray(ref_vals), atol=1e-5)
    # ties may reorder ids; scores at the returned ids must match
    full = np.asarray(h)
    for r in range(len(np.asarray(qi))):
        assert np.asarray(qi)[r] not in np.asarray(ids)[r]

    # approx merge (ApproxTopK is exact on the CPU backend) — same results
    fn_a = make_sharded_topk_partners(
        mesh, k=k, mode="mlp", num_nodes=n, block=16, approx=True
    )
    vals_a, ids_a = fn_a(pred, h_pad, jnp.take(h, qi, axis=0), qi)
    np.testing.assert_allclose(np.asarray(vals_a), np.asarray(vals), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(ids_a), np.asarray(ids))


def test_sharded_serve_pipeline_encode_to_topk():
    """Full distributed serving path: node-sharded (halo) GNN encode composes
    with node-sharded top-K partner retrieval — the huge-graph deployment
    where neither the feature matrix nor the embedding table replicates.
    Exact vs single-device encode + retrieval."""
    import jax.numpy as jnp

    from llp_tpu.core import build_graph
    from llp_tpu.data.synthetic import community_features, sbm_graph
    from llp_tpu.models.encoder import apply_encoder
    from llp_tpu.parallel.eval import (
        make_halo_encode,
        make_sharded_topk_partners,
    )
    from llp_tpu.parallel.halo import build_halo_partition, pad_nodes
    from llp_tpu.serve import top_k_partners
    from llp_tpu.train.teacher import init_teacher_params

    mesh = make_mesh(8)
    n, k = 203, 5
    ei, comm = sbm_graph(n, 4, 6.0, seed=21)
    x = jnp.asarray(community_features(comm, 24, kind="gauss", seed=21))
    g = build_graph(ei, n)
    params = init_teacher_params(
        jax.random.PRNGKey(17), encoder="sage", in_channels=24,
        hidden_channels=16, num_layers=2, predictor_mode="mlp",
    )

    part = build_halo_partition(g, 8)
    encode = make_halo_encode(mesh, part, "sage", "sage", "none", "data")
    h_sh = jax.jit(encode)(
        params,
        pad_nodes(x, part),
        pad_nodes(np.asarray(jax.device_get(g.in_degree)), part),
    )
    qi = jnp.asarray(np.array([0, 50, 202], np.int32))
    q_h = jnp.take(h_sh, qi, axis=0)
    topk = make_sharded_topk_partners(
        mesh, k=k, mode="mlp", num_nodes=n, block=16
    )
    vals, ids = topk(params["predictor"], h_sh, q_h, qi)

    h_ref = apply_encoder("sage", params["encoder"], g, x, train=False)
    ref_vals, _ = top_k_partners(
        params["predictor"], h_ref, qi, k=k, mode="mlp", block=64
    )
    np.testing.assert_allclose(
        np.asarray(vals), np.asarray(ref_vals), atol=1e-5
    )
    for r in range(len(np.asarray(qi))):
        assert np.asarray(qi)[r] not in np.asarray(ids)[r]


def test_pmean_gradient_semantics_vs_ground_truth():
    """Pins the gradient rule every sharded train step relies on: when the
    per-device loss is the REPLICATED (fully psum'd) scalar, pmean of the
    per-device grad pieces — NOT psum — equals jax.grad of the equivalent
    single-device loss, under check_vma=False and =True alike (the ndev
    replicated loss copies inject ndev cotangents, so psum is ndev× too
    large; the error is invisible to Adam's scale invariance except at the
    clip boundary, which is how it originally slipped through)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    mesh = make_mesh(8)
    rng = np.random.default_rng(11)
    w = jnp.asarray(rng.normal(size=(6,)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(32, 6)), jnp.float32)  # batch sharded
    fmask = jnp.asarray(rng.random(32) > 0.3)

    def ref_loss(w):
        elt = jnp.tanh(v @ w)
        m = fmask.astype(jnp.float32)
        return jnp.sum(elt * m) / jnp.maximum(jnp.sum(m), 1.0)

    g_true = np.asarray(jax.grad(ref_loss)(w))

    def body(w, v_loc, m_loc):
        def loss_fn(w):
            m = m_loc.astype(jnp.float32)
            num = jax.lax.psum(jnp.sum(jnp.tanh(v_loc @ w) * m), "data")
            den = jax.lax.psum(jnp.sum(m), "data")
            return num / jnp.maximum(den, 1.0)

        loss, g = jax.value_and_grad(loss_fn)(w)
        return loss, jax.lax.pmean(g, "data")

    for cv in (False, True):
        f = shard_map(
            body, mesh=mesh, in_specs=(P(), P("data"), P("data")),
            out_specs=(P(), P()), check_vma=cv,
        )
        loss, g = f(w, v, fmask)
        np.testing.assert_allclose(float(loss), float(ref_loss(w)), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(g), g_true, rtol=1e-5, atol=1e-7)


def test_sharded_predictor_dropout_decorrelates_across_batch_shards():
    """Predictor dropout masks must differ across batch shards.

    Construction: all real edges live on device 0's edge shard (device 1's is
    fully masked), so h is identical between a 2-device mesh and a 1-device
    mesh; the 2-device batch is two IDENTICAL copies of the 1-device batch.
    With dropout=0 the psum'd losses then agree exactly (sanity gate). With
    dropout>0 they must NOT agree: equality would mean both shards drew the
    same mask bits for different batch rows (the pre-fix device-invariant
    predictor key)."""
    n, m, b, d = 48, 120, 24, 16
    rng = np.random.default_rng(5)
    src = rng.integers(0, n, size=m).astype(np.int64)
    dst = rng.integers(0, n, size=m).astype(np.int64)

    senders = jnp.asarray(np.concatenate([src, np.zeros(m, np.int64)]), jnp.int32)
    receivers = jnp.asarray(np.concatenate([dst, np.zeros(m, np.int64)]), jnp.int32)
    emask = jnp.asarray(np.concatenate([np.ones(m, bool), np.zeros(m, bool)]))
    in_deg = jnp.asarray(
        np.bincount(dst, minlength=n).astype(np.float32)
    )
    x = jnp.asarray(rng.normal(size=(n, d)), jnp.float32)

    pos1 = jnp.asarray(rng.integers(0, n, size=(b, 2)), jnp.int32)
    neg1 = jnp.asarray(rng.integers(0, n, size=(b, 2)), jnp.int32)
    mask1 = jnp.ones((b,), bool)
    pos2 = jnp.concatenate([pos1, pos1])
    neg2 = jnp.concatenate([neg1, neg1])
    mask2 = jnp.ones((2 * b,), bool)

    params = init_teacher_params(
        jax.random.PRNGKey(0), encoder="sage", in_channels=d,
        hidden_channels=8, num_layers=2, predictor_mode="mlp",
    )

    def loss_at(dropout):
        out = []
        for ndev, pos, neg, msk in ((1, pos1, neg1, mask1), (2, pos2, neg2, mask2)):
            step_fn, tx = make_sharded_teacher_step(
                make_mesh(ndev), num_nodes=n, dropout=dropout, lr=0.01
            )
            p = jax.tree_util.tree_map(lambda a: a.copy(), params)
            _, _, loss = step_fn(
                p, tx.init(p), jax.random.PRNGKey(3), senders, receivers,
                emask, in_deg, x, pos, neg, msk,
            )
            out.append(float(loss))
        return out

    l1, l2 = loss_at(0.0)
    np.testing.assert_allclose(l1, l2, rtol=1e-6)  # identical-h construction
    l1, l2 = loss_at(0.5)
    assert abs(l1 - l2) > 1e-4, (
        "2-device loss equals 1-device loss under dropout: batch shards are "
        "drawing identical predictor mask bits"
    )
