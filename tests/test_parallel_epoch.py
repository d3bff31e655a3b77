"""Sharded whole-epoch training (llp_tpu.parallel.epoch) vs the single-device
epoch programs: with dropout=0 and mesh-divisible batch sizes the sharded
epoch must reproduce the single-device trajectory to float tolerance
(psum changes the summation order only).

Runs on the 8-virtual-CPU-device mesh (conftest)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from llp_tpu.core import build_graph
from llp_tpu.data.synthetic import community_features, sbm_graph
from llp_tpu.parallel.epoch import (
    make_sharded_student_epoch_fn,
    make_sharded_teacher_epoch_fn,
)
from llp_tpu.sample.negative import edge_hash_keys
from llp_tpu.train.student import init_student_params, make_student_epoch_fn
from llp_tpu.train.teacher import init_teacher_params, make_teacher_epoch_fn

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)

NDEV = 8


def _mesh():
    return Mesh(np.asarray(jax.devices()[:NDEV]), ("data",))


def _problem(n=200, k=4, deg=6.0, d=32, seed=5):
    ei, comm = sbm_graph(n, k, deg, seed=seed)
    x = jnp.asarray(community_features(comm, d, kind="gauss", seed=seed))
    g = build_graph(ei, n)  # default pad multiple 128 divides the 8-mesh
    pos = jnp.asarray(ei.T.astype(np.int32))
    keys = jnp.asarray(edge_hash_keys(ei, n))
    return g, x, pos, keys


def _copy(t):
    return jax.tree_util.tree_map(lambda a: jnp.asarray(a).copy(), t)


def _assert_trees_close(a, b, rtol=2e-4, atol=2e-5):
    la, lb = jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), rtol=rtol, atol=atol
        )


def _run_epochs(epoch_fn, tx, params, args, n_epochs, seed0=100):
    params = _copy(params)
    opt_state = tx.init(params)
    losses = []
    for ep in range(n_epochs):
        params, opt_state, loss = epoch_fn(
            params, opt_state, jax.random.PRNGKey(seed0 + ep), *args
        )
        losses.append(float(loss))
    return params, losses


def _teacher_kwargs(g, pos, **over):
    kw = dict(
        encoder="sage", predictor_mode="mlp", dropout=0.0,
        num_nodes=g.num_nodes, num_pos_edges=int(pos.shape[0]),
        link_batch_size=256, neg_mode="dense", lr=0.01,
    )
    kw.update(over)
    return kw


@pytest.mark.parametrize(
    "encoder,conv,neg_mode",
    [
        ("sage", "sage", "dense"),
        ("sage", "sage_updated", "uniform"),
        ("gcn", "sage", "dense"),
    ],
)
def test_sharded_teacher_epoch_matches_single_device(encoder, conv, neg_mode):
    g, x, pos, keys = _problem()
    kw = _teacher_kwargs(g, pos, encoder=encoder, conv=conv, neg_mode=neg_mode)
    ref_fn, tx = make_teacher_epoch_fn(**kw, spmm_impl="xla")
    sh_fn, _ = make_sharded_teacher_epoch_fn(_mesh(), **kw)
    params = init_teacher_params(
        jax.random.PRNGKey(0), encoder=encoder, in_channels=int(x.shape[1]),
        hidden_channels=32, num_layers=2, predictor_mode="mlp",
    )
    p_ref, l_ref = _run_epochs(ref_fn, tx, params, (g, x, pos, keys), 2)
    p_sh, l_sh = _run_epochs(sh_fn, tx, params, (g, x, pos, keys), 2)
    np.testing.assert_allclose(l_sh, l_ref, rtol=1e-4, atol=1e-5)
    _assert_trees_close(p_sh, p_ref)


def test_sharded_teacher_segsum_layouts_path():
    from llp_tpu.ops.pallas.segsum_kernel import build_shard_layouts

    g, x, pos, keys = _problem()
    kw = _teacher_kwargs(g, pos)
    ref_fn, tx = make_teacher_epoch_fn(**kw, spmm_impl="xla")
    sh_fn, _ = make_sharded_teacher_epoch_fn(
        _mesh(), **kw, segsum_layouts=build_shard_layouts(g, NDEV)
    )
    params = init_teacher_params(
        jax.random.PRNGKey(3), encoder="sage", in_channels=int(x.shape[1]),
        hidden_channels=32, num_layers=2, predictor_mode="mlp",
    )
    p_ref, l_ref = _run_epochs(ref_fn, tx, params, (g, x, pos, keys), 2)
    p_sh, l_sh = _run_epochs(sh_fn, tx, params, (g, x, pos, keys), 2)
    np.testing.assert_allclose(l_sh, l_ref, rtol=1e-4, atol=1e-5)
    _assert_trees_close(p_sh, p_ref)


@pytest.mark.parametrize("encoder", ["sage", "gcn"])
def test_sharded_teacher_weighted_matches_single_device(encoder):
    """Edge-WEIGHTED DP training: per-edge weights shard with the edges, the
    precomputed (replicated) weighted in-degree normalizes, and the sharded
    trajectory reproduces the single-device weighted epoch."""
    n, d = 200, 32
    from llp_tpu.data.synthetic import community_features, sbm_graph

    ei, comm = sbm_graph(n, 4, 6.0, seed=5)
    rng = np.random.default_rng(3)
    w = rng.uniform(0.5, 4.0, size=ei.shape[1]).astype(np.float32)
    x = jnp.asarray(community_features(comm, d, kind="gauss", seed=5))
    g = build_graph(ei, n, edge_weight=w)
    pos = jnp.asarray(ei.T.astype(np.int32))
    keys = jnp.asarray(edge_hash_keys(ei, n))
    kw = _teacher_kwargs(g, pos, encoder=encoder)
    ref_fn, tx = make_teacher_epoch_fn(**kw, spmm_impl="xla")
    sh_fn, _ = make_sharded_teacher_epoch_fn(_mesh(), **kw)
    params = init_teacher_params(
        jax.random.PRNGKey(0), encoder=encoder, in_channels=d,
        hidden_channels=32, num_layers=2, predictor_mode="mlp",
    )
    p_ref, l_ref = _run_epochs(ref_fn, tx, params, (g, x, pos, keys), 2)
    p_sh, l_sh = _run_epochs(sh_fn, tx, params, (g, x, pos, keys), 2)
    np.testing.assert_allclose(l_sh, l_ref, rtol=1e-4, atol=1e-5)
    _assert_trees_close(p_sh, p_ref)


def test_sharded_teacher_epochs_per_call_fusion():
    g, x, pos, keys = _problem()
    kw = _teacher_kwargs(g, pos)
    sh_fn, tx = make_sharded_teacher_epoch_fn(_mesh(), **kw)
    blk_fn, _ = make_sharded_teacher_epoch_fn(_mesh(), **kw, epochs_per_call=2)
    params = init_teacher_params(
        jax.random.PRNGKey(1), encoder="sage", in_channels=int(x.shape[1]),
        hidden_channels=16, num_layers=2, predictor_mode="mlp",
    )
    p1, l1 = _run_epochs(sh_fn, tx, params, (g, x, pos, keys), 2)
    p2 = _copy(params)
    opt2 = tx.init(p2)
    ekeys = jnp.stack([jax.random.PRNGKey(100), jax.random.PRNGKey(101)])
    p2, opt2, l2 = blk_fn(p2, opt2, ekeys, g, x, pos, keys)
    np.testing.assert_allclose(np.asarray(l2), l1, rtol=1e-5, atol=1e-6)
    _assert_trees_close(p2, p1, rtol=1e-5, atol=1e-6)


def test_sharded_teacher_nondivisible_batch_runs_and_learns():
    # b=60 is not a multiple of 8 -> padded to 64 local slices (masked);
    # batch composition then differs from the single-device epoch, so this
    # gates behavior (finite, optimizes), not parity.
    g, x, pos, keys = _problem()
    kw = _teacher_kwargs(g, pos, link_batch_size=60)
    sh_fn, tx = make_sharded_teacher_epoch_fn(_mesh(), **kw)
    params = init_teacher_params(
        jax.random.PRNGKey(2), encoder="sage", in_channels=int(x.shape[1]),
        hidden_channels=16, num_layers=2, predictor_mode="mlp",
    )
    _, losses = _run_epochs(sh_fn, tx, params, (g, x, pos, keys), 4)
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def _student_kwargs(g, pos, **over):
    kw = dict(
        num_nodes=g.num_nodes, num_pos_edges=int(pos.shape[0]),
        link_batch_size=256, node_batch_size=64, predictor_mode="mlp",
        dropout=0.0, lr=0.01, true_label=0.5, kd_rm=0.1, kd_lm=0.1,
        llp_d=1.0, llp_r=1.0, margin=0.1, rw_step=2, hops=2, ns_rate=1,
        neg_mode="dense",
    )
    kw.update(over)
    return kw


def _student_setup(g, x, hidden=32):
    t_h = jnp.asarray(
        np.random.default_rng(0).normal(size=(g.num_nodes, hidden)), jnp.float32
    )
    teacher = init_teacher_params(
        jax.random.PRNGKey(9), encoder="sage", in_channels=int(x.shape[1]),
        hidden_channels=hidden, num_layers=2, predictor_mode="mlp",
    )
    params = init_student_params(
        jax.random.PRNGKey(2), in_channels=int(x.shape[1]),
        hidden_channels=hidden, num_layers=2, predictor_mode="mlp",
    )
    return t_h, teacher["predictor"], params


@pytest.mark.parametrize("minibatch", [False, True])
def test_sharded_student_epoch_matches_single_device(minibatch):
    g, x, pos, keys = _problem()
    kw = _student_kwargs(g, pos, minibatch=minibatch)
    t_h, tpred, params = _student_setup(g, x)
    ref_fn, tx = make_student_epoch_fn(**kw)
    sh_fn, _ = make_sharded_student_epoch_fn(_mesh(), **kw)
    args = (g, x, t_h, tpred, pos, keys)
    p_ref, l_ref = _run_epochs(ref_fn, tx, params, args, 2)
    p_sh, l_sh = _run_epochs(sh_fn, tx, params, args, 2)
    np.testing.assert_allclose(l_sh, l_ref, rtol=1e-4, atol=1e-5)
    _assert_trees_close(p_sh, p_ref)


def test_sharded_student_llp_r_chunk_equivalence():
    g, x, pos, keys = _problem()
    t_h, tpred, params = _student_setup(g, x)
    base = _student_kwargs(g, pos)
    f_all, tx = make_sharded_student_epoch_fn(_mesh(), **base)
    f_chunk, _ = make_sharded_student_epoch_fn(_mesh(), **base, llp_r_chunk=5)
    args = (g, x, t_h, tpred, pos, keys)
    p1, l1 = _run_epochs(f_all, tx, params, args, 1)
    p2, l2 = _run_epochs(f_chunk, tx, params, args, 1)
    np.testing.assert_allclose(l2, l1, rtol=1e-5, atol=1e-6)
    _assert_trees_close(p2, p1, rtol=1e-5, atol=1e-6)


def _pad_rows(arr, ndev):
    a = jnp.asarray(arr)
    n_per = -(-a.shape[0] // ndev)
    pad = ndev * n_per - a.shape[0]
    if pad == 0:
        return a
    return jnp.pad(a, [(0, pad)] + [(0, 0)] * (a.ndim - 1))


def test_table_gather_per_device_indices():
    """Each device receives the gather of ITS OWN index slice (the per-device
    indices are generally different — a psum of masked local gathers would
    mix index sets across devices; regression test for that bug)."""
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    from llp_tpu.parallel.epoch import table_gather

    rng = np.random.default_rng(3)
    n, d, b = 201, 16, 5  # b per device
    x = jnp.asarray(rng.normal(size=(n, d)), jnp.float32)
    n_per = -(-n // NDEV)
    x_tab = _pad_rows(x, NDEV)
    idx = jnp.asarray(rng.integers(0, n, size=(NDEV * b,)), jnp.int32)

    def body(xs, i):
        return table_gather(xs, i, n_per, "data")

    out = jax.jit(
        lambda xs, i: shard_map(
            body, mesh=_mesh(), in_specs=(P("data"), P("data")),
            out_specs=P("data"), check_vma=False,
        )(xs, i)
    )(x_tab, idx)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(jnp.take(x, idx, axis=0)), rtol=1e-6,
        atol=1e-6,
    )


def test_table_student_epoch_matches_single_device():
    """feature_sharding='table' (owner-sharded x + teacher table, psum
    gathers) reproduces the single-device minibatch trajectory. n=201 covers
    padded owner rows."""
    g, x, pos, keys = _problem(n=201)
    kw = _student_kwargs(g, pos, minibatch=True)
    t_h, tpred, params = _student_setup(g, x)
    ref_fn, tx = make_student_epoch_fn(**kw)
    tab_fn, _ = make_sharded_student_epoch_fn(
        _mesh(), **kw, feature_sharding="table"
    )
    x_tab, t_h_tab = _pad_rows(x, NDEV), _pad_rows(t_h, NDEV)
    p_ref, l_ref = _run_epochs(ref_fn, tx, params, (g, x, t_h, tpred, pos, keys), 2)
    p_tab, l_tab = _run_epochs(
        tab_fn, tx, params, (g, x_tab, t_h_tab, tpred, pos, keys), 2
    )
    np.testing.assert_allclose(l_tab, l_ref, rtol=1e-4, atol=1e-5)
    _assert_trees_close(p_tab, p_ref)


def test_table_student_requires_minibatch():
    g, x, pos, keys = _problem()
    with pytest.raises(ValueError, match="minibatch"):
        make_sharded_student_epoch_fn(
            _mesh(), **_student_kwargs(g, pos, minibatch=False),
            feature_sharding="table",
        )


def test_table_transductive_eval_matches_single_device():
    """Row-parallel MLP eval over the owner-sharded table returns the
    replicated metrics and embeddings."""
    from llp_tpu.evaln.transductive import make_transductive_eval_fn
    from llp_tpu.parallel.eval import make_table_transductive_eval_fn
    from llp_tpu.train.student import init_student_params

    g, x, pos, keys = _problem(n=201)
    params = init_student_params(
        jax.random.PRNGKey(8), in_channels=int(x.shape[1]),
        hidden_channels=32, num_layers=2, predictor_mode="mlp",
    )
    rng = np.random.default_rng(11)
    mk = lambda m: jnp.asarray(
        rng.integers(0, g.num_nodes, size=(m, 2)), jnp.int32
    )
    vp, vn, tp, tn = mk(40), mk(64), mk(40), mk(64)
    ks = (10, 20)
    ref_fn = make_transductive_eval_fn(
        encoder="mlp", predictor_mode="mlp", hits_ks=ks
    )
    tab_fn = make_table_transductive_eval_fn(
        _mesh(), predictor_mode="mlp", hits_ks=ks
    )
    r_ref, h_ref = ref_fn(params, g, x, vp, vn, tp, tn)
    r_tab, h_tab = tab_fn(params, _pad_rows(x, NDEV), vp, vn, tp, tn)
    for k in r_ref:
        np.testing.assert_allclose(
            np.asarray(r_tab[k]), np.asarray(r_ref[k]), rtol=1e-5, atol=1e-6
        )
    np.testing.assert_allclose(
        np.asarray(h_tab)[: g.num_nodes], np.asarray(h_ref), rtol=2e-4,
        atol=2e-5,
    )


def test_sharded_student_minibatch_batchnorm_matches_single_device():
    """Sharded minibatch + batch norm: the psum'd cross-device batch
    statistics reproduce the single-device minibatch step (the gathered
    global batch is the same multiset of rows; mesh-divisible batches).

    Gate: per-epoch LOSS parity across 3 epochs.  Epoch k's loss is computed
    with epoch k-1's trained params, so a wrong forward statistic OR a wrong
    backward (un-psum'd moment gradients) would blow the later losses far
    past tolerance.  Exact param parity is unattainable here: batch norm
    makes the pre-BN bias a zero-gradient (degenerate) direction, and Adam
    amplifies implementation-level float noise there to O(lr) steps — so the
    param check is a loose gross-error bound only."""
    g, x, pos, keys = _problem()
    kw = _student_kwargs(g, pos, minibatch=True, norm_type="batch",
                         kd_rm=0.0, kd_lm=0.0)
    t_h, tpred, _ = _student_setup(g, x)
    params = init_student_params(
        jax.random.PRNGKey(2), in_channels=int(x.shape[1]),
        hidden_channels=32, num_layers=2, predictor_mode="mlp",
        norm_type="batch",
    )
    ref_fn, tx = make_student_epoch_fn(**kw)
    sh_fn, _ = make_sharded_student_epoch_fn(_mesh(), **kw)
    args = (g, x, t_h, tpred, pos, keys)
    p_ref, l_ref = _run_epochs(ref_fn, tx, params, args, 3)
    p_sh, l_sh = _run_epochs(sh_fn, tx, params, args, 3)
    np.testing.assert_allclose(l_sh, l_ref, rtol=1e-4, atol=1e-5)
    _assert_trees_close(p_sh, p_ref, rtol=1.0, atol=2e-2)


def _halo_setup(g, x):
    from llp_tpu.parallel.halo import build_halo_partition, pad_nodes

    part = build_halo_partition(g, NDEV)
    x_sh = pad_nodes(x, part)
    deg_sh = pad_nodes(np.asarray(jax.device_get(g.in_degree)), part)
    return part, x_sh, deg_sh


@pytest.mark.parametrize(
    "encoder,conv,n",
    [("sage", "sage", 200), ("sage", "sage_updated", 201), ("gcn", "sage", 201)],
)
def test_halo_teacher_epoch_matches_single_device(encoder, conv, n):
    """Feature-sharded (halo) whole-epoch training reproduces the
    single-device trajectory (n=201 covers padded owner rows; gcn gates the
    node-sharded factored sym-norm against the replicated one)."""
    from llp_tpu.parallel.epoch import make_halo_teacher_epoch_fn

    g, x, pos, keys = _problem(n=n)
    kw = _teacher_kwargs(g, pos, encoder=encoder, conv=conv)
    ref_fn, tx = make_teacher_epoch_fn(**kw, spmm_impl="xla")
    part, x_sh, deg_sh = _halo_setup(g, x)
    halo_fn, _ = make_halo_teacher_epoch_fn(_mesh(), part, **kw)
    params = init_teacher_params(
        jax.random.PRNGKey(4), encoder=encoder, in_channels=int(x.shape[1]),
        hidden_channels=32, num_layers=2, predictor_mode="mlp",
    )
    p_ref, l_ref = _run_epochs(ref_fn, tx, params, (g, x, pos, keys), 2)
    p_halo, l_halo = _run_epochs(
        halo_fn, tx, params, (x_sh, deg_sh, pos, keys), 2
    )
    np.testing.assert_allclose(l_halo, l_ref, rtol=1e-4, atol=1e-5)
    _assert_trees_close(p_halo, p_ref)


@pytest.mark.parametrize(
    "encoder,conv", [("sage", "sage"), ("sage", "sage_updated"), ("gcn", "sage")]
)
def test_halo_teacher_weighted_matches_single_device(encoder, conv):
    """Edge-WEIGHTED halo training: per-slot weights bake into the exchange
    plan and the weighted degree is the partition's degree vector — the
    feature-sharded trajectory reproduces the single-device weighted epoch
    (n=201 covers padded owner rows)."""
    from llp_tpu.data.synthetic import community_features, sbm_graph
    from llp_tpu.parallel.epoch import make_halo_teacher_epoch_fn
    from llp_tpu.parallel.halo import build_halo_partition, pad_nodes

    n, d = 201, 32
    ei, comm = sbm_graph(n, 4, 6.0, seed=5)
    rng = np.random.default_rng(7)
    w = rng.uniform(0.5, 4.0, size=ei.shape[1]).astype(np.float32)
    x = jnp.asarray(community_features(comm, d, kind="gauss", seed=5))
    g = build_graph(ei, n, edge_weight=w)
    pos = jnp.asarray(ei.T.astype(np.int32))
    keys = jnp.asarray(edge_hash_keys(ei, n))
    kw = _teacher_kwargs(g, pos, encoder=encoder, conv=conv)
    ref_fn, tx = make_teacher_epoch_fn(**kw, spmm_impl="xla")
    part = build_halo_partition(g, NDEV)
    assert part.loc_w is not None and part.rem_w is not None
    x_sh = pad_nodes(x, part)
    wdeg_sh = pad_nodes(np.asarray(jax.device_get(g.w_in_degree)), part)
    halo_fn, _ = make_halo_teacher_epoch_fn(_mesh(), part, **kw)
    params = init_teacher_params(
        jax.random.PRNGKey(4), encoder=encoder, in_channels=d,
        hidden_channels=32, num_layers=2, predictor_mode="mlp",
    )
    p_ref, l_ref = _run_epochs(ref_fn, tx, params, (g, x, pos, keys), 2)
    p_halo, l_halo = _run_epochs(
        halo_fn, tx, params, (x_sh, wdeg_sh, pos, keys), 2
    )
    # 2e-4: weighted fp32 sums accumulate in a different order (local+remote
    # split vs the single sorted scatter) and one epoch of training amplifies
    # the reassociation noise slightly beyond the unweighted 1e-4.
    np.testing.assert_allclose(l_halo, l_ref, rtol=2e-4, atol=1e-5)
    if encoder == "gcn":
        # The weighted sym-norm's rsqrt + Adam amplify the same float noise
        # faster along small-gradient leaves; the AGGREGATION itself is exact
        # (direct halo-vs-single weighted Âx comparison measures 5e-7), so
        # the trajectory check is a looser bound here.
        _assert_trees_close(p_halo, p_ref, rtol=0.2, atol=1e-2)
    else:
        _assert_trees_close(p_halo, p_ref)


def test_halo_teacher_epoch_fusion_matches_per_epoch():
    from llp_tpu.parallel.epoch import make_halo_teacher_epoch_fn

    g, x, pos, keys = _problem()
    kw = _teacher_kwargs(g, pos)
    part, x_sh, deg_sh = _halo_setup(g, x)
    f1, tx = make_halo_teacher_epoch_fn(_mesh(), part, **kw)
    f2, _ = make_halo_teacher_epoch_fn(_mesh(), part, **kw, epochs_per_call=2)
    params = init_teacher_params(
        jax.random.PRNGKey(5), encoder="sage", in_channels=int(x.shape[1]),
        hidden_channels=16, num_layers=2, predictor_mode="mlp",
    )
    p1, l1 = _run_epochs(f1, tx, params, (x_sh, deg_sh, pos, keys), 2)
    p2 = _copy(params)
    ekeys = jnp.stack([jax.random.PRNGKey(100), jax.random.PRNGKey(101)])
    p2, _, l2 = f2(p2, tx.init(p2), ekeys, x_sh, deg_sh, pos, keys)
    np.testing.assert_allclose(np.asarray(l2), l1, rtol=1e-5, atol=1e-6)
    _assert_trees_close(p2, p1, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("norm_type,n", [("batch", 201), ("layer", 201)])
def test_halo_teacher_epoch_norms_match_single_device(norm_type, n):
    """Halo training with inter-layer norms reproduces the single-device
    trajectory: batch norm psums its moments across the mesh with the
    partition's padding rows masked (n=201 forces padded owner rows), layer
    norm is per-row and shards trivially."""
    from llp_tpu.parallel.epoch import make_halo_teacher_epoch_fn

    g, x, pos, keys = _problem(n=n)
    kw = _teacher_kwargs(g, pos, norm_type=norm_type)
    ref_fn, tx = make_teacher_epoch_fn(**kw, spmm_impl="xla")
    part, x_sh, deg_sh = _halo_setup(g, x)
    halo_fn, _ = make_halo_teacher_epoch_fn(_mesh(), part, **kw)
    params = init_teacher_params(
        jax.random.PRNGKey(4), encoder="sage", in_channels=int(x.shape[1]),
        hidden_channels=32, num_layers=2, predictor_mode="mlp",
        norm_type=norm_type,
    )
    p_ref, l_ref = _run_epochs(ref_fn, tx, params, (g, x, pos, keys), 3)
    p_halo, l_halo = _run_epochs(
        halo_fn, tx, params, (x_sh, deg_sh, pos, keys), 3
    )
    np.testing.assert_allclose(l_halo, l_ref, rtol=1e-4, atol=1e-5)
    if norm_type == "batch":
        # Batch norm makes the pre-BN bias a zero-gradient direction — Adam
        # amplifies float noise there to O(lr); the LOSS trajectory above is
        # the exactness gate (wrong psum'd stats would blow epochs 2-3),
        # params get a gross-error bound only.
        _assert_trees_close(p_halo, p_ref, rtol=1.0, atol=2e-2)
    else:
        _assert_trees_close(p_halo, p_ref)


@pytest.mark.parametrize("encoder", ["sage", "gcn"])
def test_halo_transductive_eval_matches_single_device(encoder):
    """Feature-sharded eval (node-sharded encode + GSPMD scoring) returns the
    single-device metrics and embeddings."""
    from llp_tpu.evaln.transductive import make_transductive_eval_fn
    from llp_tpu.parallel.eval import make_halo_transductive_eval_fn

    g, x, pos, keys = _problem(n=201)
    part, x_sh, deg_sh = _halo_setup(g, x)
    params = init_teacher_params(
        jax.random.PRNGKey(6), encoder=encoder, in_channels=int(x.shape[1]),
        hidden_channels=32, num_layers=2, predictor_mode="mlp",
    )
    rng = np.random.default_rng(7)
    mk = lambda m: jnp.asarray(
        rng.integers(0, g.num_nodes, size=(m, 2)), jnp.int32
    )
    vp, vn, tp, tn = mk(40), mk(64), mk(40), mk(64)
    ks = (10, 20)
    ref_fn = make_transductive_eval_fn(
        encoder=encoder, predictor_mode="mlp", hits_ks=ks, spmm_impl="xla"
    )
    halo_fn = make_halo_transductive_eval_fn(
        _mesh(), part, encoder=encoder, predictor_mode="mlp", hits_ks=ks
    )
    r_ref, h_ref = ref_fn(params, g, x, vp, vn, tp, tn)
    r_halo, h_halo = halo_fn(params, x_sh, deg_sh, vp, vn, tp, tn)
    for k in r_ref:
        np.testing.assert_allclose(
            np.asarray(r_halo[k]), np.asarray(r_ref[k]), rtol=1e-5, atol=1e-6
        )
    np.testing.assert_allclose(
        np.asarray(h_halo)[: g.num_nodes], np.asarray(h_ref), rtol=2e-4,
        atol=2e-5,
    )


def test_halo_production_eval_matches_single_device():
    """Feature-sharded production eval (two partitions: val graph + inference
    graph) returns the replicated 5-tuple metrics and val embeddings."""
    from llp_tpu.evaln.production import make_production_eval_fn
    from llp_tpu.parallel.eval import make_halo_production_eval_fn
    from llp_tpu.parallel.halo import build_halo_partition, pad_nodes

    n_old, n_all = 150, 201
    g_val, x_val, _, _ = _problem(n=n_old, seed=6)
    g_inf, x_inf, _, _ = _problem(n=n_all, seed=7)
    params = init_teacher_params(
        jax.random.PRNGKey(12), encoder="sage", in_channels=int(x_val.shape[1]),
        hidden_channels=32, num_layers=2, predictor_mode="mlp",
    )
    rng = np.random.default_rng(13)
    mkv = lambda m: jnp.asarray(rng.integers(0, n_old, size=(m, 2)), jnp.int32)
    mki = lambda m: jnp.asarray(rng.integers(0, n_all, size=(m, 2)), jnp.int32)
    vp, vn = mkv(30), mkv(50)
    test_edges = {
        "merged": mki(60), "old_old": mki(20), "old_new": mki(20),
        "new_new": mki(20), "neg": mki(80),
    }
    ks = (10, 20)
    ref_fn = make_production_eval_fn(
        encoder="sage", predictor_mode="mlp", hits_ks=ks, spmm_impl="xla"
    )
    val_part = build_halo_partition(g_val, NDEV)
    inf_part = build_halo_partition(g_inf, NDEV)
    halo_fn = make_halo_production_eval_fn(
        _mesh(), val_part, inf_part, encoder="sage", predictor_mode="mlp",
        hits_ks=ks,
    )
    r_ref, h_ref = ref_fn(params, g_val, x_val, g_inf, x_inf, vp, vn, test_edges)
    r_halo, h_halo = halo_fn(
        params,
        pad_nodes(x_val, val_part),
        pad_nodes(np.asarray(jax.device_get(g_val.in_degree)), val_part),
        pad_nodes(x_inf, inf_part),
        pad_nodes(np.asarray(jax.device_get(g_inf.in_degree)), inf_part),
        vp, vn, test_edges,
    )
    for k in r_ref:
        np.testing.assert_allclose(
            np.asarray(r_halo[k]), np.asarray(r_ref[k]), rtol=1e-5, atol=1e-6
        )
    np.testing.assert_allclose(
        np.asarray(h_halo)[:n_old], np.asarray(h_ref), rtol=2e-4, atol=2e-5
    )


def test_table_production_eval_matches_single_device():
    """Row-parallel production eval over two owner-sharded tables returns
    the replicated 5-tuple metrics."""
    from llp_tpu.evaln.production import make_production_eval_fn
    from llp_tpu.parallel.eval import make_table_production_eval_fn
    from llp_tpu.train.student import init_student_params

    n_old, n_all = 150, 201
    g_val, x_val, _, _ = _problem(n=n_old, seed=6)
    g_inf, x_inf, _, _ = _problem(n=n_all, seed=7)
    params = init_student_params(
        jax.random.PRNGKey(14), in_channels=int(x_val.shape[1]),
        hidden_channels=32, num_layers=2, predictor_mode="mlp",
    )
    rng = np.random.default_rng(15)
    mkv = lambda m: jnp.asarray(rng.integers(0, n_old, size=(m, 2)), jnp.int32)
    mki = lambda m: jnp.asarray(rng.integers(0, n_all, size=(m, 2)), jnp.int32)
    vp, vn = mkv(30), mkv(50)
    test_edges = {
        "merged": mki(60), "old_old": mki(20), "old_new": mki(20),
        "new_new": mki(20), "neg": mki(80),
    }
    ks = (10, 20)
    ref_fn = make_production_eval_fn(
        encoder="mlp", predictor_mode="mlp", hits_ks=ks
    )
    tab_fn = make_table_production_eval_fn(_mesh(), predictor_mode="mlp", hits_ks=ks)
    r_ref, h_ref = ref_fn(params, g_val, x_val, g_inf, x_inf, vp, vn, test_edges)
    r_tab, h_tab = tab_fn(
        params, _pad_rows(x_val, NDEV), _pad_rows(x_inf, NDEV), vp, vn,
        test_edges,
    )
    for k in r_ref:
        np.testing.assert_allclose(
            np.asarray(r_tab[k]), np.asarray(r_ref[k]), rtol=1e-5, atol=1e-6
        )
    np.testing.assert_allclose(
        np.asarray(h_tab)[:n_old], np.asarray(h_ref), rtol=2e-4, atol=2e-5
    )


def test_halo_teacher_epoch_mlp_rejected():
    from llp_tpu.parallel.epoch import make_halo_teacher_epoch_fn

    g, x, pos, keys = _problem()
    part, _, _ = _halo_setup(g, x)
    kw = _teacher_kwargs(g, pos, encoder="mlp")
    with pytest.raises(ValueError, match="DP epoch"):
        make_halo_teacher_epoch_fn(_mesh(), part, **kw)
