"""Training-loop behavior: optimization progress, loss parity pieces,
minibatch-vs-fullbatch equivalence, evaluator wiring."""

import jax
import jax.numpy as jnp
import numpy as np

from llp_tpu.core import build_graph
from llp_tpu.data.synthetic import community_features, sbm_graph
from llp_tpu.evaln.transductive import make_transductive_eval_fn
from llp_tpu.sample.negative import edge_hash_keys
from llp_tpu.train.optim import clip_by_group_norm
from llp_tpu.train.student import (
    init_student_params,
    make_student_epoch_fn,
    pair_table,
)
from llp_tpu.train.teacher import init_teacher_params, make_teacher_epoch_fn


def _problem(n=200, k=4, deg=6.0, d=32, seed=5):
    ei, comm = sbm_graph(n, k, deg, seed=seed)
    x = jnp.asarray(community_features(comm, d, kind="gauss", seed=seed))
    g = build_graph(ei, n)
    pos = jnp.asarray(ei.T.astype(np.int32))
    keys = jnp.asarray(edge_hash_keys(ei, n))
    return g, x, pos, keys


def test_teacher_epoch_reduces_loss():
    g, x, pos, keys = _problem()
    epoch_fn, tx = make_teacher_epoch_fn(
        encoder="sage", predictor_mode="mlp", dropout=0.0,
        num_nodes=g.num_nodes, num_pos_edges=int(pos.shape[0]),
        link_batch_size=256, neg_mode="dense", lr=0.01,
    )
    params = init_teacher_params(
        jax.random.PRNGKey(0), encoder="sage", in_channels=int(x.shape[1]),
        hidden_channels=32, num_layers=2, predictor_mode="mlp",
    )
    opt_state = tx.init(params)
    losses = []
    for ep in range(8):
        params, opt_state, loss = epoch_fn(
            params, opt_state, jax.random.PRNGKey(ep), g, x, pos, keys
        )
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0] * 0.8


def test_teacher_epoch_deterministic_under_key():
    g, x, pos, keys = _problem()
    epoch_fn, tx = make_teacher_epoch_fn(
        encoder="sage", predictor_mode="inner", dropout=0.0,
        num_nodes=g.num_nodes, num_pos_edges=int(pos.shape[0]),
        link_batch_size=512, neg_mode="dense", lr=0.01,
    )
    params = init_teacher_params(
        jax.random.PRNGKey(1), encoder="sage", in_channels=int(x.shape[1]),
        hidden_channels=16, num_layers=2, predictor_mode="inner",
    )
    # epoch_fn donates params/opt_state buffers: give each call its own copy.
    copy = lambda t: jax.tree_util.tree_map(lambda a: a.copy(), t)
    pa, pb = copy(params), copy(params)
    p1, _, l1 = epoch_fn(pa, tx.init(pa), jax.random.PRNGKey(42), g, x, pos, keys)
    p2, _, l2 = epoch_fn(pb, tx.init(pb), jax.random.PRNGKey(42), g, x, pos, keys)
    assert float(l1) == float(l2)
    for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_student_epoch_all_losses_active():
    g, x, pos, keys = _problem()
    t_h = jnp.asarray(
        np.random.default_rng(0).normal(size=(g.num_nodes, 32)), jnp.float32
    )
    teacher = init_teacher_params(
        jax.random.PRNGKey(9), encoder="sage", in_channels=int(x.shape[1]),
        hidden_channels=32, num_layers=2, predictor_mode="mlp",
    )
    epoch_fn, tx = make_student_epoch_fn(
        num_nodes=g.num_nodes, num_pos_edges=int(pos.shape[0]),
        link_batch_size=256, node_batch_size=64, predictor_mode="mlp",
        dropout=0.0, lr=0.01, true_label=0.5, kd_rm=0.1, kd_lm=0.1,
        llp_d=1.0, llp_r=1.0, margin=0.1, rw_step=2, hops=2, ns_rate=1,
        neg_mode="dense",
    )
    params = init_student_params(
        jax.random.PRNGKey(2), in_channels=int(x.shape[1]),
        hidden_channels=32, num_layers=2, predictor_mode="mlp",
    )
    opt_state = tx.init(params)
    losses = []
    for ep in range(6):
        params, opt_state, loss = epoch_fn(
            params, opt_state, jax.random.PRNGKey(ep), g, x, t_h,
            teacher["predictor"], pos, keys,
        )
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_student_minibatch_mode_runs():
    g, x, pos, keys = _problem()
    t_h = jnp.asarray(
        np.random.default_rng(0).normal(size=(g.num_nodes, 24)), jnp.float32
    )
    teacher = init_teacher_params(
        jax.random.PRNGKey(9), encoder="sage", in_channels=int(x.shape[1]),
        hidden_channels=24, num_layers=2, predictor_mode="mlp",
    )
    epoch_fn, tx = make_student_epoch_fn(
        num_nodes=g.num_nodes, num_pos_edges=int(pos.shape[0]),
        link_batch_size=256, node_batch_size=64, predictor_mode="mlp",
        dropout=0.0, lr=0.01, llp_d=1.0, llp_r=1.0, rw_step=2, hops=1,
        ns_rate=1, neg_mode="uniform", minibatch=True,
    )
    params = init_student_params(
        jax.random.PRNGKey(2), in_channels=int(x.shape[1]),
        hidden_channels=24, num_layers=2, predictor_mode="mlp",
    )
    opt_state = tx.init(params)
    params, opt_state, loss = epoch_fn(
        params, opt_state, jax.random.PRNGKey(0), g, x, t_h,
        teacher["predictor"], pos, keys,
    )
    assert np.isfinite(float(loss))


def test_pair_table_matches_itertools():
    import itertools

    pt = np.asarray(pair_table(6))
    ref = np.array(list(itertools.combinations(range(6), 2))).T
    np.testing.assert_array_equal(pt, ref)


def test_clip_by_group_norm_groups_independent():
    g1 = jnp.ones((10,)) * 10.0  # norm ~31.6 -> scaled
    g2 = jnp.ones((4,)) * 0.01  # tiny -> untouched
    out = clip_by_group_norm({"a": {"x": g1}, "b": {"y": g2}}, 1.0)
    assert np.linalg.norm(np.asarray(out["a"]["x"])) < 1.001
    np.testing.assert_allclose(np.asarray(out["b"]["y"]), 0.01, rtol=1e-5)


def test_transductive_eval_shapes():
    g, x, pos, keys = _problem()
    eval_fn = make_transductive_eval_fn(
        encoder="sage", predictor_mode="mlp", hits_ks=(10, 20)
    )
    params = init_teacher_params(
        jax.random.PRNGKey(0), encoder="sage", in_channels=int(x.shape[1]),
        hidden_channels=16, num_layers=2, predictor_mode="mlp",
    )
    rng = np.random.default_rng(1)
    mk = lambda m: jnp.asarray(rng.integers(0, g.num_nodes, size=(m, 2)), jnp.int32)
    results, h = eval_fn(params, g, x, mk(50), mk(60), mk(70), mk(80))
    assert set(results) == {"Hits@10", "Hits@20", "AUC"}
    for v in results.values():
        assert len(v) == 2
        assert all(0.0 <= float(t) <= 1.0 for t in v)
    assert h.shape == (g.num_nodes, 16)


def test_teacher_multi_epoch_fusion_matches_singles():
    """epochs_per_call=K with stacked fold_in keys reproduces K single-epoch
    calls bit-for-bit (same RNG stream, same scan math)."""
    g, x, pos, keys = _problem()
    kwargs = dict(
        encoder="sage", predictor_mode="mlp", dropout=0.0,
        num_nodes=g.num_nodes, num_pos_edges=int(pos.shape[0]),
        link_batch_size=256, neg_mode="dense", lr=0.01,
    )
    single, tx = make_teacher_epoch_fn(**kwargs)
    fused, _ = make_teacher_epoch_fn(**kwargs, epochs_per_call=3)
    params = init_teacher_params(
        jax.random.PRNGKey(0), encoder="sage", in_channels=int(x.shape[1]),
        hidden_channels=32, num_layers=2, predictor_mode="mlp",
    )
    copy = lambda t: jax.tree_util.tree_map(lambda a: a.copy(), t)
    base = jax.random.PRNGKey(11)

    p1, s1 = copy(params), tx.init(copy(params))
    singles_losses = []
    for e in range(1, 4):
        p1, s1, l = single(p1, s1, jax.random.fold_in(base, e), g, x, pos, keys)
        singles_losses.append(float(l))

    p2, s2 = copy(params), tx.init(copy(params))
    bkeys = jnp.stack([jax.random.fold_in(base, e) for e in range(1, 4)])
    p2, s2, losses = fused(p2, s2, bkeys, g, x, pos, keys)

    np.testing.assert_allclose(np.asarray(losses), singles_losses, rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_run_teacher_epochs_per_jit_equivalent(tmp_path):
    """Driver-level: epochs_per_jit=2 produces the same logger history."""
    from llp_tpu.train.loop import run_teacher
    from llp_tpu.utils.config import TeacherConfig

    common = dict(
        datasets="synthetic:sbm:300:4:6.0:2", dataset_dir=str(tmp_path),
        runs=1, epochs=6, eval_steps=2, patience=50, hidden_channels=32,
        batch_size=1024, results_dir=str(tmp_path / "r"),
        spmm_impl="xla", log_steps=100,
    )
    s1, log1 = run_teacher(
        TeacherConfig(save_dir=str(tmp_path / "s1"), **common), verbose=False
    )
    s2, log2 = run_teacher(
        TeacherConfig(save_dir=str(tmp_path / "s2"), epochs_per_jit=2, **common),
        verbose=False,
    )
    assert log1["AUC"].results == log2["AUC"].results
    assert s1 == s2


def test_run_student_epochs_per_jit_equivalent(tmp_path):
    """Driver-level: student with epochs_per_jit=2 matches per-epoch runs."""
    from llp_tpu.train.loop import run_student, run_teacher
    from llp_tpu.utils.config import StudentConfig, TeacherConfig

    common = dict(
        datasets="synthetic:sbm:300:4:6.0:2", dataset_dir=str(tmp_path),
        hidden_channels=32, results_dir=str(tmp_path / "r"),
        spmm_impl="xla", log_steps=100,
    )
    run_teacher(
        TeacherConfig(
            runs=1, epochs=4, eval_steps=1, patience=50, batch_size=1024,
            save_dir=str(tmp_path / "s"), **common,
        ),
        verbose=False,
    )
    scommon = dict(
        runs=1, epochs=6, eval_steps=2, patience=50, link_batch_size=1024,
        save_dir=str(tmp_path / "s"), **common,
    )
    s1, log1 = run_student(StudentConfig(**scommon), verbose=False)
    s2, log2 = run_student(
        StudentConfig(epochs_per_jit=2, **scommon), verbose=False
    )
    assert log1["AUC"].results == log2["AUC"].results
    assert s1 == s2


def test_student_llp_r_chunked_matches_unchunked():
    # rw_step=2, hops=2, ns_rate=1 -> C=8, C(C,2)=28 pairs; chunk=20 pads the
    # last chunk. Same keys => identical term sets; only summation order moves.
    g, x, pos, keys = _problem()
    t_h = jnp.asarray(
        np.random.default_rng(0).normal(size=(g.num_nodes, 32)), jnp.float32
    )
    teacher = init_teacher_params(
        jax.random.PRNGKey(9), encoder="sage", in_channels=int(x.shape[1]),
        hidden_channels=32, num_layers=2, predictor_mode="mlp",
    )
    kwargs = dict(
        num_nodes=g.num_nodes, num_pos_edges=int(pos.shape[0]),
        link_batch_size=256, node_batch_size=64, predictor_mode="mlp",
        dropout=0.0, lr=0.01, true_label=0.5, llp_d=1.0, llp_r=1.0,
        margin=0.1, rw_step=2, hops=2, ns_rate=1, neg_mode="dense",
    )
    fn_full, tx = make_student_epoch_fn(**kwargs)
    fn_chunk, _ = make_student_epoch_fn(**kwargs, llp_r_chunk=20)
    params = init_student_params(
        jax.random.PRNGKey(2), in_channels=int(x.shape[1]),
        hidden_channels=32, num_layers=2, predictor_mode="mlp",
    )
    copy = lambda t: jax.tree_util.tree_map(lambda a: a.copy(), t)
    pa, pb = copy(params), copy(params)
    for ep in range(3):
        pa, sa, la = fn_full(pa, tx.init(pa) if ep == 0 else sa,
                             jax.random.PRNGKey(ep), g, x, t_h,
                             teacher["predictor"], pos, keys)
        pb, sb, lb = fn_chunk(pb, tx.init(pb) if ep == 0 else sb,
                              jax.random.PRNGKey(ep), g, x, t_h,
                              teacher["predictor"], pos, keys)
        np.testing.assert_allclose(float(la), float(lb), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(pa), jax.tree_util.tree_leaves(pb)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
