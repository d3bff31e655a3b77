"""--reorder {locality,rcm}: relabel-at-prep isomorphism through the driver.

The relabel is internal to a run (CommonConfig.reorder): data-prep arrays
move to the relabeled id space, evaluation metrics are invariant (checked
EXACTLY with shared params below), and teacher artifacts are exported back
in the dataset's original id space so runs with different reorder settings
interoperate (cross-consumption tests).  No reference counterpart — the
reference never relabels (single-device); the capability exists for halo
comm volume + gather locality (BASELINE.md round-4 partitioner section).
"""

import numpy as np
import jax
import pytest

from llp_tpu.data.registry import get_dataset
from llp_tpu.train.loop import (
    prepare_production,
    prepare_transductive,
    run_student,
    run_teacher,
)
from llp_tpu.utils.checkpoint import load_checkpoint
from llp_tpu.utils.config import StudentConfig, TeacherConfig

DS = "synthetic:sbm:300:4:8.0:17"


def _tcfg(tmp, **kw):
    base = dict(
        datasets=DS, dataset_dir=str(tmp), save_dir=str(tmp) + "/saved",
        results_dir="", runs=1, epochs=6, patience=10, hidden_channels=16,
        batch_size=1024,
    )
    base.update(kw)
    return TeacherConfig(**base)


def _scfg(tmp, **kw):
    base = dict(
        datasets=DS, dataset_dir=str(tmp), save_dir=str(tmp) + "/saved",
        results_dir="", runs=1, epochs=6, patience=10, hidden_channels=16,
        link_batch_size=1024,
    )
    base.update(kw)
    return StudentConfig(**base)


def test_prepare_transductive_relabel_invariants(tmp_path):
    cfg0 = _tcfg(tmp_path).finalize()
    cfg1 = _tcfg(tmp_path, reorder="locality").finalize()
    d0 = prepare_transductive(cfg0)
    d1 = prepare_transductive(cfg1)
    order = d1["node_order"]
    inv = d1["node_inverse"]
    assert order is not None and sorted(order.tolist()) == list(range(300))
    ds = get_dataset(str(tmp_path), DS)
    # features permuted
    np.testing.assert_array_equal(np.asarray(d1["x"]), np.asarray(ds.x)[order])
    # edge SET preserved under the relabel (graph edges are re-sorted by the
    # relabeled receiver, so compare as sets of original-id pairs)
    def edge_set(g, mapping=None):
        e = g.num_edges
        s = np.asarray(g.senders)[:e].astype(np.int64)
        r = np.asarray(g.receivers)[:e].astype(np.int64)
        if mapping is not None:
            s, r = mapping[s], mapping[r]
        return set(zip(s.tolist(), r.tolist()))

    assert edge_set(d1["graph"], order) == edge_set(d0["graph"])
    # eval edges mapped consistently
    np.testing.assert_array_equal(
        order[np.asarray(d1["eval_edges"]["valid_pos"], np.int64)],
        np.asarray(d0["eval_edges"]["valid_pos"], np.int64),
    )
    assert inv[order[5]] == 5


def test_eval_metrics_exactly_invariant(tmp_path):
    """Same params, original vs relabeled data: every metric must agree (the
    relabel is an isomorphism; float tolerance covers SpMM summation-order
    noise)."""
    from llp_tpu.evaln.transductive import make_transductive_eval_fn
    from llp_tpu.train.teacher import init_teacher_params

    cfg0 = _tcfg(tmp_path).finalize()
    cfg1 = _tcfg(tmp_path, reorder="locality").finalize()
    d0 = prepare_transductive(cfg0)
    d1 = prepare_transductive(cfg1)
    params = init_teacher_params(
        jax.random.PRNGKey(3), encoder="sage", in_channels=d0["x"].shape[1],
        hidden_channels=16, num_layers=2, predictor_mode="mlp",
    )
    eval_fn = make_transductive_eval_fn(encoder="sage", predictor_mode="mlp")
    out = []
    for d in (d0, d1):
        ee = d["eval_edges"]
        res, h = eval_fn(
            params, d["graph"], d["x"], ee["valid_pos"], ee["valid_neg"],
            ee["test_pos"], ee["test_neg"],
        )
        out.append({k: tuple(float(x) for x in v) for k, v in res.items()})
    for k in out[0]:
        assert out[0][k] == pytest.approx(out[1][k], abs=2e-4), k


@pytest.mark.parametrize("reorder", ["locality", "rcm"])
def test_teacher_runs_with_reorder(tmp_path, reorder):
    stats, _ = run_teacher(_tcfg(tmp_path, reorder=reorder), verbose=False)
    assert stats["AUC"]["valid"][0] > 60.0


def test_artifact_interop_both_directions(tmp_path):
    # teacher WITH reorder -> student WITHOUT: features must arrive in the
    # dataset's original id space.
    run_teacher(_tcfg(tmp_path, reorder="locality", epochs=10), verbose=False)
    s_stats, _ = run_student(_scfg(tmp_path), verbose=False)
    assert s_stats["AUC"]["valid"][0] > 60.0
    # teacher WITHOUT reorder -> student WITH reorder.
    tmp2 = tmp_path / "b"
    run_teacher(_tcfg(tmp2, epochs=10), verbose=False)
    s_stats2, _ = run_student(_scfg(tmp2, reorder="locality"), verbose=False)
    assert s_stats2["AUC"]["valid"][0] > 60.0


def test_exported_features_in_original_space(tmp_path):
    """Two teachers, identical seeds, reorder on/off: the exported feature
    tables cannot be compared value-for-value (the relabel changes batch
    composition), but the reorder run's table must predict well in the
    ORIGINAL id space — consumed here by re-scoring the original split's
    val positives above its val negatives on average."""
    run_teacher(_tcfg(tmp_path, reorder="locality", epochs=10), verbose=False)
    cfg0 = _tcfg(tmp_path).finalize()
    d0 = prepare_transductive(cfg0)
    ckpt, meta = load_checkpoint(str(tmp_path) + "/saved/" + _ckpt_name(cfg0))
    from llp_tpu.evaln.scoring import make_score

    from llp_tpu.ops.metrics import roc_auc

    score = make_score("mlp")
    h = np.asarray(ckpt["features"])
    vp = score(ckpt["params"], h, d0["eval_edges"]["valid_pos"])
    vn = score(ckpt["params"], h, d0["eval_edges"]["valid_neg"])
    auc = float(roc_auc(vp, vn))
    assert auc > 0.72, auc  # the table ranks the ORIGINAL split's edges
    # negative control: a scrambled table must not (confirms the assert
    # above actually tests id alignment, not just score marginals)
    rng = np.random.default_rng(0)
    hs = h[rng.permutation(h.shape[0])]
    auc_s = float(roc_auc(
        score(ckpt["params"], hs, d0["eval_edges"]["valid_pos"]),
        score(ckpt["params"], hs, d0["eval_edges"]["valid_neg"]),
    ))
    assert auc_s < auc - 0.15, (auc, auc_s)


def _ckpt_name(cfg):
    from llp_tpu.train.loop import _teacher_ckpt_path
    import os

    return os.path.basename(_teacher_ckpt_path(cfg))


def test_production_reorder_runs(tmp_path):
    cfg = _tcfg(
        tmp_path, reorder="locality", transductive="production", epochs=10
    )
    stats, _ = run_teacher(cfg, verbose=False)
    assert stats["AUC"]["val"][0] > 60.0
    s_stats, _ = run_student(
        _scfg(tmp_path, reorder="locality", transductive="production",
              epochs=10),
        verbose=False,
    )
    # measured: 66-67 with and without reorder at 10 epochs (tiny graph)
    assert s_stats["AUC"]["val"][0] > 58.0


def test_production_prepare_relabel_invariants(tmp_path):
    cfg0 = _tcfg(tmp_path, transductive="production").finalize()
    cfg1 = _tcfg(tmp_path, transductive="production", reorder="locality").finalize()
    d0 = prepare_production(cfg0)
    d1 = prepare_production(cfg1)
    order = d1["node_order"]
    n_old = d0["x"].shape[0]
    assert sorted(order.tolist()) == list(range(n_old))
    np.testing.assert_array_equal(
        np.asarray(d1["x"]), np.asarray(d0["ps"].training_x)[order]
    )
    # val pairs map back to the original val pairs
    np.testing.assert_array_equal(
        order[np.asarray(d1["val_pos"], np.int64)], np.asarray(d0["val_pos"])
    )
    # inference-space test pairs map back through the inference order
    # (reconstructable from inf_x rows: features identify nodes here)
    assert d1["inf_x"].shape == d0["inf_x"].shape


def test_halo_with_locality_reorder(tmp_path):
    """Feature-sharded teacher over the 8-device CPU mesh with the locality
    relabel: runs end-to-end, and the halo plan's padded exchange slots
    shrink vs the unreordered partition."""
    from llp_tpu.parallel.halo import build_halo_partition

    cfg = _tcfg(
        tmp_path, reorder="locality", num_devices=8, sharding="halo",
        datasets="synthetic:sbm:1600:8:10.0:5", epochs=4,
    )
    stats, _ = run_teacher(cfg, verbose=False)
    assert stats["AUC"]["valid"][0] > 60.0
    cfg0 = _tcfg(
        tmp_path, datasets="synthetic:sbm:1600:8:10.0:5", num_devices=8,
        sharding="halo",
    ).finalize()
    cfg1 = _tcfg(
        tmp_path, datasets="synthetic:sbm:1600:8:10.0:5", num_devices=8,
        sharding="halo", reorder="locality",
    ).finalize()
    m0 = build_halo_partition(prepare_transductive(cfg0)["graph"], 8).m
    m1 = build_halo_partition(prepare_transductive(cfg1)["graph"], 8).m
    assert m1 < m0


def test_weighted_spmm_invariant_under_relabel():
    """Edge weights stay COLUMN-aligned under an endpoint relabel (the
    driver passes the same weight vector to build_graph after relabeling
    message_ei endpoints) — the weighted mean aggregate must be the same
    function up to the row permutation."""
    from llp_tpu.core.graph import build_graph
    from llp_tpu.data.partition import locality_order
    from llp_tpu.data.synthetic import sbm_graph
    from llp_tpu.ops.spmm import spmm

    n = 60
    ei, _ = sbm_graph(n, 3, 5.0, seed=9)
    rng = np.random.default_rng(1)
    w = rng.random(ei.shape[1]).astype(np.float32) + 0.1
    g0 = build_graph(ei, n, edge_weight=w)
    order = locality_order(ei, n, 4)
    inv = np.empty(n, np.int64)
    inv[order] = np.arange(n)
    g1 = build_graph(inv[ei], n, edge_weight=w)
    x = rng.normal(size=(n, 8)).astype(np.float32)
    y0 = np.asarray(spmm(g0, x, "mean", edge_weight=g0.edge_weight))
    y1 = np.asarray(spmm(g1, x[order], "mean", edge_weight=g1.edge_weight))
    # new row i holds old node order[i]; map back and compare
    np.testing.assert_allclose(y1[inv], y0, rtol=2e-5, atol=2e-5)
