"""Checkpoint-resume of training state: a killed run continues losslessly."""

import os

import jax
import numpy as np

from llp_tpu.train.loop import run_teacher
from llp_tpu.utils.config import TeacherConfig


def _cfg(tmp, **kw):
    base = dict(
        datasets="synthetic:sbm:200:3:6.0:11",
        dataset_dir=str(tmp),
        save_dir=str(tmp) + "/saved",
        results_dir="",
        runs=1,
        epochs=10,
        patience=100,
        hidden_channels=16,
        batch_size=1024,
    )
    base.update(kw)
    return TeacherConfig(**base)


def test_teacher_resume_continues(tmp_path):
    # Run 10 epochs with snapshots every 3; then "crash" after 6 and resume.
    full_stats, full_loggers = run_teacher(_cfg(tmp_path), verbose=False)
    n_full = len(full_loggers["Hits@20"].results[0])
    assert n_full == 10

    tmp2 = tmp_path / "b"
    tmp2.mkdir()
    run_teacher(
        _cfg(tmp2, checkpoint_every=3, epochs=6), verbose=False
    )  # stops at epoch 6, snapshot at 6
    stats2, loggers2 = run_teacher(
        _cfg(tmp2, checkpoint_every=3, epochs=10, resume=True), verbose=False
    )
    hist = loggers2["Hits@20"].results[0]
    # 6 epochs from the first process + 4 after resume.
    assert len(hist) == 10


def test_resume_without_snapshot_is_noop(tmp_path):
    stats, loggers = run_teacher(_cfg(tmp_path, resume=True, epochs=4), verbose=False)
    assert len(loggers["Hits@20"].results[0]) == 4


def test_run_state_roundtrip(tmp_path):
    import optax

    from llp_tpu.train.state import load_run_state, save_run_state
    from llp_tpu.train.teacher import init_teacher_params

    params = init_teacher_params(
        jax.random.PRNGKey(0), encoder="sage", in_channels=8,
        hidden_channels=8, num_layers=2, predictor_mode="mlp",
    )
    tx = optax.adam(1e-3)
    opt = tx.init(params)
    path = str(tmp_path / "st")
    save_run_state(
        path, params=params, opt_state=opt, run=2, epoch=7, best_val=0.5,
        cnt_wait=3, val_max=0.6, logger_results={"Hits@20": [[(0.1, 0.2)]]},
    )
    p2, o2, meta = load_run_state(path, tx.init(params))
    assert meta["run"] == 2 and meta["epoch"] == 7
    for a, b in zip(jax.tree_util.tree_leaves(opt), jax.tree_util.tree_leaves(o2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_teacher_resume_under_sharding(tmp_path):
    """Crash/resume works when training is sharded: snapshots of replicated
    sharded params round-trip into the DP and halo epoch programs."""
    import pytest

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    for sharding in ("dp", "halo"):
        tmp = tmp_path / sharding
        tmp.mkdir()
        run_teacher(
            _cfg(tmp, checkpoint_every=2, epochs=4, num_devices=8,
                 sharding=sharding),
            verbose=False,
        )
        stats, loggers = run_teacher(
            _cfg(tmp, checkpoint_every=2, epochs=7, num_devices=8,
                 sharding=sharding, resume=True),
            verbose=False,
        )
        assert len(loggers["Hits@20"].results[0]) == 7


def test_teacher_resume_mid_block_with_fusion(tmp_path):
    """Resume landing mid-fusion-block: the driver falls back to single-epoch
    programs until realigned, then fuses again — history stays complete."""
    run_teacher(
        _cfg(tmp_path, checkpoint_every=1, epochs=3, eval_steps=1),
        verbose=False,
    )  # snapshot at epoch 3 (mid-block for block=2 alignment)
    stats, loggers = run_teacher(
        _cfg(
            tmp_path, checkpoint_every=1, epochs=8, eval_steps=2,
            epochs_per_jit=2, resume=True,
        ),
        verbose=False,
    )
    # 3 per-epoch evals from the first run + evals at 4, 6, 8 after resume.
    assert len(loggers["Hits@20"].results[0]) == 6


def test_crash_after_best_epoch_keeps_teacher_artifact(tmp_path, monkeypatch):
    """Review finding: the best-val artifact used to live only in memory until
    the post-loop save, while snapshots persisted val_max — a crash after the
    best epoch left a resumed run that could finish with NO exported teacher
    checkpoint (nothing re-clears the restored val_max). Artifacts now flush
    at snapshot time: simulate the crash and check the artifact survives."""
    import llp_tpu.utils.checkpoint as ckpt_mod
    from llp_tpu.evaln.logger import RunLogger

    cfg = _cfg(tmp_path, checkpoint_every=1, eval_steps=1, epochs=6)

    calls = {"n": 0}
    orig = RunLogger.add_result

    def crashing_add(self, run, result):
        calls["n"] += 1
        if calls["n"] > 8:  # epoch 1 adds 5 results (4 Hits@K + AUC);
            raise RuntimeError("simulated crash mid-epoch-2")
        return orig(self, run, result)

    monkeypatch.setattr(RunLogger, "add_result", crashing_add)
    try:
        run_teacher(cfg, verbose=False)
        raise AssertionError("crash did not fire")
    except RuntimeError as e:
        assert "simulated crash" in str(e)
    monkeypatch.setattr(RunLogger, "add_result", orig)

    # the epoch-1 snapshot must have flushed the best-val artifact
    art = tmp_path / "saved" / "synthetic:sbm:200:3:6.0:11-sage_transductive"
    assert (str(art) + ".npz") and os.path.exists(
        str(art) + ".npz"
    ), "artifact not flushed at snapshot"
    ckpt, meta = ckpt_mod.load_checkpoint(str(art))
    assert "params" in ckpt and "features" in ckpt and meta["val"] > 0

    # resume completes and the artifact is still a loadable teacher export
    stats, _ = run_teacher(_cfg(tmp_path, checkpoint_every=1, eval_steps=1,
                                epochs=6, resume=True), verbose=False)
    ckpt2, meta2 = ckpt_mod.load_checkpoint(str(art))
    assert meta2["val"] >= meta["val"]
