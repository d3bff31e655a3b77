"""Checkpoint-resume of training state: a killed run continues losslessly."""

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
