"""Driver-level flags: use_valedges_as_input, gcn/mlp encoders, inner predictor."""

import pytest

from llp_tpu.train.loop import run_teacher
from llp_tpu.utils.config import TeacherConfig


def _cfg(tmp, **kw):
    base = dict(
        datasets="synthetic:sbm:150:3:6.0:31",
        dataset_dir=str(tmp),
        save_dir=str(tmp) + "/saved",
        results_dir="",
        runs=1,
        epochs=4,
        patience=10,
        hidden_channels=16,
        batch_size=1024,
    )
    base.update(kw)
    return TeacherConfig(**base)


def test_use_valedges_as_input(tmp_path):
    stats, loggers = run_teacher(_cfg(tmp_path, use_valedges_as_input=True), verbose=False)
    assert len(loggers["Hits@20"].results[0]) == 4


@pytest.mark.parametrize("encoder", ["gcn", "mlp"])
def test_alternative_encoders(tmp_path, encoder):
    stats, loggers = run_teacher(_cfg(tmp_path, encoder=encoder), verbose=False)
    assert "AUC" in stats


def test_inner_predictor(tmp_path):
    stats, _ = run_teacher(_cfg(tmp_path, predictor="inner"), verbose=False)
    assert "Hits@20" in stats


def test_eval_steps_honored(tmp_path):
    # eval_steps=2 halves the recorded eval history (default 1 = ref parity).
    _, loggers = run_teacher(_cfg(tmp_path, epochs=8, eval_steps=2), verbose=False)
    assert len(loggers["Hits@20"].results[0]) == 4
