"""Production-setting driver end-to-end on CPU (teacher + student)."""

from llp_tpu.train.loop import run_student, run_teacher
from llp_tpu.utils.config import StudentConfig, TeacherConfig


def test_production_teacher_student_pipeline(tmp_path):
    common = dict(
        datasets="synthetic:sbm:400:4:8.0:41",
        dataset_dir=str(tmp_path),
        save_dir=str(tmp_path / "saved"),
        results_dir=str(tmp_path / "results"),
        transductive="production",
        runs=1,
        epochs=6,
        patience=10,
        hidden_channels=24,
    )
    tstats, tlog = run_teacher(
        TeacherConfig(batch_size=2048, **common), verbose=False
    )
    # 5-tuple production metrics present
    assert len(tlog["Hits@20"].results[0][0]) == 5
    assert "AUC" in tstats and set(tstats["AUC"]) == {
        "val", "test", "old_old", "old_new", "new_new"
    }

    sstats, slog = run_student(
        StudentConfig(link_batch_size=2048, **common), verbose=False
    )
    assert len(slog["Hits@20"].results[0][0]) == 5
    # results files written
    assert any(p.name.endswith("_production.txt") for p in (tmp_path / "results").iterdir())


def test_production_halo_teacher_and_table_student(tmp_path):
    """--sharding=halo in the production setting: feature-sharded teacher
    training AND two-graph evaluation, then the table-sharded minibatch
    student with its row-parallel production eval — all through the driver."""
    import jax
    import pytest

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    common = dict(
        datasets="synthetic:sbm:400:4:8.0:41",
        dataset_dir=str(tmp_path),
        save_dir=str(tmp_path / "saved"),
        results_dir=str(tmp_path / "results"),
        transductive="production",
        runs=1,
        epochs=4,
        eval_steps=2,
        patience=10,
        hidden_channels=24,
        num_devices=8,
        sharding="halo",
    )
    tstats, tlog = run_teacher(
        TeacherConfig(batch_size=2048, **common), verbose=False
    )
    assert len(tlog["Hits@20"].results[0][0]) == 5
    assert set(tstats["AUC"]) == {"val", "test", "old_old", "old_new", "new_new"}

    sstats, slog = run_student(
        StudentConfig(link_batch_size=2048, minibatch=True, **common),
        verbose=False,
    )
    assert len(slog["Hits@20"].results[0][0]) == 5
    assert set(sstats["AUC"]) == {"val", "test", "old_old", "old_new", "new_new"}
