"""End-to-end CLI invocations (main(argv)) — guards the full flag plumbing
(incl. the norm_type / compute_dtype / epochs_per_jit knobs) and the
stale-split-cache regeneration path."""

import os

import numpy as np

from llp_tpu.cli.train_student import main as student_main
from llp_tpu.cli.train_teacher import main as teacher_main


def test_cli_teacher_then_student_e2e(tmp_path):
    common = [
        "--datasets=synthetic:sbm:200:4:6.0:7",
        f"--dataset_dir={tmp_path}",
        f"--save_dir={tmp_path}/saved",
        f"--results_dir={tmp_path}/results",
        "--hidden_channels=32",
        "--epochs=4",
        "--eval_steps=2",
        "--epochs_per_jit=2",
        "--patience=50",
        "--device=cpu",
        "--spmm_impl=xla",
        "--log_steps=100",
        "--norm_type=layer",
        "--compute_dtype=bfloat16",
    ]
    teacher_main(common + ["--runs=1", "--batch_size=1024"])
    assert os.path.exists(
        tmp_path / "results" / "synthetic:sbm:200:4:6.0:7_supervised_transductive.txt"
    )
    student_main(common + ["--runs=1", "--link_batch_size=1024"])
    assert os.path.exists(
        tmp_path / "results" / "synthetic:sbm:200:4:6.0:7_KD_transductive.txt"
    )


def test_stale_split_cache_regenerates(tmp_path):
    """The review's failure scenario: a cached split from the stand-in must
    not survive a real {name}.npz export landing in the dataset dir."""
    import jax

    from llp_tpu.train.loop import prepare_transductive
    from llp_tpu.utils.config import TeacherConfig

    cfg = TeacherConfig(
        datasets="cora", dataset_dir=str(tmp_path), results_dir="", save_dir=""
    )
    data1 = prepare_transductive(cfg)  # stand-in + cache written
    cache = tmp_path / "cora_split.npz"
    assert cache.exists()
    e1 = np.asarray(jax.device_get(data1["pos_edges"]))

    # A "real" cora export appears: different graph, same name.
    rng = np.random.default_rng(0)
    n = 2708
    ei = np.stack([rng.integers(0, n, 4000), rng.integers(0, n, 4000)])
    both = np.concatenate([ei, ei[::-1]], axis=1)
    np.savez(
        tmp_path / "cora.npz",
        x=rng.normal(size=(n, 100)).astype(np.float32),
        edge_index=both.astype(np.int64),
    )
    data2 = prepare_transductive(cfg)
    e2 = np.asarray(jax.device_get(data2["pos_edges"]))
    # The split was regenerated for the new graph, not served stale.
    assert e1.shape != e2.shape or not np.array_equal(e1, e2)
    # And the refreshed cache now matches the new dataset (idempotent reuse).
    data3 = prepare_transductive(cfg)
    np.testing.assert_array_equal(
        e2, np.asarray(jax.device_get(data3["pos_edges"]))
    )


def test_cli_data_parallel_num_devices(tmp_path):
    """--num_devices=8 routes training through the sharded whole-epoch
    programs (llp_tpu.parallel.epoch) end-to-end — teacher on the sharded
    segsum kernel path, student on the sharded MLP path."""
    import jax

    if len(jax.devices()) < 8:
        import pytest

        pytest.skip("needs 8 (virtual) devices")
    common = [
        "--datasets=synthetic:sbm:200:4:6.0:7",
        f"--dataset_dir={tmp_path}",
        f"--save_dir={tmp_path}/saved",
        f"--results_dir={tmp_path}/results",
        "--hidden_channels=32",
        "--epochs=4",
        "--eval_steps=2",
        "--epochs_per_jit=2",
        "--patience=50",
        "--device=cpu",
        "--log_steps=100",
        "--num_devices=8",
    ]
    teacher_main(common + ["--runs=1", "--batch_size=1024", "--spmm_impl=segsum"])
    assert os.path.exists(
        tmp_path / "results" / "synthetic:sbm:200:4:6.0:7_supervised_transductive.txt"
    )
    student_main(common + ["--runs=1", "--link_batch_size=1024", "--spmm_impl=xla"])
    assert os.path.exists(
        tmp_path / "results" / "synthetic:sbm:200:4:6.0:7_KD_transductive.txt"
    )


def test_cli_halo_sharding(tmp_path):
    """--sharding=halo trains the teacher feature-sharded end-to-end; the
    student rejects it with a pointer to dp."""
    import jax
    import pytest

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    common = [
        "--datasets=synthetic:sbm:200:4:6.0:7",
        f"--dataset_dir={tmp_path}",
        f"--save_dir={tmp_path}/saved",
        f"--results_dir={tmp_path}/results",
        "--hidden_channels=32",
        "--epochs=4",
        "--eval_steps=2",
        "--patience=50",
        "--device=cpu",
        "--log_steps=100",
        "--num_devices=8",
        "--sharding=halo",
    ]
    teacher_main(common + ["--runs=1", "--batch_size=1024"])
    assert os.path.exists(
        tmp_path / "results" / "synthetic:sbm:200:4:6.0:7_supervised_transductive.txt"
    )
    teacher_main(common + ["--runs=1", "--batch_size=1024", "--encoder=gcn"])
    # The full inter-layer norm surface trains halo-sharded too: layer norm
    # (per-row) and batch norm (psum'd cross-device statistics).
    teacher_main(common + ["--runs=1", "--batch_size=1024", "--norm_type=layer"])
    teacher_main(common + ["--runs=1", "--batch_size=1024", "--norm_type=batch"])
    # Student + halo = table-sharded features; requires minibatch.
    with pytest.raises(ValueError, match="minibatch"):
        student_main(common + ["--runs=1", "--link_batch_size=1024"])
    student_main(
        common + ["--runs=1", "--link_batch_size=1024", "--minibatch"]
    )
    # Sharded minibatch + batch norm (was a NotImplementedError).
    student_main(
        common + ["--runs=1", "--link_batch_size=1024", "--minibatch",
                  "--norm_type=batch"]
    )
    assert os.path.exists(
        tmp_path / "results" / "synthetic:sbm:200:4:6.0:7_KD_transductive.txt"
    )


def test_cli_checkpoint_resume_flags(tmp_path):
    """--checkpoint_every / --resume plumb through to the driver: a run cut
    short leaves a train-state snapshot a second CLI invocation extends."""
    common = [
        "--datasets=synthetic:sbm:200:4:6.0:7",
        f"--dataset_dir={tmp_path}",
        f"--save_dir={tmp_path}/saved",
        f"--results_dir={tmp_path}/results",
        "--hidden_channels=32",
        "--eval_steps=1",
        "--patience=50",
        "--device=cpu",
        "--spmm_impl=xla",
        "--log_steps=100",
        "--runs=1",
        "--batch_size=1024",
        "--checkpoint_every=1",
    ]
    teacher_main(common + ["--epochs=2"])
    state = (
        tmp_path / "saved" / "synthetic:sbm:200:4:6.0:7-sage_transductive_trainstate"
    )
    assert os.path.exists(str(state) + ".npz")
    teacher_main(common + ["--epochs=4", "--resume"])


def test_yaml_config_vs_cli_precedence(tmp_path):
    """Review finding: untouched argparse defaults must NOT clobber YAML
    values (explicit flag > YAML > CLI default)."""
    import argparse

    from llp_tpu.cli.common import add_common_flags, config_from_args
    from llp_tpu.utils.config import TeacherConfig

    p = argparse.ArgumentParser()
    add_common_flags(p)
    p.add_argument("--batch_size", type=int, default=64 * 1024)
    p.add_argument("--runs", type=int, default=5)
    cfg_file = tmp_path / "c.yaml"
    cfg_file.write_text("lr: 0.001\nhidden_channels: 99\n")
    args = p.parse_args([f"--config={cfg_file}", "--hidden_channels=128"])
    cfg = config_from_args(
        TeacherConfig, args, rename={}, defaults=vars(p.parse_args([]))
    )
    assert cfg.lr == 0.001          # YAML beats the untouched default
    assert cfg.hidden_channels == 128  # explicit flag beats YAML
    assert cfg.dropout == 0.5       # default survives where YAML is silent
