"""One-command parity harness (cli/parity): discovery over all four raw
loader formats, blessed-recipe smoke runs, Table-2/3-shaped report."""

import json
import os

import numpy as np
import pytest

from llp_tpu.cli.parity import (
    ALL_DATASETS,
    STUDENT_RECIPES,
    TEACHER_RECIPES,
    discover_datasets,
    run_parity,
)
from test_ogb_split import _make_ogb_dir
from test_registry_io import _write_gnn_benchmark_npz, _write_planetoid

SMOKE = dict(runs=1, epochs=2, patience=5, eval_steps=1,
             hidden_channels=16, num_layers=2)


def _real_data_dir(tmp_path):
    """A dataset dir exercising all FOUR loader formats:
    planetoid raw (cora), GNN-benchmark npz (coauthor-cs), OGB download with
    official split (collab), npz interchange (citeseer)."""
    from llp_tpu.data.io import save_dataset_npz
    from llp_tpu.data.synthetic import community_features, sbm_graph

    _write_planetoid(tmp_path / "Cora" / "raw", "cora", n_all=120, n_test=20, d=8)
    raw = tmp_path / "coauthor-cs" / "raw"
    raw.mkdir(parents=True)
    _write_gnn_benchmark_npz(raw / "ms_academic_cs.npz", n=110, d=8)
    _make_ogb_dir(str(tmp_path), n=60, seed=3)
    ei, comm = sbm_graph(130, 3, 5.0, seed=11)
    x = community_features(comm, 8, kind="binary", seed=11)
    save_dataset_npz(str(tmp_path / "citeseer.npz"), x, ei)
    return ["cora", "coauthor-cs", "collab", "citeseer"]


def test_recipes_cover_reference_scripts():
    """Recipe tables mirror the reference's blessed scripts
    (scripts/LLP_{transductive,production}.sh, supervised_*.sh)."""
    assert set(TEACHER_RECIPES["transductive"]) == set(ALL_DATASETS)
    assert set(STUDENT_RECIPES["transductive"]) == set(ALL_DATASETS)
    # No collab production recipe exists in the reference.
    assert "collab" not in STUDENT_RECIPES["production"]
    assert STUDENT_RECIPES["transductive"]["collab"]["minibatch"] is True
    assert STUDENT_RECIPES["transductive"]["citeseer"]["llp_r"] == 1000.0
    assert TEACHER_RECIPES["transductive"]["collab"]["num_layers"] == 3


def test_discovery_separates_real_from_standins(tmp_path):
    names = _real_data_dir(tmp_path)
    found, skipped = discover_datasets(str(tmp_path))
    assert set(found) == set(names)
    for ds in found.values():
        assert not ds.synthetic
    skipped_names = {n for n, _ in skipped}
    assert "pubmed" in skipped_names and "amazon-photos" in skipped_names


def test_parity_transductive_e2e(tmp_path):
    names = _real_data_dir(tmp_path)
    report = run_parity(
        dataset_dir=str(tmp_path),
        setting="transductive",
        results_dir=str(tmp_path / "results"),
        save_dir=str(tmp_path / "saved"),
        overrides=SMOKE,
        verbose=False,
    )
    got = {e["dataset"]: e for e in report["entries"]}
    assert set(got) == set(names)
    # Split provenance: official OGB split for collab, seed-234 elsewhere.
    assert got["collab"]["split"] == "ogb:time"
    assert got["cora"]["split"] == "do_edge_split:seed=234"
    assert got["collab"]["metric"] == "Hits@50"
    assert got["cora"]["metric"] == "Hits@20"
    for e in got.values():
        for who in ("teacher", "student"):
            assert e[who]["runs"] == 1
            assert np.isfinite(e[who]["stats"]["AUC"]["test"][0])
    # Report files land in results/.
    with open(report["json_path"]) as f:
        assert json.load(f)["setting"] == "transductive"
    md = open(report["md_path"]).read()
    assert "| collab " in md and "ogb:time" in md
    assert "pubmed" in md  # skipped section names the stand-ins


def test_parity_production_smoke(tmp_path):
    _write_planetoid(tmp_path / "Cora" / "raw", "cora", n_all=120, n_test=20, d=8)
    report = run_parity(
        dataset_dir=str(tmp_path),
        datasets=["cora"],
        setting="production",
        results_dir=str(tmp_path / "results"),
        save_dir=str(tmp_path / "saved"),
        overrides=SMOKE,
        verbose=False,
    )
    (entry,) = report["entries"]
    assert entry["split"] == "do_production_edge_split:seed=234"
    st = entry["teacher"]["stats"]["AUC"]
    assert {"test", "old_old", "old_new", "new_new"} <= set(st)
    md = open(report["md_path"]).read()
    assert "old_old" in md


def test_parity_unknown_setting_rejected(tmp_path):
    with pytest.raises(ValueError, match="setting"):
        run_parity(dataset_dir=str(tmp_path), setting="inductive")
