"""Reference pickle-artifact import (data/import_reference.py, cli/import_reference.py).

The reference persists splits and teacher artifacts as torch/PyG pickles
(SURVEY §1 artifact contract); these tests build byte-identical-format fakes
(torch tensors; PyG ``Data`` pickle layout referenced by module path WITHOUT
torch_geometric installed) and check they import into working llp_tpu
artifacts — including a full student-distillation run off an imported teacher.
"""

from __future__ import annotations

import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")


def _t(a, dtype=None):
    return torch.as_tensor(np.asarray(a), dtype=dtype)


# ---------------------------------------------------------------- transductive


def _fake_transductive_split(n=60, m=120, seed=0):
    rng = np.random.default_rng(seed)
    parts = {}
    for part, k in (("train", m), ("valid", 12), ("test", 18)):
        parts[part] = {
            "edge": _t(rng.integers(0, n, size=(k, 2)), torch.long),
            "edge_neg": _t(rng.integers(0, n, size=(k, 2)), torch.long),
        }
    return parts


def test_transductive_split_pickle_imports(tmp_path):
    from llp_tpu.data.import_reference import load_transductive_split_pickle

    blob = _fake_transductive_split()
    p = tmp_path / "cora.pkl"
    torch.save(blob, str(p))

    split = load_transductive_split_pickle(str(p))
    for part in ("train", "valid", "test"):
        for k in ("edge", "edge_neg"):
            got = split[part][k]
            assert got.dtype == np.int64 and got.ndim == 2 and got.shape[1] == 2
            np.testing.assert_array_equal(got, blob[part][k].numpy())


# ------------------------------------------------------------------ production


def _install_fake_pyg():
    """Register a torch_geometric stand-in that PICKLES like PyG 2.x: Data
    holds ``_store`` (GlobalStorage) whose ``_mapping`` carries the tensors."""

    class BaseStorage:
        def __init__(self, mapping):
            self._mapping = dict(mapping)

    class GlobalStorage(BaseStorage):
        pass

    class Data:
        def __init__(self, **kw):
            self._store = GlobalStorage(kw)

    pkg = types.ModuleType("torch_geometric")
    data_pkg = types.ModuleType("torch_geometric.data")
    data_mod = types.ModuleType("torch_geometric.data.data")
    storage_mod = types.ModuleType("torch_geometric.data.storage")
    Data.__module__ = "torch_geometric.data.data"
    Data.__qualname__ = "Data"
    BaseStorage.__module__ = GlobalStorage.__module__ = (
        "torch_geometric.data.storage"
    )
    BaseStorage.__qualname__ = "BaseStorage"
    GlobalStorage.__qualname__ = "GlobalStorage"
    data_mod.Data = Data
    storage_mod.BaseStorage = BaseStorage
    storage_mod.GlobalStorage = GlobalStorage
    data_pkg.data = data_mod
    data_pkg.Data = Data
    pkg.data = data_pkg
    mods = {
        "torch_geometric": pkg,
        "torch_geometric.data": data_pkg,
        "torch_geometric.data.data": data_mod,
        "torch_geometric.data.storage": storage_mod,
    }
    sys.modules.update(mods)
    return Data, list(mods)


def _fake_production_pickle(path, n_old=40, n=55, d=8, seed=1):
    rng = np.random.default_rng(seed)
    Data, mods = _install_fake_pyg()
    try:
        def edges(lo, hi, k):
            return _t(rng.integers(lo, hi, size=(2, k)), torch.long)

        tr_x = rng.normal(size=(n_old, d)).astype(np.float32)
        full_x = rng.normal(size=(n, d)).astype(np.float32)
        tr_ei = edges(0, n_old, 90)
        val_eli = edges(0, n_old, 20)
        val_label = _t(np.array([1] * 10 + [0] * 10), torch.float32)
        training_data = Data(x=_t(tr_x), edge_index=tr_ei)
        val_data = Data(
            x=_t(tr_x), edge_index=tr_ei,
            edge_label_index=val_eli, edge_label=val_label,
        )
        inference_data = Data(x=_t(full_x), edge_index=edges(0, n, 140))
        data = Data(x=_t(full_x), edge_index=edges(0, n, 160))
        bundle = (edges(0, n, 7), edges(0, n, 5), edges(0, n, 3), edges(0, n, 15))
        negatives = edges(0, n, 25)
        blob = (training_data, val_data, inference_data, data, bundle, negatives)
        torch.save(blob, path)
        expected = dict(
            training_x=tr_x,
            training_edge_index=tr_ei.numpy(),
            val_pos=val_eli.numpy()[:, :10],
            val_neg=val_eli.numpy()[:, 10:],
            inference_x=full_x,
            test_merged=bundle[3].numpy(),
            negative_samples=negatives.numpy(),
            full_x=full_x,
            full_ei=data._store._mapping["edge_index"].numpy(),
        )
        return expected
    finally:
        for m in mods:
            sys.modules.pop(m, None)


def test_production_pickle_imports_without_torch_geometric(tmp_path):
    from llp_tpu.data.import_reference import load_production_split_pickle

    p = str(tmp_path / "cora_production.pkl")
    exp = _fake_production_pickle(p)

    # the shim path is only meaningful if PyG truly is absent
    with pytest.raises(ImportError):
        import torch_geometric  # noqa: F401

    ps, full_x, full_ei = load_production_split_pickle(p)
    np.testing.assert_allclose(ps.training_x, exp["training_x"])
    np.testing.assert_array_equal(ps.training_edge_index, exp["training_edge_index"])
    np.testing.assert_array_equal(ps.val_pos, exp["val_pos"])
    np.testing.assert_array_equal(ps.val_neg, exp["val_neg"])
    np.testing.assert_allclose(ps.inference_x, exp["inference_x"])
    np.testing.assert_array_equal(ps.test_merged, exp["test_merged"])
    np.testing.assert_array_equal(ps.negative_samples, exp["negative_samples"])
    np.testing.assert_allclose(full_x, exp["full_x"])
    np.testing.assert_array_equal(full_ei, exp["full_ei"])


def test_cli_production_import_feeds_teacher_driver(tmp_path):
    """CLI import of a production pickle → run_teacher trains on it."""
    from llp_tpu.cli.import_reference import main as import_main
    from llp_tpu.data.io import dataset_fingerprint, load_production_split_npz

    pkl = str(tmp_path / "mini_production.pkl")
    exp = _fake_production_pickle(pkl, n_old=40, n=55, d=8)
    ddir = str(tmp_path / "data")
    import_main([
        "--datasets=mini", f"--dataset_dir={ddir}", f"--production_pkl={pkl}",
    ])

    fp = dataset_fingerprint(exp["full_x"], exp["full_ei"])
    ps = load_production_split_npz(
        os.path.join(ddir, "mini_production.npz"), expect_fingerprint=fp
    )
    assert ps is not None
    np.testing.assert_array_equal(ps.val_pos, exp["val_pos"])

    from llp_tpu.train.loop import run_teacher
    from llp_tpu.utils.config import TeacherConfig

    cfg = TeacherConfig(
        datasets="mini", dataset_dir=ddir, transductive="production",
        runs=1, epochs=2, eval_steps=1, patience=5, hidden_channels=16,
        batch_size=64, save_dir=str(tmp_path / "saved"),
        results_dir=str(tmp_path / "results"),
    )
    stats, _ = run_teacher(cfg, verbose=False)
    assert "Hits@20" in stats


# ------------------------------------------------------- teacher checkpoints


def _fake_teacher_state(n=80, d=12, h=16, seed=3):
    """State dicts named exactly as the reference saves them
    (train_teacher_gnn.py:452): PyG SAGEConv + LinkPredictor layouts."""
    g = torch.Generator().manual_seed(seed)
    rnd = lambda *s: torch.randn(*s, generator=g) * 0.1
    gnn = {}
    dims = [(d, h), (h, h)]
    for i, (i_d, o_d) in enumerate(dims):
        gnn[f"convs.{i}.lin_l.weight"] = rnd(o_d, i_d)
        gnn[f"convs.{i}.lin_l.bias"] = rnd(o_d)
        gnn[f"convs.{i}.lin_r.weight"] = rnd(o_d, i_d)
    pred = {}
    for i, (i_d, o_d) in enumerate([(h, h), (h, 1)]):
        pred[f"lins.{i}.weight"] = rnd(o_d, i_d)
        pred[f"lins.{i}.bias"] = rnd(o_d)
    features = torch.randn(n, h, generator=g)
    return {"gnn": gnn, "predictor": pred}, {"features": features}


def test_imported_teacher_checkpoint_drives_student_distillation(tmp_path):
    """Full switching path: reference saved-models + saved-features pickles →
    llp_tpu checkpoint → run_student distills from it."""
    ds = "synthetic:sbm:80:4:5.0:3:12:gauss"  # N=80, D=12 to match the fake teacher
    models, feats = _fake_teacher_state(n=80, d=12, h=16)
    mp, fp_ = str(tmp_path / "models.pkl"), str(tmp_path / "features.pkl")
    torch.save(models, mp)
    torch.save(feats, fp_)

    from llp_tpu.cli.import_reference import main as import_main

    save_dir = str(tmp_path / "saved")
    import_main([
        f"--datasets={ds}", f"--save_dir={save_dir}",
        f"--models_pkl={mp}", f"--features_pkl={fp_}", "--encoder=sage",
    ])

    from llp_tpu.utils.checkpoint import load_checkpoint

    ckpt, meta = load_checkpoint(os.path.join(save_dir, f"{ds}-sage_transductive"))
    assert meta["hidden_channels"] == 16 and meta["predictor_layers"] == 2
    assert np.asarray(ckpt["features"]).shape == (80, 16)
    # torch (out,in) -> ours (in,out)
    np.testing.assert_allclose(
        np.asarray(ckpt["params"]["encoder"]["convs"][0]["lin_l"]["w"]),
        models["gnn"]["convs.0.lin_l.weight"].numpy().T,
        rtol=1e-6,
    )

    from llp_tpu.train.loop import run_student
    from llp_tpu.utils.config import StudentConfig

    cfg = StudentConfig(
        datasets=ds, dataset_dir=str(tmp_path / "data"), encoder="sage",
        runs=1, epochs=3, eval_steps=1, patience=5, hidden_channels=16,
        link_batch_size=256, save_dir=save_dir,
        results_dir=str(tmp_path / "results"),
    )
    stats, _ = run_student(cfg, verbose=False)
    assert "Hits@20" in stats


def test_import_teacher_infers_depth_and_conv(tmp_path):
    """Review findings: encoder depth must be counted off the weights (no
    silent truncation of 3-layer teachers under a default of 2), and
    coauthor-physics must get conv='sage_updated' like native checkpoints."""
    g = torch.Generator().manual_seed(5)
    rnd = lambda *s: torch.randn(*s, generator=g) * 0.1
    gnn = {}
    for i, (i_d, o_d) in enumerate([(12, 16), (16, 16), (16, 16)]):  # 3 layers
        gnn[f"convs.{i}.lin_l.weight"] = rnd(o_d, i_d)
        gnn[f"convs.{i}.lin_l.bias"] = rnd(o_d)
        gnn[f"convs.{i}.lin_r.weight"] = rnd(o_d, i_d)
    pred = {}
    for i, (i_d, o_d) in enumerate([(16, 16), (16, 1)]):
        pred[f"lins.{i}.weight"] = rnd(o_d, i_d)
        pred[f"lins.{i}.bias"] = rnd(o_d)
    mp_, fp_ = str(tmp_path / "m.pkl"), str(tmp_path / "f.pkl")
    torch.save({"gnn": gnn, "predictor": pred}, mp_)
    torch.save({"features": torch.randn(20, 16, generator=g)}, fp_)

    from llp_tpu.data.import_reference import import_teacher_checkpoint

    meta = import_teacher_checkpoint(
        mp_, fp_, str(tmp_path / "out"), encoder="sage",
        dataset="coauthor-physics",
    )
    assert meta["num_layers"] == 3
    assert meta["conv"] == "sage_updated"

    from llp_tpu.utils.checkpoint import load_checkpoint

    ckpt, _ = load_checkpoint(str(tmp_path / "out"))
    assert len(ckpt["params"]["encoder"]["convs"]) == 3

    meta2 = import_teacher_checkpoint(
        mp_, fp_, str(tmp_path / "out2"), encoder="sage", dataset="cora",
    )
    assert meta2["conv"] == "sage"
