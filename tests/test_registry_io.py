"""Planetoid raw-format parser, CLI config plumbing, profiling meter."""

import pickle

import numpy as np
import scipy.sparse as sp

from llp_tpu.data.registry import get_dataset


def _write_planetoid(base, name, n_all=12, n_test=4, d=6):
    base.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(0)
    allx = sp.csr_matrix(rng.random((n_all - n_test, d)) < 0.4, dtype=np.float32)
    tx = sp.csr_matrix(rng.random((n_test, d)) < 0.4, dtype=np.float32)
    graph = {i: [int(j) for j in rng.choice(n_all, 2, replace=False) if j != i]
             for i in range(n_all)}
    test_idx = np.arange(n_all - n_test, n_all)
    for suffix, obj in (("allx", allx), ("tx", tx), ("graph", graph)):
        with open(base / f"ind.{name}.{suffix}", "wb") as f:
            pickle.dump(obj, f)
    np.savetxt(base / f"ind.{name}.test.index", test_idx, fmt="%d")
    return n_all, d


def test_planetoid_parser(tmp_path):
    n, d = _write_planetoid(tmp_path / "Cora" / "raw", "cora")
    ds = get_dataset(str(tmp_path), "cora")
    assert not ds.synthetic
    assert ds.x.shape == (n, d)
    # symmetric, no self-loops
    ei = ds.edge_index
    assert (ei[0] != ei[1]).all()
    k = set(map(tuple, ei.T.tolist()))
    assert all((b, a) in k for a, b in k)


def test_npz_dataset_takes_priority(tmp_path):
    from llp_tpu.data.io import save_dataset_npz

    x = np.ones((5, 3), np.float32)
    ei = np.array([[0, 1, 1, 2], [1, 0, 2, 1]])
    save_dataset_npz(str(tmp_path / "cora.npz"), x, ei)
    ds = get_dataset(str(tmp_path), "cora")
    assert ds.x.shape == (5, 3) and not ds.synthetic


def test_cli_config_from_args_rename():
    import argparse

    from llp_tpu.cli.common import config_from_args
    from llp_tpu.utils.config import StudentConfig

    ns = argparse.Namespace(config=None, LLP_D=7.0, KD_RM=2.0, datasets="citeseer",
                            lr=0.25)
    cfg = config_from_args(
        StudentConfig, ns,
        rename={"LLP_D": "llp_d", "KD_RM": "kd_rm"},
    )
    assert cfg.llp_d == 7.0 and cfg.kd_rm == 2.0
    assert cfg.datasets == "citeseer" and cfg.lr == 0.25


def test_throughput_meter():
    import time

    from llp_tpu.utils.profiling import ThroughputMeter

    m = ThroughputMeter(edges_per_epoch=1000)
    for _ in range(3):
        m.start_epoch()
        time.sleep(0.01)
        m.end_epoch()
    s = m.summary()
    assert s["epochs"] == 3
    assert s["edges_per_sec"] > 0


def test_memory_stats_shape():
    from llp_tpu.utils.memory import get_device_memory_map

    mm = get_device_memory_map()
    assert isinstance(mm, dict) and len(mm) >= 1


def test_k_hop_subgraph():
    from llp_tpu.data.subsample import k_hop_subgraph

    # path graph 0-1-2-3-4-5 (both directions)
    ei = np.array([[0, 1, 1, 2, 2, 3, 3, 4, 4, 5],
                   [1, 0, 2, 1, 3, 2, 4, 3, 5, 4]])
    nodes, sub = k_hop_subgraph(ei, 6, np.array([0]), num_hops=2)
    assert list(nodes) == [0, 1, 2]
    # induced edges: 0-1, 1-2 both directions, relabeled
    pairs = set(map(tuple, sub.T.tolist()))
    assert pairs == {(0, 1), (1, 0), (1, 2), (2, 1)}
    # 0 hops: seeds only, no edges
    nodes0, sub0 = k_hop_subgraph(ei, 6, np.array([3]), num_hops=0)
    assert list(nodes0) == [3] and sub0.shape[1] == 0


def test_export_npz_roundtrips_into_registry(tmp_path):
    from llp_tpu.data.registry import get_dataset
    from llp_tpu.data.subsample import export_npz

    rng = np.random.default_rng(5)
    x = rng.normal(size=(30, 6)).astype(np.float32)
    ei = np.stack([np.arange(29, dtype=np.int64), np.arange(1, 30, dtype=np.int64)])
    both = np.concatenate([ei, ei[::-1]], axis=1)
    export_npz(str(tmp_path / "mygraph.npz"), x, both)
    ds = get_dataset(str(tmp_path), "mygraph")
    assert ds.num_nodes == 30
    np.testing.assert_allclose(ds.x, x)
    assert ds.edge_index.shape == both.shape
