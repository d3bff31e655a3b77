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


def _write_gnn_benchmark_npz(path, n=10, d=5, sparse_attr=True, seed=1):
    rng = np.random.default_rng(seed)
    adj = sp.random(n, n, density=0.3, random_state=seed, format="csr",
                    dtype=np.float32)
    adj.setdiag(1.0)  # include self-loops: the parser must strip them
    adj = adj.tocsr()
    x_dense = (rng.random((n, d)) < 0.5).astype(np.float32)
    arrays = dict(
        adj_data=adj.data, adj_indices=adj.indices, adj_indptr=adj.indptr,
        adj_shape=np.array(adj.shape),
    )
    if sparse_attr:
        attr = sp.csr_matrix(x_dense)
        arrays.update(attr_data=attr.data, attr_indices=attr.indices,
                      attr_indptr=attr.indptr, attr_shape=np.array(attr.shape))
    else:
        arrays["attr_matrix"] = x_dense
    np.savez(path, **arrays)
    return x_dense, adj


def test_gnn_benchmark_npz_parser(tmp_path):
    """Coauthor/Amazon raw artifact (GNN-benchmark .npz, the file PyG
    downloads — reference utils.py:35-43) loads without torch_geometric."""
    raw = tmp_path / "CS" / "raw"
    raw.mkdir(parents=True)
    x_dense, adj = _write_gnn_benchmark_npz(raw / "ms_academic_cs.npz")
    ds = get_dataset(str(tmp_path), "coauthor-cs")
    assert not ds.synthetic
    np.testing.assert_array_equal(ds.x, x_dense)
    ei = ds.edge_index
    assert (ei[0] != ei[1]).all()  # self-loops stripped
    pairs = set(map(tuple, ei.T.tolist()))
    assert all((b, a) in pairs for a, b in pairs)  # undirected
    coo = adj.tocoo()
    for u, v in zip(coo.row.tolist(), coo.col.tolist()):
        if u != v:
            assert (u, v) in pairs and (v, u) in pairs


def test_gnn_benchmark_dense_attr_variant(tmp_path):
    x_dense, _ = _write_gnn_benchmark_npz(
        tmp_path / "amazon_electronics_photo.npz", sparse_attr=False, seed=2
    )
    ds = get_dataset(str(tmp_path), "amazon-photos")
    assert not ds.synthetic
    np.testing.assert_array_equal(ds.x, x_dense)


def test_ogb_collab_raw_loader(tmp_path):
    """An untouched OGB ogbl_collab download dir (edge.csv.gz +
    node-feat.csv.gz — the dataset the reference loads via
    PygLinkPropPredDataset, main.py:307) loads directly."""
    import gzip

    raw = tmp_path / "ogbl_collab" / "raw"
    raw.mkdir(parents=True)
    rng = np.random.default_rng(3)
    n, d = 12, 4
    x = rng.normal(size=(n, d)).astype(np.float32)
    edges = np.array([[0, 1], [1, 2], [2, 3], [5, 0], [7, 7]], np.int64)
    with gzip.open(raw / "node-feat.csv.gz", "wt") as f:
        for row in x:
            f.write(",".join(f"{v:.6f}" for v in row) + "\n")
    with gzip.open(raw / "edge.csv.gz", "wt") as f:
        for u, v in edges:
            f.write(f"{u},{v}\n")
    ds = get_dataset(str(tmp_path), "collab")
    assert not ds.synthetic
    np.testing.assert_allclose(ds.x, x, atol=1e-5)
    ei = ds.edge_index
    assert (ei[0] != ei[1]).all()  # the 7,7 self-loop is stripped
    pairs = set(map(tuple, ei.T.tolist()))
    assert (1, 0) in pairs and (0, 1) in pairs and (0, 5) in pairs
    assert len(pairs) == 8  # 4 non-self edges, both directions


def test_real_names_still_fall_back_to_standins(tmp_path):
    ds = get_dataset(str(tmp_path), "coauthor-cs")
    assert ds.synthetic and ds.x.shape == (18333, 6805)
