"""Structural property tests for the transductive and production splitters."""

import numpy as np

from llp_tpu.data import (
    do_edge_split,
    do_production_edge_split,
    get_dataset,
)
from llp_tpu.data.io import (
    load_production_split_npz,
    load_split_npz,
    save_production_split_npz,
    save_split_npz,
)


def _keyset(ei, n):
    return set((ei[0].astype(np.int64) * n + ei[1].astype(np.int64)).tolist())


def test_transductive_split_structure():
    ds = get_dataset("/tmp/llp-data", "synthetic:sbm:300:4:6.0:3")
    n = ds.num_nodes
    split = do_edge_split(ds.x, ds.edge_index, seed=234)

    uniq = ds.edge_index[:, ds.edge_index[0] < ds.edge_index[1]]
    m = uniq.shape[1]
    n_v, n_t = int(0.05 * m), int(0.1 * m)

    assert split["valid"]["edge"].shape == (n_v, 2)
    assert split["test"]["edge"].shape == (n_t, 2)
    # Train made undirected: both directions (utils.py / train_test_split_edges).
    assert split["train"]["edge"].shape == (2 * (m - n_v - n_t), 2)
    assert split["train"]["edge_neg"].shape == split["train"]["edge"].shape

    all_keys = _keyset(ds.edge_index, n)
    # Positives partition the unique edges.
    vk = _keyset(split["valid"]["edge"].T, n)
    tk = _keyset(split["test"]["edge"].T, n)
    trk = _keyset(split["train"]["edge"].T, n)
    assert vk.isdisjoint(tk) and vk.isdisjoint(trk) and tk.isdisjoint(trk)
    assert vk | tk <= all_keys
    # Negatives avoid every real edge.
    for part in ("valid", "test"):
        nk = _keyset(split[part]["edge_neg"].T, n)
        assert nk.isdisjoint(all_keys)
        # val/test negs are i<j non-edges, distinct.
        en = split[part]["edge_neg"]
        assert (en[:, 0] < en[:, 1]).all()
        assert len(nk) == en.shape[0]
    # Train negs avoid train edges and self-loops (utils.py:68-72 semantics).
    tn = split["train"]["edge_neg"]
    tnk = _keyset(tn.T, n)
    assert tnk.isdisjoint(trk)
    assert (tn[:, 0] != tn[:, 1]).all()


def test_transductive_split_deterministic():
    ds = get_dataset("/tmp/llp-data", "synthetic:sbm:200:3:5.0:4")
    a = do_edge_split(ds.x, ds.edge_index, seed=234)
    b = do_edge_split(ds.x, ds.edge_index, seed=234)
    np.testing.assert_array_equal(a["train"]["edge"], b["train"]["edge"])
    c = do_edge_split(ds.x, ds.edge_index, seed=235)
    assert not np.array_equal(a["train"]["edge"], c["train"]["edge"])


def test_production_split_structure():
    ds = get_dataset("/tmp/llp-data", "synthetic:sbm:400:4:8.0:5")
    n = ds.num_nodes
    ps = do_production_edge_split(
        ds.x,
        ds.edge_index,
        test_ratio=0.3,
        val_node_ratio=0.3,
        val_ratio=0.3,
        old_old_extra_ratio=0.1,
        seed=234,
    )

    n_new = int(round(0.3 * n))
    assert ps.new_nodes.size == n_new
    assert ps.old_nodes.size == n - n_new
    assert np.intersect1d(ps.old_nodes, ps.new_nodes).size == 0
    assert ps.training_x.shape == (n - n_new, ds.num_features)
    assert ps.inference_x.shape == (n, ds.num_features)

    old = set(ps.old_nodes.tolist())
    new = set(ps.new_nodes.tolist())
    # Bucket membership (generate_production_split.py:54-68).
    for u, v in ps.test_old_old.T:
        assert int(u) in old and int(v) in old
    for u, v in ps.test_old_new.T:
        assert (int(u) in old) != (int(v) in old)
    for u, v in ps.test_new_new.T:
        assert int(u) in new and int(v) in new
    assert ps.test_merged.shape[1] == (
        ps.test_old_old.shape[1] + ps.test_old_new.shape[1] + ps.test_new_new.shape[1]
    )

    # Training graph is relabeled into [0, n_old).
    assert ps.training_edge_index.max() < ps.old_nodes.size
    # Message graph is symmetric.
    tk = _keyset(ps.training_edge_index, ps.old_nodes.size)
    rk = _keyset(ps.training_edge_index[::-1], ps.old_nodes.size)
    assert tk == rk
    # Val labels disjoint from message edges; val negs are training-graph non-edges.
    vk = _keyset(ps.val_pos, ps.old_nodes.size)
    assert vk.isdisjoint(tk)
    assert ps.val_pos.shape == ps.val_neg.shape

    # Global negatives avoid all original edges. PyG force_undirected
    # semantics (golden-gated vs the real reference run): num//2 unique
    # pairs, BOTH directions returned — each undirected negative twice.
    gk = _keyset(ps.negative_samples, n)
    assert gk.isdisjoint(_keyset(ds.edge_index, n))
    m = ps.negative_samples.shape[1] // 2
    assert ps.negative_samples.shape[1] == 2 * (
        round(0.3 * ds.edge_index.shape[1] / 2) // 2
    )
    np.testing.assert_array_equal(
        ps.negative_samples[:, m:], ps.negative_samples[::-1, :m]
    )
    assert (ps.negative_samples[0, :m] < ps.negative_samples[1, :m]).all()

    # Inference graph contains the training message edges in original ids plus
    # old-new/new-new/old-old-val train edges; all test edges excluded.
    ik = _keyset(ps.inference_edge_index, n)
    mk = _keyset(ps.test_merged, n) | _keyset(ps.test_merged[::-1], n)
    assert ik.isdisjoint(mk)


def test_split_npz_roundtrip(tmp_path):
    ds = get_dataset("/tmp/llp-data", "synthetic:sbm:150:3:5.0:6")
    split = do_edge_split(ds.x, ds.edge_index)
    p = str(tmp_path / "s.npz")
    save_split_npz(p, split)
    loaded = load_split_npz(p)
    for part in split:
        for k in split[part]:
            np.testing.assert_array_equal(split[part][k], loaded[part][k])

    ps = do_production_edge_split(
        ds.x, ds.edge_index, test_ratio=0.1, val_node_ratio=0.1, val_ratio=0.1
    )
    p2 = str(tmp_path / "ps.npz")
    save_production_split_npz(p2, ps)
    ps2 = load_production_split_npz(p2)
    np.testing.assert_array_equal(ps.training_edge_index, ps2.training_edge_index)
    np.testing.assert_array_equal(ps.negative_samples, ps2.negative_samples)


def test_registry_synthetic_standins():
    ds = get_dataset("/tmp/llp-data", "cora")
    assert ds.synthetic
    assert ds.x.shape == (2708, 1433)
    # undirected, no self-loops
    assert (ds.edge_index[0] != ds.edge_index[1]).all()
    k = _keyset(ds.edge_index, ds.num_nodes)
    kr = _keyset(ds.edge_index[::-1], ds.num_nodes)
    assert k == kr


def test_registry_sbm_spec_explicit_dim_and_kind():
    ds = get_dataset("/tmp/llp-data", "synthetic:sbm:300:4:6.0:3:96:gauss")
    assert ds.synthetic
    assert ds.x.shape == (300, 96)
    assert ds.x.dtype == np.float32
    # gauss features are dense reals, not 0/1
    assert not set(np.unique(ds.x[:4])) <= {0.0, 1.0}
    # same graph as the dim-defaulted spec (dim only changes features)
    ds2 = get_dataset("/tmp/llp-data", "synthetic:sbm:300:4:6.0:3")
    np.testing.assert_array_equal(ds.edge_index, ds2.edge_index)


def test_split_cache_fingerprint_staleness(tmp_path, rng):
    """A cached split from one graph must not be served for another."""
    from llp_tpu.data.io import dataset_fingerprint

    x1 = rng.normal(size=(50, 8)).astype(np.float32)
    ei1 = np.stack([np.arange(40, dtype=np.int64), (np.arange(40) + 1) % 40])
    x2 = rng.normal(size=(50, 8)).astype(np.float32)  # same shapes, diff data

    split = do_edge_split(x1, ei1, seed=234)
    p = str(tmp_path / "s.npz")
    fp1 = dataset_fingerprint(x1, ei1)
    save_split_npz(p, split, fingerprint=fp1)

    assert load_split_npz(p, expect_fingerprint=fp1) is not None
    fp2 = dataset_fingerprint(x2, ei1)
    assert fp2 != fp1
    assert load_split_npz(p, expect_fingerprint=fp2) is None  # stale -> regen
    # legacy cache without a fingerprint is treated as stale too
    save_split_npz(p, split)
    assert load_split_npz(p, expect_fingerprint=fp1) is None


def test_registry_all_eight_reference_datasets_resolve():
    """Every reference dataset name resolves with the real dataset's shape
    (stand-in generation gated to the small ones to keep the suite fast;
    the big ones are validated by shape-table lookup + collab/physics TPU
    runs recorded in BASELINE.md)."""
    from llp_tpu.data.registry import _REAL_SHAPES

    expected = {
        "cora", "citeseer", "pubmed", "coauthor-cs", "coauthor-physics",
        "amazon-computers", "amazon-photos", "collab",
    }
    assert set(_REAL_SHAPES) == expected
    for name in ("citeseer", "amazon-photos"):
        ds = get_dataset("/tmp/llp-data", name)
        n, d = _REAL_SHAPES[name][0], _REAL_SHAPES[name][1]
        assert ds.x.shape == (n, d)
        assert ds.edge_index.max() < n


def test_nonedge_sampler_is_uniform():
    """Review finding: sorted-key truncation biased val/test negatives toward
    low node ids (mean min-endpoint ~N/5). Uniform i<j pairs have mean
    min-endpoint ~N/3."""
    import numpy as np

    from llp_tpu.data.splits import _sample_nonedges_upper

    rng = np.random.default_rng(0)
    n, s = 10000, 5000
    pairs = _sample_nonedges_upper(rng, s, n, np.zeros((0,), np.int64))
    lo = pairs.min(axis=0)
    assert abs(lo.mean() - n / 3) < 0.03 * n, f"biased: mean {lo.mean()}"
    keys = pairs[0].astype(np.int64) * n + pairs[1]
    assert len(np.unique(keys)) == s and (pairs[0] < pairs[1]).all()
