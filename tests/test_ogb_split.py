"""Official OGB collab split + edge-weighted aggregation.

The reference does NOT re-split collab: it uses OGB's shipped time-based
split via ``dataset.get_edge_split()`` (reference ``src/main.py:313``,
``src/train_teacher_gnn.py:327``) and loads the per-edge co-authorship
weights (``src/main.py:310``).  These tests synthesize an untouched
``ogbl_collab`` download directory (raw csv.gz + split/time/*.pt) and check
that (a) the registry parses split + weights, (b) the transductive driver
routes through the official split, and (c) weighted aggregation matches a
dense reference.
"""

import gzip
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llp_tpu.core.graph import build_graph
from llp_tpu.data.registry import get_dataset
from llp_tpu.ops.spmm import mean_aggregate, weighted_in_degree


def _write_csv_gz(path, arr, fmt):
    with gzip.open(path, "wt") as f:
        for row in np.atleast_2d(arr):
            f.write(",".join(fmt % v for v in np.atleast_1d(row)) + "\n")


def _make_ogb_dir(root, *, tensors=False, with_weights=True, with_split=True,
                  n=40, seed=0):
    """Synthesize an official-format ogbl_collab download under root."""
    import torch

    rng = np.random.default_rng(seed)
    d = 8
    x = rng.standard_normal((n, d)).astype(np.float32)

    def pairs(m):
        a = rng.integers(0, n, size=(m, 2))
        a = a[a[:, 0] != a[:, 1]]
        return a.astype(np.int64)

    train = pairs(120)
    # Duplicate a few rows (multi-year collaborations) to exercise coalescing.
    train = np.concatenate([train, train[:7]], axis=0)
    valid, test = pairs(20), pairs(20)
    valid_neg, test_neg = pairs(30), pairs(30)
    w_train = rng.integers(1, 5, size=train.shape[0]).astype(np.float32)
    w_valid = rng.integers(1, 5, size=valid.shape[0]).astype(np.float32)
    w_test = rng.integers(1, 5, size=test.shape[0]).astype(np.float32)
    years = rng.integers(1990, 2020, size=train.shape[0]).astype(np.int64)

    raw = os.path.join(root, "ogbl_collab", "raw")
    os.makedirs(raw, exist_ok=True)
    _write_csv_gz(os.path.join(raw, "edge.csv.gz"), train, "%d")
    _write_csv_gz(os.path.join(raw, "node-feat.csv.gz"), x, "%.6f")
    if with_weights:
        _write_csv_gz(
            os.path.join(raw, "edge_weight.csv.gz"), w_train[:, None], "%.1f"
        )

    if with_split:
        sdir = os.path.join(root, "ogbl_collab", "split", "time")
        os.makedirs(sdir, exist_ok=True)

        def conv(a):
            return torch.as_tensor(a) if tensors else a

        torch.save(
            {"edge": conv(train), "weight": conv(w_train), "year": conv(years)},
            os.path.join(sdir, "train.pt"),
        )
        torch.save(
            {"edge": conv(valid), "weight": conv(w_valid), "edge_neg": conv(valid_neg)},
            os.path.join(sdir, "valid.pt"),
        )
        torch.save(
            {"edge": conv(test), "weight": conv(w_test), "edge_neg": conv(test_neg)},
            os.path.join(sdir, "test.pt"),
        )
    return dict(
        x=x, train=train, valid=valid, test=test,
        valid_neg=valid_neg, test_neg=test_neg, w_train=w_train,
    )


@pytest.mark.parametrize("tensors", [False, True])
def test_registry_parses_official_split(tmp_path, tensors):
    ref = _make_ogb_dir(str(tmp_path), tensors=tensors)
    ds = get_dataset(str(tmp_path), "collab")
    assert ds.split is not None and ds.split_name == "ogb:time"
    np.testing.assert_array_equal(ds.split["train"]["edge"], ref["train"])
    np.testing.assert_array_equal(ds.split["valid"]["edge"], ref["valid"])
    np.testing.assert_array_equal(ds.split["valid"]["edge_neg"], ref["valid_neg"])
    np.testing.assert_array_equal(ds.split["test"]["edge"], ref["test"])
    np.testing.assert_array_equal(ds.split["test"]["edge_neg"], ref["test_neg"])
    assert ds.split["train"]["edge"].dtype == np.int64
    assert ds.split["train"]["weight"].dtype == np.float32

    # Message graph = symmetrized train edges, duplicate weights coalesced by
    # summation (SparseTensor.coalesce semantics).
    n = ds.num_nodes
    assert ds.edge_weight is not None
    dense = np.zeros((n, n))
    for (u, v), w in zip(ref["train"], ref["w_train"]):
        dense[u, v] += w
        dense[v, u] += w
    got = np.zeros((n, n))
    for (u, v), w in zip(ds.edge_index.T, ds.edge_weight):
        assert got[u, v] == 0, "duplicate edge after coalescing"
        got[u, v] = w
    np.testing.assert_allclose(got, dense, rtol=1e-6)
    # Undirected: both directions present with equal weight.
    np.testing.assert_allclose(got, got.T)


def test_registry_without_split_dir_falls_back(tmp_path):
    _make_ogb_dir(str(tmp_path), with_split=False)
    ds = get_dataset(str(tmp_path), "collab")
    assert ds.split is None and ds.split_name == ""
    assert ds.edge_weight is not None  # weights still parsed from raw


def test_prepare_transductive_uses_official_split(tmp_path):
    from llp_tpu.train.loop import prepare_transductive
    from llp_tpu.utils.config import TeacherConfig

    ref = _make_ogb_dir(str(tmp_path))
    cfg = TeacherConfig(datasets="collab", dataset_dir=str(tmp_path)).finalize()
    data = prepare_transductive(cfg)
    assert data["split_name"] == "ogb:time"
    # Positives are the official train edges (single direction, duplicates
    # kept — the reference's pos_train_edge, train_teacher_gnn.py:26-35).
    np.testing.assert_array_equal(
        np.asarray(data["pos_edges"]), ref["train"].astype(np.int32)
    )
    # Eval edges come from the shipped split, not a re-split.
    np.testing.assert_array_equal(
        np.asarray(data["eval_edges"]["valid_pos"]), ref["valid"].astype(np.int32)
    )
    np.testing.assert_array_equal(
        np.asarray(data["eval_edges"]["test_neg"]), ref["test_neg"].astype(np.int32)
    )
    # No split cache written (the official split needs no cache).
    assert not os.path.exists(os.path.join(str(tmp_path), "collab_split.npz"))
    # Message graph = symmetrized train edges; no weights unless requested.
    assert data["graph"].edge_weight is None
    # Metric forced to Hits@50 like the reference (main.py:315).
    assert cfg.metric == "Hits@50"


def test_prepare_transductive_weighted_graph(tmp_path):
    from llp_tpu.train.loop import prepare_transductive
    from llp_tpu.utils.config import TeacherConfig

    _make_ogb_dir(str(tmp_path))
    cfg = TeacherConfig(
        datasets="collab", dataset_dir=str(tmp_path), use_edge_weight=True
    ).finalize()
    data = prepare_transductive(cfg)
    g = data["graph"]
    assert g.edge_weight is not None
    assert g.edge_weight.shape[0] == g.num_padded_edges
    # Padded tail carries zero weight.
    w = np.asarray(g.edge_weight)
    assert np.all(w[g.num_edges:] == 0)
    assert np.all(w[: g.num_edges] > 0)


def test_use_edge_weight_requires_weights(tmp_path):
    from llp_tpu.train.loop import prepare_transductive
    from llp_tpu.utils.config import TeacherConfig

    cfg = TeacherConfig(
        datasets="synthetic:sbm:60:3:4.0", dataset_dir=str(tmp_path),
        use_edge_weight=True,
    ).finalize()
    with pytest.raises(ValueError, match="no.*edge weights"):
        prepare_transductive(cfg)


# ------------------------------------------------------- weighted aggregation


def _weighted_graph(seed=0, n=30, e=90, impl_pad=128):
    rng = np.random.default_rng(seed)
    ei = rng.integers(0, n, size=(2, e))
    ei = ei[:, ei[0] != ei[1]]
    w = rng.uniform(0.5, 3.0, size=ei.shape[1]).astype(np.float32)
    g = build_graph(ei, n, pad_to_multiple=impl_pad, edge_weight=w)
    x = rng.standard_normal((n, 5)).astype(np.float32)
    return g, ei, w, x


def test_weighted_mean_matches_dense():
    g, ei, w, x = _weighted_graph()
    n = g.num_nodes
    dense_w = np.zeros((n, n), np.float64)
    for (u, v), wv in zip(ei.T, w):
        dense_w[v, u] += wv  # messages flow sender->receiver
    wdeg = dense_w.sum(axis=1)
    expect = (dense_w @ x.astype(np.float64)) / np.maximum(wdeg, 1e-12)[:, None]

    got = mean_aggregate(g, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), expect, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(weighted_in_degree(g)), wdeg, rtol=1e-6
    )


def test_weighted_gcn_matches_dense():
    from llp_tpu.models.gcn import _normalized_aggregate, gcn_norm_coeffs

    g, ei, w, x = _weighted_graph(seed=1)
    n = g.num_nodes
    dense_w = np.zeros((n, n), np.float64)
    for (u, v), wv in zip(ei.T, w):
        dense_w[v, u] += wv
    deg_hat = dense_w.sum(axis=1) + 1.0  # weighted degree + self-loop
    a_hat = dense_w + np.eye(n)
    norm = 1.0 / np.sqrt(deg_hat)
    expect = (norm[:, None] * a_hat * norm[None, :]) @ x.astype(np.float64)

    got = _normalized_aggregate(g, jnp.asarray(x), gcn_norm_coeffs(g))
    np.testing.assert_allclose(np.asarray(got), expect, rtol=1e-5, atol=1e-5)


def test_weighted_sage_updated_hoist_parity():
    """Hoisted (x_agg) and direct linear-then-aggregate orders agree on a
    weighted graph (the hoist's bias gate must use the WEIGHTED degree)."""
    from llp_tpu.models.sage import apply_sage_conv_updated, init_sage_conv
    from llp_tpu.models.encoder import precompute_first_aggregation

    g, _, _, x = _weighted_graph(seed=2)
    params = init_sage_conv(jax.random.PRNGKey(0), 5, 4)
    direct = apply_sage_conv_updated(params, g, jnp.asarray(x))
    x_agg = precompute_first_aggregation("sage", g, jnp.asarray(x))
    hoisted = apply_sage_conv_updated(params, g, jnp.asarray(x), x_agg=x_agg)
    np.testing.assert_allclose(
        np.asarray(direct), np.asarray(hoisted), rtol=1e-5, atol=1e-5
    )


def test_weighted_segsum_path_matches_xla():
    g, _, _, x = _weighted_graph(seed=3)
    from llp_tpu.ops.pallas.segsum_kernel import prepare_segsum

    prepare_segsum(g, weighted=True)
    ref = mean_aggregate(g, jnp.asarray(x), impl="xla")
    got = jax.jit(lambda xx: mean_aggregate(g, xx, impl="segsum"))(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_weighted_collab_teacher_e2e(tmp_path):
    """A weighted teacher run on the synthesized official collab download:
    official split + weighted aggregation, end to end (VERDICT item #1/#5)."""
    from llp_tpu.train.loop import run_teacher
    from llp_tpu.utils.config import TeacherConfig

    _make_ogb_dir(str(tmp_path), n=40)
    cfg = TeacherConfig(
        datasets="collab",
        dataset_dir=str(tmp_path),
        use_edge_weight=True,
        encoder="sage",
        hidden_channels=16,
        batch_size=64,
        runs=1,
        epochs=2,
        eval_steps=1,
        patience=10,
        results_dir=str(tmp_path / "results"),
        save_dir=str(tmp_path / "saved"),
        spmm_impl="xla",
    )
    stats, _ = run_teacher(cfg, verbose=False)
    assert "Hits@50" in stats and np.isfinite(stats["AUC"]["test"][0])
    # Results file records the split provenance.
    res = (tmp_path / "results" / "collab_supervised_transductive.txt").read_text()
    assert "split: ogb:time" in res


def test_weighted_halo_teacher_driver_e2e(tmp_path):
    """Weighted + halo through the REAL driver: feature-sharded training AND
    feature-sharded eval on the weighted official-split collab graph."""
    import jax as _jax

    if len(_jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    from llp_tpu.train.loop import run_teacher
    from llp_tpu.utils.config import TeacherConfig

    _make_ogb_dir(str(tmp_path), n=80, seed=2)
    cfg = TeacherConfig(
        datasets="collab", dataset_dir=str(tmp_path), use_edge_weight=True,
        num_devices=8, sharding="halo", encoder="sage", hidden_channels=16,
        batch_size=256, runs=1, epochs=2, eval_steps=1, patience=5,
        results_dir=str(tmp_path / "results"), save_dir=str(tmp_path / "saved"),
        spmm_impl="xla", log_steps=100,
    )
    stats, _ = run_teacher(cfg, verbose=False)
    assert np.isfinite(stats["AUC"]["test"][0])


def test_weighted_sharding_gates(tmp_path):
    """Weighted training runs on every execution model (single-device, DP,
    halo); production rejects it (the production splitter has no weights)."""
    from llp_tpu.train.loop import prepare_transductive
    from llp_tpu.utils.config import TeacherConfig

    _make_ogb_dir(str(tmp_path))
    for sharding in ("dp", "halo"):
        cfg = TeacherConfig(
            datasets="collab", dataset_dir=str(tmp_path), use_edge_weight=True,
            num_devices=2, sharding=sharding,
        ).finalize()
        data = prepare_transductive(cfg)
        assert data["graph"].edge_weight is not None
        assert data["graph"].w_in_degree is not None
    with pytest.raises(ValueError, match="transductive capability"):
        TeacherConfig(
            datasets="collab", dataset_dir=str(tmp_path),
            use_edge_weight=True, transductive="production",
        ).finalize()


def test_parse_cache_roundtrip_and_invalidation(tmp_path):
    """The raw-CSV parse caches to {name}_parsed.npz (keyed by the raw
    files' fingerprint) and invalidates when the download changes."""
    import time as _t

    _make_ogb_dir(str(tmp_path))
    ds1 = get_dataset(str(tmp_path), "collab")
    cache = tmp_path / "collab_parsed.npz"
    assert cache.exists()
    ds2 = get_dataset(str(tmp_path), "collab")  # served from the cache
    np.testing.assert_array_equal(ds1.edge_index, ds2.edge_index)
    np.testing.assert_allclose(ds1.edge_weight, ds2.edge_weight)
    assert ds2.split_name == "ogb:time"
    np.testing.assert_array_equal(
        ds1.split["valid"]["edge_neg"], ds2.split["valid"]["edge_neg"]
    )
    # Corrupt the cache to prove the second load actually used it... by
    # replacing it with a DIFFERENT but valid parse: load must return the
    # cache's content, not re-parse.
    from llp_tpu.data.io import save_dataset_npz
    import numpy as _np

    with _np.load(cache) as z:
        fp = int(z["raw_fingerprint"])
    save_dataset_npz(
        str(cache), ds1.x, ds1.edge_index[:, :4],
        extra={"raw_fingerprint": _np.asarray(fp, _np.int64)},
    )
    ds3 = get_dataset(str(tmp_path), "collab")
    assert ds3.edge_index.shape[1] == 4  # cache was used
    # A changed raw file (newer mtime) invalidates the cache -> full parse.
    edge_gz = tmp_path / "ogbl_collab" / "raw" / "edge.csv.gz"
    _t.sleep(0.02)
    os.utime(edge_gz)
    ds4 = get_dataset(str(tmp_path), "collab")
    np.testing.assert_array_equal(ds4.edge_index, ds1.edge_index)


def test_npz_interchange_carries_weights_and_split(tmp_path):
    """A {name}.npz export preserves edge weights AND the official split, so
    converting the download to npz keeps the reference protocol."""
    from llp_tpu.data.io import save_dataset_npz

    src = tmp_path / "src"
    _make_ogb_dir(str(src))
    ds = get_dataset(str(src), "collab")

    out_dir = tmp_path / "exported"
    out_dir.mkdir()
    save_dataset_npz(
        str(out_dir / "collab.npz"), ds.x, ds.edge_index,
        edge_weight=ds.edge_weight, split=ds.split, split_name=ds.split_name,
    )
    ds2 = get_dataset(str(out_dir), "collab")
    assert not ds2.synthetic
    assert ds2.split_name == "ogb:time"
    np.testing.assert_allclose(ds2.edge_weight, ds.edge_weight)
    for part in ("train", "valid", "test"):
        np.testing.assert_array_equal(
            ds2.split[part]["edge"], ds.split[part]["edge"]
        )
    np.testing.assert_array_equal(
        ds2.split["test"]["edge_neg"], ds.split["test"]["edge_neg"]
    )
