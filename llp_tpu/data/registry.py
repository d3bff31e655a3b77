"""Dataset registry: name -> (features, undirected edge list).

Mirrors the reference's ``get_dataset`` surface (reference
``src/utils.py:30-50``: cora/citeseer/pubmed via Planetoid, coauthor-cs/
physics, amazon-computers/photos; ogbl-collab handled specially in the mains)
but sources data from, in order of preference:

1. ``<root>/<name>.npz`` — a local export with arrays ``x`` (N, D) float32 and
   ``edge_index`` (2, E) int64 (both directions).  This is the interchange
   format for the real datasets; ``llp_tpu.data.io.save_dataset_npz`` writes
   it, and a one-time torch-side export from PyG produces bit-identical
   inputs for parity runs.
2. Planetoid raw files (``ind.<name>.*``) if present under
   ``<root>/<Name>/raw`` — parsed directly, no PyG needed.
3. GNN-benchmark ``.npz`` raw files (the format PyG's Coauthor/Amazon
   datasets download, e.g. ``ms_academic_cs.npz``) — parsed directly.
4. An OGB ``ogbl_collab`` download directory (``edge.csv.gz`` +
   ``node-feat.csv.gz``) for the collab dataset the reference loads via
   ``PygLinkPropPredDataset`` (reference ``src/main.py:307``).
5. A seeded synthetic stand-in with the real dataset's (N, D, avg-degree)
   shape — the offline default in this environment (no egress).

Synthetic names are also first-class:
``synthetic:sbm:<n>:<k>:<deg>[:seed[:dim[:binary|gauss]]]`` and
``synthetic:ba:<n>:<m>[:seed]``.
"""

from __future__ import annotations

import os
import pickle
import sys
from dataclasses import dataclass

import numpy as np

from llp_tpu.data.synthetic import ba_graph, community_features, sbm_graph

# (num_nodes, feature_dim, avg_degree, feature_kind, communities) of the real
# datasets — used to shape synthetic stand-ins.
_REAL_SHAPES = {
    "cora": (2708, 1433, 3.9, "binary", 7),
    "citeseer": (3327, 3703, 2.7, "binary", 6),
    "pubmed": (19717, 500, 4.5, "binary", 3),
    "coauthor-cs": (18333, 6805, 8.9, "binary", 15),
    "coauthor-physics": (34493, 8415, 14.4, "binary", 5),
    "amazon-computers": (13752, 767, 35.8, "binary", 10),
    "amazon-photos": (7650, 745, 31.1, "binary", 8),
    "collab": (235868, 128, 8.2, "gauss", 64),
}


@dataclass
class Dataset:
    name: str
    x: np.ndarray            # (N, D) float32
    edge_index: np.ndarray   # (2, E) int64, undirected (both directions)
    synthetic: bool = False
    # Optional (E,) float32 per-edge weights aligned with edge_index columns
    # (duplicate raw rows coalesced by summation — SparseTensor.coalesce
    # semantics).  ogbl-collab ships co-authorship counts (reference
    # ``src/main.py:310``).
    edge_weight: np.ndarray | None = None
    # Optional OFFICIAL split shipped with the dataset (OGB's time split for
    # collab): ``{part: {'edge': (M, 2) int64, 'edge_neg': ..., 'weight': ...,
    # 'year': ...}}`` — the ``dataset.get_edge_split()`` dict the reference
    # uses for collab (reference ``src/main.py:313`` /
    # ``src/train_teacher_gnn.py:327``).  When present the drivers use it
    # instead of re-splitting with ``do_edge_split``.
    split: dict | None = None
    split_name: str = ""     # provenance, e.g. "ogb:time"

    @property
    def num_nodes(self) -> int:
        return int(self.x.shape[0])

    @property
    def num_features(self) -> int:
        return int(self.x.shape[1])


def get_dataset(root: str, name: str) -> Dataset:
    if name.startswith("synthetic:"):
        return _synthetic_by_spec(name)

    npz_path = os.path.join(root, f"{name}.npz")
    if os.path.exists(npz_path):
        from llp_tpu.data.io import unpack_dataset_npz

        with np.load(npz_path) as z:
            d = unpack_dataset_npz(z)
        return Dataset(
            name, d["x"], d["edge_index"], edge_weight=d["edge_weight"],
            split=d["split"], split_name=d["split_name"],
        )

    planetoid = _try_planetoid(root, name)
    if planetoid is not None:
        return planetoid

    gnn_bench = _try_gnn_benchmark(root, name)
    if gnn_bench is not None:
        return gnn_bench

    ogb = _try_ogb_collab(root, name)
    if ogb is not None:
        return ogb

    if name in _REAL_SHAPES:
        return _synthetic_standin(name)

    raise ValueError(
        f"unknown dataset {name!r}; expected one of {sorted(_REAL_SHAPES)}, a "
        f"synthetic: spec, or a {name}.npz under {root!r}"
    )


def _synthetic_by_spec(spec: str) -> Dataset:
    parts = spec.split(":")
    kind = parts[1]
    if kind == "sbm":
        n, k, deg = int(parts[2]), int(parts[3]), float(parts[4])
        seed = int(parts[5]) if len(parts) > 5 else 0
        dim = int(parts[6]) if len(parts) > 6 else min(max(64, n // 16), 1433)
        feat_kind = parts[7] if len(parts) > 7 else "binary"
        ei, comm = sbm_graph(n, k, deg, seed=seed)
        x = community_features(comm, dim, kind=feat_kind, seed=seed)
        return Dataset(spec, x, ei, synthetic=True)
    if kind == "ba":
        n, m = int(parts[2]), int(parts[3])
        seed = int(parts[4]) if len(parts) > 4 else 0
        ei = ba_graph(n, m, seed=seed)
        rng = np.random.default_rng(seed)
        comm = rng.integers(0, 8, size=n)
        x = community_features(comm, 128, kind="gauss", seed=seed)
        return Dataset(spec, x, ei, synthetic=True)
    raise ValueError(f"unknown synthetic spec {spec!r}")


def _synthetic_standin(name: str) -> Dataset:
    import zlib

    n, d, deg, feat_kind, k = _REAL_SHAPES[name]
    # Stable across processes (Python's hash() is salted per process, which
    # would silently pair a cached split with a *different* regenerated
    # graph in a later run).
    seed = zlib.crc32(name.encode()) % (2**31)
    ei, comm = sbm_graph(n, k, deg, homophily=0.88, seed=seed)
    x = community_features(comm, d, kind=feat_kind, seed=seed)
    return Dataset(name, x, ei, synthetic=True)


# The raw files PyG's Coauthor/Amazon classes download (reference
# ``src/utils.py:35-43`` routes these names through those classes).
_GNN_BENCHMARK_FILES = {
    "coauthor-cs": ("ms_academic_cs.npz", "CS"),
    "coauthor-physics": ("ms_academic_phy.npz", "Physics"),
    "amazon-computers": ("amazon_electronics_computers.npz", "Computers"),
    "amazon-photos": ("amazon_electronics_photo.npz", "Photo"),
}


def _symmetrize_dedup(ei: np.ndarray, n: int) -> np.ndarray:
    """Both directions, unique, self-loops removed; (2, E) int64."""
    keys = np.unique(np.concatenate([ei[0] * n + ei[1], ei[1] * n + ei[0]]))
    ei = np.stack([keys // n, keys % n])
    return ei[:, ei[0] != ei[1]]


def _coalesce_undirected(ei: np.ndarray, n: int, weight: np.ndarray):
    """Both directions, duplicates coalesced by SUMMING weights, self-loops
    removed — SparseTensor.coalesce semantics for a weighted multigraph
    (collab's raw edge list repeats a pair once per collaboration year).
    Returns ``(edge_index (2, E), weight (E,))``.
    """
    both = np.concatenate([ei, ei[::-1]], axis=1)
    w2 = np.concatenate([weight, weight]).astype(np.float64)
    keys, inv = np.unique(both[0] * n + both[1], return_inverse=True)
    w = np.bincount(inv, weights=w2, minlength=keys.shape[0])
    out = np.stack([keys // n, keys % n])
    keep = out[0] != out[1]
    return out[:, keep], w[keep].astype(np.float32)


def _try_gnn_benchmark(root: str, name: str):
    """Parse a GNN-benchmark-format .npz (CSR adjacency + CSR/dense
    attributes) — the exact raw artifact PyG downloads for the Coauthor and
    Amazon datasets, loadable here without torch_geometric."""
    if name not in _GNN_BENCHMARK_FILES:
        return None
    fname, pyg_dir = _GNN_BENCHMARK_FILES[name]
    for base in (
        root,
        os.path.join(root, name),
        os.path.join(root, name, "raw"),
        os.path.join(root, pyg_dir, "raw"),  # PyG's on-disk layout
    ):
        path = os.path.join(base, fname)
        if os.path.exists(path):
            return _parse_gnn_benchmark(path, name)
    return None


def _parse_gnn_benchmark(path: str, name: str) -> Dataset:
    import scipy.sparse as sp

    # The real GNN-benchmark files hold plain arrays only — never allow
    # pickle execution from a downloaded artifact.
    with np.load(path, allow_pickle=False) as z:
        adj = sp.csr_matrix(
            (z["adj_data"], z["adj_indices"], z["adj_indptr"]),
            shape=tuple(z["adj_shape"]),
        ).tocoo()
        if "attr_data" in z:
            x = np.asarray(
                sp.csr_matrix(
                    (z["attr_data"], z["attr_indices"], z["attr_indptr"]),
                    shape=tuple(z["attr_shape"]),
                ).todense(),
                dtype=np.float32,
            )
        else:
            x = np.asarray(z["attr_matrix"], dtype=np.float32)
    n = x.shape[0]
    ei = np.stack([adj.row.astype(np.int64), adj.col.astype(np.int64)])
    # PyG loads these graphs to_undirected with self-loops removed
    # (torch_geometric.io.npz semantics) — match that.
    return Dataset(name, x, _symmetrize_dedup(ei, n))


def _try_ogb_collab(root: str, name: str):
    """Load an untouched OGB ``ogbl_collab`` download (the reference gets
    collab via ``PygLinkPropPredDataset('ogbl-collab')``, reference
    ``src/main.py:307`` / ``src/train_teacher_gnn.py:322``).

    Parsing the gzipped CSVs (235k x 128 features, 1.2M edge rows) costs
    tens of seconds, so the parse is cached to ``<root>/{name}_parsed.npz``
    keyed by a fingerprint of the raw files (name/size/mtime) — a fresh
    download invalidates it automatically.
    """
    if name not in ("collab", "ogbl-collab"):
        return None
    for base in (
        os.path.join(root, "ogbl_collab", "raw"),
        os.path.join(root, "collab", "raw"),
        root,
    ):
        if os.path.exists(os.path.join(base, "edge.csv.gz")) and os.path.exists(
            os.path.join(base, "node-feat.csv.gz")
        ):
            fp = _raw_fingerprint(base)
            cache = os.path.join(root, f"{name}_parsed.npz")
            ds = _load_parsed_cache(cache, name, fp)
            if ds is not None:
                return ds
            ds = _parse_ogb_collab(base, name)
            _save_parsed_cache(cache, ds, fp)
            return ds
    return None


def _raw_fingerprint(raw_base: str) -> int:
    """Fingerprint of the download's raw + split files (name, size, mtime)."""
    import zlib

    h = 0
    roots = [raw_base, os.path.join(os.path.dirname(os.path.abspath(raw_base)), "split")]
    for r in roots:
        for dirpath, _, files in sorted(os.walk(r)):
            for f in sorted(files):
                p = os.path.join(dirpath, f)
                st = os.stat(p)
                h = zlib.crc32(
                    f"{os.path.relpath(p, r)}:{st.st_size}:{st.st_mtime_ns}".encode(),
                    h,
                )
    return int(h)


def _load_parsed_cache(cache: str, name: str, fp: int):
    if not os.path.exists(cache):
        return None
    from llp_tpu.data.io import unpack_dataset_npz

    try:
        with np.load(cache) as z:
            if "raw_fingerprint" not in z or int(z["raw_fingerprint"]) != fp:
                return None  # stale: the download changed
            d = unpack_dataset_npz(z)
    except Exception:
        return None  # unreadable cache: fall through to a fresh parse
    return Dataset(
        name, d["x"], d["edge_index"], edge_weight=d["edge_weight"],
        split=d["split"], split_name=d["split_name"],
    )


def _save_parsed_cache(cache: str, ds: "Dataset", fp: int) -> None:
    from llp_tpu.data.io import save_dataset_npz

    try:
        save_dataset_npz(
            cache, ds.x, ds.edge_index, edge_weight=ds.edge_weight,
            split=ds.split, split_name=ds.split_name,
            extra={"raw_fingerprint": np.asarray(fp, np.int64)},
        )
    except OSError:
        pass  # read-only dataset dir: caching is best-effort


def _parse_ogb_collab(base: str, name: str) -> Dataset:
    import gzip

    with gzip.open(os.path.join(base, "node-feat.csv.gz"), "rt") as f:
        x = np.loadtxt(f, delimiter=",", dtype=np.float32, ndmin=2)
    with gzip.open(os.path.join(base, "edge.csv.gz"), "rt") as f:
        ei = np.loadtxt(f, delimiter=",", dtype=np.int64, ndmin=2).T

    # edge_weight.csv.gz rides along in the same download (co-authorship
    # counts; reference src/main.py:310 loads it as data.edge_weight).
    w = None
    w_path = os.path.join(base, "edge_weight.csv.gz")
    if os.path.exists(w_path):
        with gzip.open(w_path, "rt") as f:
            w = np.loadtxt(f, delimiter=",", dtype=np.float32).reshape(-1)
        if w.shape[0] != ei.shape[1]:
            raise ValueError(
                f"edge_weight.csv.gz has {w.shape[0]} rows for {ei.shape[1]} edges"
            )

    if w is None:
        ei_u, w_u = _symmetrize_dedup(ei, x.shape[0]), None
    else:
        ei_u, w_u = _coalesce_undirected(ei, x.shape[0], w)

    # The official time-based split ships as split/time/{train,valid,test}.pt
    # next to raw/ — the artifacts behind the reference's
    # ``dataset.get_edge_split()`` (src/main.py:313, train_teacher_gnn.py:327).
    split, split_name = _load_ogb_split(base)
    return Dataset(
        name, x, ei_u, edge_weight=w_u, split=split, split_name=split_name
    )


def _load_ogb_split(raw_base: str):
    """Parse OGB split artifacts (torch-saved dicts of plain arrays) from the
    ``split/<scheme>/`` directory that ships beside ``raw/``.

    Returns ``(split_edge, provenance)`` in the llp_tpu layout — numpy int64
    ``edge``/``edge_neg`` of shape (M, 2), float32 ``weight``, int64 ``year``
    — or ``(None, "")`` when the download has no split directory.
    """
    candidates = []
    parent = os.path.dirname(os.path.abspath(raw_base))
    for holder in (parent, raw_base):
        split_root = os.path.join(holder, "split")
        if os.path.isdir(split_root):
            for scheme in sorted(os.listdir(split_root)):
                candidates.append((os.path.join(split_root, scheme), scheme))
    for sdir, scheme in candidates:
        paths = {p: os.path.join(sdir, f"{p}.pt") for p in ("train", "valid", "test")}
        if all(os.path.exists(p) for p in paths.values()):
            import torch

            out = {}
            for part, path in paths.items():
                blob = torch.load(path, map_location="cpu", weights_only=False)
                if not isinstance(blob, dict):
                    raise ValueError(
                        f"OGB split file {path} is not a dict "
                        f"(got {type(blob).__name__})"
                    )
                d = {}
                for k, v in blob.items():
                    a = np.asarray(
                        getattr(getattr(v, "detach", lambda: v)(), "cpu", lambda: v)()
                    )
                    if k in ("edge", "edge_neg"):
                        a = a.astype(np.int64)
                        if a.ndim != 2 or a.shape[1] != 2:
                            raise ValueError(
                                f"{path}: {k} must be (M, 2), got {a.shape}"
                            )
                    elif k == "weight":
                        a = a.astype(np.float32).reshape(-1)
                    d[k] = a
                if "edge" not in d:
                    raise ValueError(f"{path} has no 'edge' key")
                out[part] = d
            return out, f"ogb:{scheme}"
    return None, ""


def _try_planetoid(root: str, name: str):
    """Parse Planetoid raw files (ind.<ds>.{x,tx,allx,graph,test.index})."""
    folder_names = {"cora": "Cora", "citeseer": "Citeseer", "pubmed": "Pubmed"}
    if name not in folder_names:
        return None
    for base in (
        os.path.join(root, folder_names[name], "raw"),
        os.path.join(root, name, "raw"),
        root,
    ):
        if os.path.exists(os.path.join(base, f"ind.{name}.allx")):
            return _parse_planetoid(base, name)
    return None


def _parse_planetoid(base: str, name: str) -> Dataset:
    import scipy.sparse as sp

    def load_pickle(suffix):
        with open(os.path.join(base, f"ind.{name}.{suffix}"), "rb") as f:
            if sys.version_info >= (3, 0):
                return pickle.load(f, encoding="latin1")
            return pickle.load(f)

    allx = load_pickle("allx")
    tx = load_pickle("tx")
    graph = load_pickle("graph")
    test_idx = np.loadtxt(
        os.path.join(base, f"ind.{name}.test.index"), dtype=np.int64
    )
    test_idx_range = np.sort(test_idx)

    if name == "citeseer":
        # Citeseer has isolated test nodes outside the contiguous range.
        full = np.arange(test_idx_range.min(), test_idx_range.max() + 1)
        tx_ext = sp.lil_matrix((len(full), allx.shape[1]))
        tx_ext[test_idx_range - test_idx_range.min(), :] = tx
        tx = tx_ext

    x = sp.vstack([allx, tx]).tolil()
    x[test_idx, :] = x[test_idx_range, :]
    x = np.asarray(x.todense(), dtype=np.float32)

    edges = []
    for u, nbrs in graph.items():
        for v in nbrs:
            if u != v:
                edges.append((u, v))
    ei = np.array(edges, dtype=np.int64).T
    # Symmetrize + dedup.
    n = x.shape[0]
    keys = np.unique(
        np.concatenate(
            [ei[0] * n + ei[1], ei[1] * n + ei[0]]
        )
    )
    ei = np.stack([keys // n, keys % n])
    return Dataset(name, x, ei)
