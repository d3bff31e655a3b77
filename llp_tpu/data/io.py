"""On-disk interchange for datasets and splits (npz, no pickles on the load
path for foreign data).

Replaces the reference's pickle caches (``../data/{ds}.pkl`` at
``src/train_teacher_gnn.py:310-314`` and ``../data/{ds}_production.pkl`` at
``:347-366``) with flat npz archives keyed the same way, so teacher and
student runs share identical splits.
"""

from __future__ import annotations

import dataclasses
import os

import numpy as np

from llp_tpu.data.splits import ProductionSplit


def save_dataset_npz(path: str, x: np.ndarray, edge_index: np.ndarray) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez_compressed(path, x=x.astype(np.float32), edge_index=edge_index.astype(np.int64))


def dataset_fingerprint(x, edge_index) -> int:
    """Cheap content hash of a dataset (features + edges).

    Stored inside split caches so a cache built from one graph is never
    silently applied to another (e.g. a stand-in's split surviving after a
    real ``{name}.npz`` export is dropped into the dataset dir).
    """
    import zlib

    e = np.ascontiguousarray(np.asarray(edge_index, np.int64))
    h = zlib.crc32(e.tobytes())
    xa = np.ascontiguousarray(np.asarray(x, np.float32))
    h = zlib.crc32(xa.tobytes(), h)
    h = zlib.crc32(np.asarray(list(xa.shape) + list(e.shape), np.int64).tobytes(), h)
    return int(h)


_FP_KEY = "__dataset_fingerprint__"


def save_split_npz(path: str, split_edge: dict, *, fingerprint: int | None = None) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    flat = {}
    for part, d in split_edge.items():
        for k, v in d.items():
            flat[f"{part}__{k}"] = np.asarray(v)
    if fingerprint is not None:
        flat[_FP_KEY] = np.asarray(fingerprint, np.int64)
    np.savez_compressed(path, **flat)


def load_split_npz(path: str, *, expect_fingerprint: int | None = None):
    """Load a cached split; returns None (stale) when a fingerprint is
    expected and the cache is missing it or carries a different one."""
    out: dict = {}
    fp = None
    with np.load(path) as z:
        for key in z.files:
            if key == _FP_KEY:
                fp = int(z[key])
                continue
            part, k = key.split("__", 1)
            out.setdefault(part, {})[k] = z[key]
    if expect_fingerprint is not None and fp != expect_fingerprint:
        return None
    return out


def save_production_split_npz(
    path: str, ps: ProductionSplit, *, fingerprint: int | None = None
) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    arrays = {f.name: getattr(ps, f.name) for f in dataclasses.fields(ps)}
    if fingerprint is not None:
        arrays[_FP_KEY] = np.asarray(fingerprint, np.int64)
    np.savez_compressed(path, **arrays)


def load_production_split_npz(path: str, *, expect_fingerprint: int | None = None):
    """Load a cached production split; None when stale (see load_split_npz)."""
    fp = None
    with np.load(path) as z:
        arrays = {}
        for k in z.files:
            if k == _FP_KEY:
                fp = int(z[k])
                continue
            arrays[k] = z[k]
    if expect_fingerprint is not None and fp != expect_fingerprint:
        return None
    return ProductionSplit(**arrays)
