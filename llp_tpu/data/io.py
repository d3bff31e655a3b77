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


def save_dataset_npz(
    path: str,
    x: np.ndarray,
    edge_index: np.ndarray,
    *,
    edge_weight: np.ndarray | None = None,
    split: dict | None = None,
    split_name: str = "",
    extra: dict | None = None,
) -> None:
    """Write the dataset interchange file.

    Beyond the core ``x``/``edge_index`` arrays, the format optionally
    carries per-edge weights and an OFFICIAL split (``{part: {'edge': ...,
    'edge_neg': ..., ...}}`` — e.g. OGB's shipped time split), so an npz
    export of ogbl-collab preserves the reference's evaluation protocol
    instead of silently falling back to a random re-split.
    """
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    arrays = {
        "x": x.astype(np.float32),
        "edge_index": edge_index.astype(np.int64),
    }
    if edge_weight is not None:
        arrays["edge_weight"] = np.asarray(edge_weight, np.float32)
    if split is not None:
        arrays["split_name"] = np.asarray(split_name or "official")
        for part, d in split.items():
            for k, v in d.items():
                arrays[f"split__{part}__{k}"] = np.asarray(v)
    if extra:
        arrays.update({k: np.asarray(v) for k, v in extra.items()})
    np.savez_compressed(path, **arrays)


def unpack_dataset_npz(z) -> dict:
    """Parse an open dataset-npz mapping into ``{x, edge_index, edge_weight,
    split, split_name}`` (the optional keys default to None/"")."""
    out = {
        "x": z["x"].astype(np.float32),
        "edge_index": z["edge_index"].astype(np.int64),
        "edge_weight": None,
        "split": None,
        "split_name": "",
    }
    if "edge_weight" in z:
        out["edge_weight"] = z["edge_weight"].astype(np.float32)
    split: dict = {}
    for key in z.files if hasattr(z, "files") else z.keys():
        if key.startswith("split__"):
            _, part, k = key.split("__", 2)
            split.setdefault(part, {})[k] = z[key]
    if split:
        out["split"] = split
        out["split_name"] = str(z["split_name"]) if "split_name" in z else "official"
    return out


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
