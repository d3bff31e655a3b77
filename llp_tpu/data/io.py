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


def save_split_npz(path: str, split_edge: dict) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    flat = {}
    for part, d in split_edge.items():
        for k, v in d.items():
            flat[f"{part}__{k}"] = np.asarray(v)
    np.savez_compressed(path, **flat)


def load_split_npz(path: str) -> dict:
    out: dict = {}
    with np.load(path) as z:
        for key in z.files:
            part, k = key.split("__", 1)
            out.setdefault(part, {})[k] = z[key]
    return out


def save_production_split_npz(path: str, ps: ProductionSplit) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez_compressed(
        path, **{f.name: getattr(ps, f.name) for f in dataclasses.fields(ps)}
    )


def load_production_split_npz(path: str) -> ProductionSplit:
    with np.load(path) as z:
        return ProductionSplit(**{k: z[k] for k in z.files})
