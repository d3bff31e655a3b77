"""Import the reference's on-disk pickle artifacts into llp_tpu formats.

The reference framework persists four artifact kinds (SURVEY §1 contract):

* ``../data/{ds}.pkl``            — pickled transductive ``split_edge`` dict
  (reference ``src/train_teacher_gnn.py:310-314``): plain torch tensors.
* ``../data/{ds}_production.pkl`` — 6-tuple ``(training_data, val_data,
  inference_data, data, test_edge_bundle, negative_samples)`` (reference
  ``src/generate_production_split.py:158`` / ``src/main.py:338``) whose first
  four elements are PyG ``Data`` objects.
* ``../saved-models/…`` / ``../saved-features/…`` — teacher state-dicts and
  best-val node embeddings (``src/train_teacher_gnn.py:446-452``).

A user switching from the reference brings these files along; this module
converts each into the matching llp_tpu artifact (npz split caches consumed by
``train/loop.py``, teacher checkpoints consumed by ``run_student``) so
existing experiments continue on identical data without re-splitting.

The production pickle references ``torch_geometric`` classes that are not
installed here.  ``load_production_split_pickle`` therefore unpickles through
a *shim* unpickler: any class living under ``torch_geometric.*`` is replaced
by a permissive stand-in that absorbs the pickled state into ``__dict__``
(PyG ``Data``/``BaseStorage`` pickle as plain attribute dicts with the tensor
payload under ``_store._mapping``), and attribute access walks that layout.
Tensor payloads still load through torch's own zipfile/storage machinery.
"""

from __future__ import annotations

import io
import pickle
import types
from typing import Dict, Tuple

import numpy as np

from llp_tpu.data.splits import ProductionSplit

__all__ = [
    "load_transductive_split_pickle",
    "load_production_split_pickle",
    "load_features_pickle",
    "import_teacher_checkpoint",
]


def _to_np(v) -> np.ndarray:
    v = getattr(v, "detach", lambda: v)()
    v = getattr(v, "cpu", lambda: v)()
    return np.asarray(v)


def _edges_2xM(v) -> np.ndarray:
    a = _to_np(v).astype(np.int64)
    if a.ndim != 2:
        raise ValueError(f"edge tensor must be 2-D, got shape {a.shape}")
    return a if a.shape[0] == 2 else a.T


# ---------------------------------------------------------------- transductive


def load_transductive_split_pickle(path: str) -> Dict[str, Dict[str, np.ndarray]]:
    """Reference ``../data/{ds}.pkl`` → llp_tpu ``split_edge`` dict.

    The pickle is ``{'train'|'valid'|'test': {'edge'|'edge_neg': (M, 2)
    tensor}}`` (reference ``src/utils.py:97-105``); we keep the same layout as
    (M, 2) int64 numpy arrays — exactly what ``data/io.py::save_split_npz``
    serializes.
    """
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    out: Dict[str, Dict[str, np.ndarray]] = {}
    for part in ("train", "valid", "test"):
        if part not in blob:
            raise KeyError(f"split pickle missing part {part!r}")
        # Convert only the documented edge keys; companion metadata some
        # pipelines stash alongside (e.g. collab-style 1-D 'weight'/'year')
        # is not part of the split contract and is skipped, not fatal.
        out[part] = {
            k: _edges_2xM(v).T.copy()
            for k, v in blob[part].items()
            if k in ("edge", "edge_neg")
        }
        if "edge" not in out[part]:
            raise KeyError(f"split pickle part {part!r} has no 'edge' key")
    return out


# ------------------------------------------------------------------ production


class _Shim:
    """Stand-in for any unavailable torch_geometric class.

    Accepts any constructor signature and absorbs pickled state into
    ``__dict__`` — enough to reconstruct PyG ``Data``/``BaseStorage``
    instances as inert attribute bags.
    """

    def __init__(self, *args, **kwargs):
        if args:
            self.__dict__["_init_args"] = args
        self.__dict__.update(kwargs)

    def __setstate__(self, state):
        if isinstance(state, dict):
            self.__dict__.update(state)
        elif isinstance(state, tuple) and len(state) == 2:
            d, slots = state
            if isinstance(d, dict):
                self.__dict__.update(d)
            if isinstance(slots, dict):
                self.__dict__.update(slots)
        else:
            self.__dict__["_state"] = state


_shim_cache: Dict[Tuple[str, str], type] = {}


def _shim_class(module: str, name: str) -> type:
    key = (module, name)
    if key not in _shim_cache:
        _shim_cache[key] = type(name, (_Shim,), {"__module__": module})
    return _shim_cache[key]


class _ShimUnpickler(pickle.Unpickler):
    def find_class(self, module, name):
        if module == "torch_geometric" or module.startswith("torch_geometric."):
            return _shim_class(module, name)
        return super().find_class(module, name)


def _shim_pickle_module() -> types.SimpleNamespace:
    """A pickle-module facade for ``torch.load(pickle_module=...)`` whose
    Unpickler shims torch_geometric classes (tensors still load through
    torch's persistent-id storage machinery)."""

    def _load(file, **kw):
        kw.pop("encoding", None)
        return _ShimUnpickler(file).load()

    return types.SimpleNamespace(
        Unpickler=_ShimUnpickler, load=_load, __name__="llp_tpu_shim_pickle"
    )


def _attr(obj, name: str):
    """Read an attribute off a shimmed PyG ``Data`` object.

    PyG ``Data`` pickles as ``{'_store': GlobalStorage}`` with the tensor
    payload in ``GlobalStorage._mapping`` (plus bookkeeping keys); older
    layouts kept tensors directly in ``__dict__``.
    """
    d = getattr(obj, "__dict__", None)
    if d is None:
        if isinstance(obj, dict) and name in obj:
            return obj[name]
        raise AttributeError(name)
    if name in d:
        return d[name]
    store = d.get("_store")
    if store is not None:
        sd = getattr(store, "__dict__", {})
        if name in sd:
            return sd[name]
        mapping = sd.get("_mapping", {})
        if name in mapping:
            return mapping[name]
    raise AttributeError(
        f"{name!r} not found on imported object (keys: {sorted(d)})"
    )


def load_production_split_pickle(
    path: str,
) -> Tuple[ProductionSplit, np.ndarray, np.ndarray]:
    """Reference ``../data/{ds}_production.pkl`` → ``(ProductionSplit, x,
    edge_index)``.

    The trailing ``(x, edge_index)`` pair is the 4th tuple element — the full
    original graph — returned so callers can also materialize the dataset
    itself (``data/io.py::save_dataset_npz``) and fingerprint the split cache
    against it.

    Field mapping follows the reference consumers (``src/main.py:338-348``,
    ``src/train_teacher_gnn.py:157-268``): training graph = ``training_data
    .{x,edge_index}``; val labels split out of ``val_data.edge_label_index``
    by ``edge_label``; test bundle order old-old/old-new/new-new/merged.

    ``old_nodes``/``new_nodes`` are NOT stored in the reference artifact (its
    pipeline discards them after relabeling); they are returned empty and are
    only used for CLI stats display, never by training or evaluation.
    """
    import torch

    blob = torch.load(
        path,
        map_location="cpu",
        pickle_module=_shim_pickle_module(),
        weights_only=False,
    )
    if not isinstance(blob, (tuple, list)) or len(blob) != 6:
        raise ValueError(
            f"expected the reference 6-tuple production artifact, got "
            f"{type(blob).__name__} of length "
            f"{len(blob) if isinstance(blob, (tuple, list)) else 'n/a'}"
        )
    training_data, val_data, inference_data, data, bundle, negatives = blob

    training_x = _to_np(_attr(training_data, "x")).astype(np.float32)
    val_edges = _edges_2xM(_attr(val_data, "edge_label_index"))
    val_label = _to_np(_attr(val_data, "edge_label")).astype(bool).reshape(-1)
    if val_label.size != val_edges.shape[1]:
        raise ValueError("edge_label / edge_label_index length mismatch")

    ps = ProductionSplit(
        training_x=training_x,
        training_edge_index=_edges_2xM(_attr(training_data, "edge_index")),
        val_x=_to_np(_attr(val_data, "x")).astype(np.float32),
        val_edge_index=_edges_2xM(_attr(val_data, "edge_index")),
        val_pos=val_edges[:, val_label].copy(),
        val_neg=val_edges[:, ~val_label].copy(),
        inference_x=_to_np(_attr(inference_data, "x")).astype(np.float32),
        inference_edge_index=_edges_2xM(_attr(inference_data, "edge_index")),
        test_old_old=_edges_2xM(bundle[0]),
        test_old_new=_edges_2xM(bundle[1]),
        test_new_new=_edges_2xM(bundle[2]),
        test_merged=_edges_2xM(bundle[3]),
        negative_samples=_edges_2xM(negatives),
        old_nodes=np.zeros((0,), np.int64),
        new_nodes=np.zeros((0,), np.int64),
    )
    full_x = _to_np(_attr(data, "x")).astype(np.float32)
    full_ei = _edges_2xM(_attr(data, "edge_index"))
    return ps, full_x, full_ei


# ------------------------------------------------------- teacher checkpoints


def load_features_pickle(path: str) -> np.ndarray:
    """Reference ``../saved-features/{…}.pkl`` → (N, H) float32 embeddings
    (saved as ``{'features': h}``, ``src/train_teacher_gnn.py:451``)."""
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    return _to_np(blob["features"]).astype(np.float32)


def import_teacher_checkpoint(
    models_pkl: str,
    features_pkl: str,
    out_path: str,
    *,
    encoder: str,
    num_layers: int | None = None,
    conv: str | None = None,
    dataset: str = "",
    setting: str = "transductive",
) -> dict:
    """Convert reference teacher artifacts into an llp_tpu teacher checkpoint.

    Joins ``../saved-models`` (state dicts → param pytrees, via
    ``utils/torch_import.py``) and ``../saved-features`` into the
    ``{'params', 'features'}`` checkpoint ``run_student`` loads
    (``train/loop.py``), with real architecture metadata read off the
    imported weights — dims, encoder depth, AND predictor depth (fixing the
    reference's hardcoded 256/256/2 quirk, ``src/main.py:358``; pass
    ``num_layers`` only to import a prefix on purpose).

    ``conv`` is the SAGE variant for GNN re-encoding ('sage' |
    'sage_updated'); default follows the reference's dataset rule —
    coauthor-physics trains linear-then-aggregate
    (``train_teacher_gnn.py:375-383``), everything else aggregate-then-linear.
    """
    import torch

    from llp_tpu.utils.checkpoint import save_checkpoint
    from llp_tpu.utils.torch_import import import_teacher_state

    blob = torch.load(models_pkl, map_location="cpu", weights_only=False)
    params = import_teacher_state(blob, encoder=encoder, num_layers=num_layers)
    if conv is None:
        conv = (
            "sage_updated"
            if encoder == "sage" and dataset == "coauthor-physics"
            else encoder
        )

    features = load_features_pickle(features_pkl)
    hidden = int(params["predictor"]["lins"][0]["w"].shape[0])
    key = "layers" if encoder == "mlp" else "convs"
    meta = dict(
        encoder=encoder,
        conv=conv,
        predictor="mlp",
        hidden_channels=hidden,
        num_layers=len(params["encoder"][key]),
        predictor_layers=len(params["predictor"]["lins"]),
        dataset=dataset,
        setting=setting,
        val=0.0,
    )
    save_checkpoint(out_path, {"params": params, "features": features}, meta=meta)
    return meta
