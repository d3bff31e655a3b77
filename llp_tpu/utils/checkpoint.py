"""Checkpointing: params pytrees ⇄ flat npz + JSON metadata.

Replaces the reference's pickle artifact contract (``../saved-models/…`` and
``../saved-features/…``, reference ``src/train_teacher_gnn.py:446-452`` /
``src/main.py:356-363``) with npz archives.  Unlike the reference — which
hardcodes the teacher's dims when the student reloads it (main.py:358, a
[QUIRK] that breaks non-256-hidden teachers) — the metadata dict carries
encoder/predictor architecture so loads are self-describing.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


_EMPTY_LIST = "__empty_list__"
_EMPTY_DICT = "__empty_dict__"


def _flatten(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    out = {}
    if isinstance(tree, dict):
        if not tree:
            out[f"{prefix}{_EMPTY_DICT}"] = np.zeros((0,))
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        if not tree:
            out[f"{prefix}{_EMPTY_LIST}"] = np.zeros((0,))
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}/"))
    else:
        out[prefix.rstrip("/")] = np.asarray(tree)
    return out


def _unflatten(flat: Dict[str, np.ndarray]) -> Any:
    # Rebuild nested dict/list structure from slash-separated keys.
    root: dict = {}
    for key, value in flat.items():
        parts = key.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value

    def normalize(node):
        if not isinstance(node, dict):
            return jnp.asarray(node)
        keys = list(node.keys())
        if keys == [_EMPTY_LIST]:
            return []
        if keys == [_EMPTY_DICT]:
            return {}
        if keys and all(k.isdigit() for k in keys):
            return [normalize(node[str(i)]) for i in range(len(keys))]
        return {k: normalize(v) for k, v in node.items()}

    return normalize(root)


def save_checkpoint(path: str, params: Any, meta: Dict[str, Any] | None = None) -> None:
    """Write ``<path>.npz`` (arrays) + ``<path>.json`` (metadata)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    flat = _flatten(jax.device_get(params))
    # Uncompressed: checkpoints save on the training path (every validation
    # improvement, reference semantics) and zip-compressing ~100MB of fp32
    # noise costs ~1s/epoch on this host.
    np.savez(path + ".npz", **flat)
    with open(path + ".json", "w") as f:
        json.dump(meta or {}, f, indent=2)


def load_checkpoint(path: str) -> Tuple[Any, Dict[str, Any]]:
    with np.load(path + ".npz") as z:
        flat = {k: z[k] for k in z.files}
    params = _unflatten(flat)
    meta = {}
    if os.path.exists(path + ".json"):
        with open(path + ".json") as f:
            meta = json.load(f)
    return params, meta
