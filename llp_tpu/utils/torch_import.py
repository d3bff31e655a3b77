"""Import reference (PyTorch) weights into llp_tpu param pytrees.

The BASELINE.md parity gate calls for per-layer activation allclose against
the reference with identical weights.  The reference saves
``{'gnn': state_dict, 'predictor': state_dict}`` pickles
(reference ``src/train_teacher_gnn.py:452``); these converters map those
state_dicts (torch Linear stores weight as (out, in)) onto our (in, out)
layout.  Works on any mapping of name -> array-like (torch tensors or numpy),
so tests can exercise it without real reference artifacts.
"""

from __future__ import annotations

from typing import Mapping

import jax.numpy as jnp
import numpy as np


def _w(value) -> jnp.ndarray:
    a = np.asarray(getattr(value, "detach", lambda: value)())
    return jnp.asarray(a.T.copy())  # torch (out, in) -> ours (in, out)


def _b(value) -> jnp.ndarray:
    a = np.asarray(getattr(value, "detach", lambda: value)())
    return jnp.asarray(a.copy())


def import_mlp(state: Mapping[str, object], num_layers: int) -> dict:
    """Reference MLP state_dict: layers.{i}.weight/.bias (models.py:6-54)."""
    layers = []
    for i in range(num_layers):
        layers.append(
            {"w": _w(state[f"layers.{i}.weight"]), "b": _b(state[f"layers.{i}.bias"])}
        )
    return {"layers": layers, "norms": []}


def import_link_predictor(state: Mapping[str, object], num_layers: int) -> dict:
    """Reference LinkPredictor state_dict: lins.{i}.weight/.bias
    (models.py:121-150)."""
    lins = []
    for i in range(num_layers):
        lins.append(
            {"w": _w(state[f"lins.{i}.weight"]), "b": _b(state[f"lins.{i}.bias"])}
        )
    return {"lins": lins}


def import_sage(state: Mapping[str, object], num_layers: int) -> dict:
    """PyG SAGEConv state_dict: convs.{i}.lin_l.weight/.bias + lin_r.weight.

    Both PyG SAGEConv and the reference's SAGEConv_updated use the same
    parameter names (lin_l has bias, lin_r does not); only the forward order
    differs (aggregate-then-linear vs linear-then-aggregate), which is a
    ``conv=`` choice at apply time, not an import-time concern.
    """
    convs = []
    for i in range(num_layers):
        convs.append(
            {
                "lin_l": {
                    "w": _w(state[f"convs.{i}.lin_l.weight"]),
                    "b": _b(state[f"convs.{i}.lin_l.bias"]),
                },
                "lin_r": {"w": _w(state[f"convs.{i}.lin_r.weight"])},
            }
        )
    return {"convs": convs}


def import_gcn(state: Mapping[str, object], num_layers: int) -> dict:
    """PyG GCNConv state_dict: convs.{i}.lin.weight (no transpose in PyG's
    dense Linear? PyG stores (out, in) like torch) + convs.{i}.bias."""
    convs = []
    for i in range(num_layers):
        convs.append(
            {
                "lin": {
                    "w": _w(state[f"convs.{i}.lin.weight"]),
                    "b": _b(state[f"convs.{i}.bias"]),
                }
            }
        )
    return {"convs": convs}


def count_layers(state: Mapping[str, object], pattern: str) -> int:
    """Number of consecutive ``pattern.format(i)`` key groups in a state dict
    (e.g. ``"convs.{}."`` for SAGE/GCN, ``"lins.{}."`` for the predictor)."""
    n = 0
    while any(key.startswith(pattern.format(n)) for key in state):
        n += 1
    return n


def import_teacher_state(
    blob: Mapping[str, Mapping[str, object]],
    *,
    encoder: str,
    num_layers: int | None = None,
    predictor_layers: int | None = None,
) -> dict:
    """Convert a loaded reference teacher blob (``{'gnn': state_dict,
    'predictor': state_dict}``) into {'encoder','predictor'} param pytrees.

    Depths default to COUNTING the state-dict keys — the reference hardcodes
    predictor depth 2 at load time (train_teacher_gnn.py:391-392, a quirk);
    pass explicit values only to import a prefix on purpose.
    """
    enc_state = blob["gnn"]
    pred_state = blob["predictor"]
    if num_layers is None:
        pattern = "layers.{}." if encoder == "mlp" else "convs.{}."
        num_layers = count_layers(enc_state, pattern)
        if num_layers == 0:
            raise ValueError(
                f"no {pattern.format('<i>')} keys in the encoder state — "
                f"wrong encoder={encoder!r}? (keys: {sorted(enc_state)[:4]}…)"
            )
    if predictor_layers is None:
        predictor_layers = count_layers(pred_state, "lins.{}.")
    if encoder == "sage":
        enc = import_sage(enc_state, num_layers)
    elif encoder == "gcn":
        enc = import_gcn(enc_state, num_layers)
    elif encoder == "mlp":
        enc = import_mlp(enc_state, num_layers)
    else:
        raise ValueError(f"unknown encoder {encoder!r}")
    return {
        "encoder": enc,
        "predictor": import_link_predictor(pred_state, predictor_layers),
    }


def import_teacher_pickle(
    path: str,
    *,
    encoder: str,
    num_layers: int | None = None,
    predictor_layers: int | None = None,
) -> dict:
    """Load a reference ../saved-models pickle into {'encoder','predictor'}.

    Requires torch (the pickle holds tensors). Depths are counted off the
    weights unless given (see :func:`import_teacher_state`).
    """
    import torch

    blob = torch.load(path, map_location="cpu")
    return import_teacher_state(
        blob, encoder=encoder, num_layers=num_layers,
        predictor_layers=predictor_layers,
    )
