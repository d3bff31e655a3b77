"""MLP encoder — the LLP student model and supervised-MLP baseline.

Semantics match the reference ``MLP`` (reference ``src/models.py:6-54``):
num_layers Linear stack; between layers (never after the last): optional norm,
ReLU, dropout.  Default norm_type is "none" (the only configuration any
reference script uses); "layer" and "batch" follow the reference's
``nn.LayerNorm`` / ``nn.BatchNorm1d`` numerics (see
:mod:`llp_tpu.models.norms`).  With ``norm_type="batch"`` the apply function
returns ``(h, new_norm_state)`` — batch norm is stateful; all other modes
return just ``h``.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from llp_tpu.ops.rng import inverted_dropout
from llp_tpu.models.init import apply_linear, init_linear
from llp_tpu.models.norms import apply_norm, check_norm_type, init_norm


def init_mlp(
    key: jax.Array,
    num_layers: int,
    input_dim: int,
    hidden_dim: int,
    output_dim: int,
    *,
    norm_type: str = "none",
    dtype=jnp.float32,
) -> dict:
    check_norm_type(norm_type)
    keys = jax.random.split(key, max(num_layers, 1))
    layers = []
    norms = []
    norm_state = []
    if num_layers == 1:
        layers.append(init_linear(keys[0], input_dim, output_dim, dtype=dtype))
    else:
        dims = [input_dim] + [hidden_dim] * (num_layers - 1) + [output_dim]
        for i in range(num_layers):
            layers.append(init_linear(keys[i], dims[i], dims[i + 1], dtype=dtype))
            if i < num_layers - 1 and norm_type != "none":
                np_, ns = init_norm(norm_type, dims[i + 1], dtype=dtype)
                norms.append(np_)
                norm_state.append(ns)
    params = {"layers": layers, "norms": norms}
    if norm_type == "batch":
        params["norm_state"] = norm_state
    return params


def apply_mlp(
    params: dict,
    x: jnp.ndarray,
    *,
    dropout: float = 0.0,
    train: bool = False,
    rng: Optional[jax.Array] = None,
    norm_type: str = "none",
    norm_axis: Optional[str] = None,
    norm_row_mask: Optional[jnp.ndarray] = None,
    last_rows: Optional[jnp.ndarray] = None,
):
    """Forward pass. ``rng`` is required when train=True and dropout>0.

    Returns ``h``; for norm_type="batch" returns ``(h, new_norm_state)``.
    ``norm_axis``/``norm_row_mask`` make batch-norm statistics global across
    a mesh axis inside shard_map (see :func:`llp_tpu.models.norms.apply_norm`).
    ``last_rows``: optional (B,) row ids — gather BEFORE the final linear
    (projection commutes with row gathering), so only those output rows are
    computed.
    """
    h = x
    layers = params["layers"]
    n = len(layers)
    new_state = []
    for i, layer in enumerate(layers):
        if last_rows is not None and i == n - 1:
            h = jnp.take(h, last_rows, axis=0)
        h = apply_linear(layer, h)
        if i != n - 1:
            if norm_type != "none":
                st = params["norm_state"][i] if norm_type == "batch" else {}
                h, st = apply_norm(
                    norm_type, params["norms"][i], st, h, train=train,
                    axis=norm_axis, row_mask=norm_row_mask,
                )
                new_state.append(st)
            h = jax.nn.relu(h)
            if train and dropout > 0.0:
                if rng is None:
                    raise ValueError("train-mode dropout requires an rng key")
                h = inverted_dropout(h, dropout, jax.random.fold_in(rng, i))
    if norm_type == "batch":
        return h, new_state
    return h
