"""MLP encoder — the LLP student model and supervised-MLP baseline.

Semantics match the reference ``MLP`` (reference ``src/models.py:6-54``):
num_layers Linear stack; between layers (never after the last): optional norm,
ReLU, dropout.  Default norm_type is "none" (the only configuration any
reference script uses); "layer" is supported, "batch" is deferred (it would
need running-statistics state threading; no reference run enables it).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from llp_tpu.models.init import apply_linear, init_linear


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
    if norm_type not in ("none", "layer"):
        raise NotImplementedError(f"norm_type={norm_type!r} not supported yet")
    keys = jax.random.split(key, max(num_layers, 1))
    layers = []
    norms = []
    if num_layers == 1:
        layers.append(init_linear(keys[0], input_dim, output_dim, dtype=dtype))
    else:
        dims = [input_dim] + [hidden_dim] * (num_layers - 1) + [output_dim]
        for i in range(num_layers):
            layers.append(init_linear(keys[i], dims[i], dims[i + 1], dtype=dtype))
            if i < num_layers - 1 and norm_type == "layer":
                norms.append(
                    {
                        "scale": jnp.ones((dims[i + 1],), dtype),
                        "bias": jnp.zeros((dims[i + 1],), dtype),
                    }
                )
    return {"layers": layers, "norms": norms}


def _layer_norm(p: dict, x: jnp.ndarray) -> jnp.ndarray:
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    y = (x - mu) * jax.lax.rsqrt(var + 1e-5)
    return y * p["scale"] + p["bias"]


def apply_mlp(
    params: dict,
    x: jnp.ndarray,
    *,
    dropout: float = 0.0,
    train: bool = False,
    rng: Optional[jax.Array] = None,
    norm_type: str = "none",
) -> jnp.ndarray:
    """Forward pass. ``rng`` is required when train=True and dropout>0."""
    h = x
    layers = params["layers"]
    n = len(layers)
    for i, layer in enumerate(layers):
        h = apply_linear(layer, h)
        if i != n - 1:
            if norm_type == "layer":
                h = _layer_norm(params["norms"][i], h)
            h = jax.nn.relu(h)
            if train and dropout > 0.0:
                if rng is None:
                    raise ValueError("train-mode dropout requires an rng key")
                keep = 1.0 - dropout
                mask = jax.random.bernoulli(jax.random.fold_in(rng, i), keep, h.shape)
                h = jnp.where(mask, h / keep, jnp.zeros_like(h))
    return h
