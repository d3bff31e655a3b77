"""Inter-layer normalization — layer norm and (stateful) batch norm.

The reference's ``MLP`` and ``SAGE`` take ``norm_type ∈ {"none", "batch",
"layer"}`` and insert ``nn.BatchNorm1d`` / ``nn.LayerNorm`` between layers
(reference ``src/models.py:27-37,90-101``; applied before ReLU at ``:50-51,
114-115``).  No reference script ever sets the flag, so "none" is the only
exercised configuration — but the capability is part of the model API and is
reproduced here with torch-matched numerics:

* layer: per-row mean/var, eps 1e-5, learned scale/bias (``nn.LayerNorm``).
* batch: per-feature statistics, eps 1e-5; training normalizes by the
  *biased* batch variance while the running buffers accumulate the *unbiased*
  variance with momentum 0.1; eval normalizes by the running buffers
  (``nn.BatchNorm1d`` defaults).

Batch norm is the one stateful layer in an otherwise purely functional model
zoo.  The running buffers live in the params pytree (``params["norm_state"]``)
so checkpoints/optimizer trees stay shape-stable; they receive zero gradients
(they never enter the loss in train mode), making the Adam update a no-op on
them — the train step overwrites them with the aux output of the forward.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

EPS = 1e-5
MOMENTUM = 0.1  # torch BatchNorm1d default

VALID_NORM_TYPES = ("none", "layer", "batch")


def check_norm_type(norm_type: str) -> None:
    if norm_type not in VALID_NORM_TYPES:
        raise ValueError(
            f"norm_type={norm_type!r}; expected one of {VALID_NORM_TYPES}"
        )


def init_norm(norm_type: str, dim: int, *, dtype=jnp.float32) -> Tuple[dict, dict]:
    """Returns ``(params, state)`` for one inter-layer norm.

    params: {"scale", "bias"} (trainable; empty for "none").
    state:  {"mean", "var"} running buffers (batch norm only; else empty).
    """
    check_norm_type(norm_type)
    if norm_type == "none":
        return {}, {}
    params = {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}
    if norm_type == "layer":
        return params, {}
    return params, {
        "mean": jnp.zeros((dim,), jnp.float32),
        "var": jnp.ones((dim,), jnp.float32),
    }


def apply_norm(
    norm_type: str,
    params: dict,
    state: dict,
    x: jnp.ndarray,
    *,
    train: bool,
    axis: str | None = None,
    row_mask: jnp.ndarray | None = None,
) -> Tuple[jnp.ndarray, dict]:
    """Apply one norm layer; returns ``(y, new_state)``.

    ``new_state`` is the input state except for batch norm in train mode,
    where it carries the momentum-updated running buffers (stop-gradient'd).
    Batch norm expects 2-D ``(rows, dim)`` input — every encoder forward in
    this framework is a 2-D node-feature block.

    ``axis``/``row_mask`` — CROSS-DEVICE batch statistics for the sharded
    epoch programs (call inside ``shard_map``): when ``axis`` names a mesh
    axis the batch-norm moments psum over it, so every shard normalizes by
    the GLOBAL batch statistics — numerically the single-device batch norm
    over the concatenated shards.  ``row_mask`` (bool, per local row)
    excludes padding rows (halo node partitions pad N up to P·n_per) from
    the statistics.  Both are ignored by layer norm (per-row) and in eval
    mode (running buffers).
    """
    if norm_type == "none":
        return x, state
    if norm_type == "layer":
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        y = (x - mu) * jax.lax.rsqrt(var + EPS)
        return y * params["scale"] + params["bias"], state
    if norm_type != "batch":
        check_norm_type(norm_type)
    xf = x.astype(jnp.float32)
    if train and (axis is not None or row_mask is not None):
        # Distributed (and/or padded) two-pass statistics.
        w = (
            row_mask.astype(jnp.float32)[:, None]
            if row_mask is not None
            else jnp.ones((x.shape[0], 1), jnp.float32)
        )

        def _reduce(v):
            return jax.lax.psum(v, axis) if axis is not None else v

        cnt = _reduce(jnp.sum(w))
        mu = _reduce(jnp.sum(xf * w, axis=0)) / cnt
        var_b = _reduce(jnp.sum(jnp.square(xf - mu) * w, axis=0)) / cnt
        y = (xf - mu) * jax.lax.rsqrt(var_b + EPS)
        var_u = var_b * (cnt / jnp.maximum(cnt - 1.0, 1.0))
        new_state = {
            "mean": jax.lax.stop_gradient(
                (1 - MOMENTUM) * state["mean"] + MOMENTUM * mu
            ),
            "var": jax.lax.stop_gradient(
                (1 - MOMENTUM) * state["var"] + MOMENTUM * var_u
            ),
        }
    elif train:
        mu = jnp.mean(xf, axis=0)
        var_b = jnp.mean(jnp.square(xf - mu), axis=0)  # biased (normalization)
        y = (xf - mu) * jax.lax.rsqrt(var_b + EPS)
        n = x.shape[0]
        var_u = var_b * (n / max(n - 1, 1))  # unbiased (running buffer)
        new_state = {
            "mean": jax.lax.stop_gradient(
                (1 - MOMENTUM) * state["mean"] + MOMENTUM * mu
            ),
            "var": jax.lax.stop_gradient(
                (1 - MOMENTUM) * state["var"] + MOMENTUM * var_u
            ),
        }
    else:
        y = (xf - state["mean"]) * jax.lax.rsqrt(state["var"] + EPS)
        new_state = state
    y = y * params["scale"].astype(jnp.float32) + params["bias"].astype(jnp.float32)
    return y.astype(x.dtype), new_state
