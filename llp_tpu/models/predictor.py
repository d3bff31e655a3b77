"""LinkPredictor — the pairwise edge decoder.

Matches the reference ``LinkPredictor`` (reference ``src/models.py:121-150``):
Hadamard product of the two endpoint embeddings, then either an MLP head
('mlp': Linear/ReLU/dropout stack ending in a scalar) or a plain sum
('inner' = dot product); always a sigmoid on the output.

Parameters live in ``{"lins": [linear, ...]}`` (empty for 'inner').  Scoring
over node indices goes through :func:`llp_tpu.ops.edge_score.score_edges`
(the SDDMM-shaped fused path); scoring over pre-gathered embeddings uses
:func:`apply_link_predictor` directly (the student KD loops score (B, C, D)
context blocks that way, reference ``src/main.py:184-187``).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from llp_tpu.models.init import init_linear
from llp_tpu.ops.edge_score import hadamard_inner_score, hadamard_mlp_score


def init_link_predictor(
    key: jax.Array,
    mode: str,
    in_channels: int,
    hidden_channels: int,
    out_channels: int = 1,
    num_layers: int = 2,
    *,
    dtype=jnp.float32,
) -> dict:
    """Note: the reference builds the lins stack even for mode='inner' (they
    are simply unused); we skip them to keep the pytree minimal."""
    if mode == "inner":
        return {"lins": []}
    if mode != "mlp":
        raise ValueError(f"unknown predictor mode {mode!r}")
    keys = jax.random.split(key, num_layers)
    dims = [in_channels] + [hidden_channels] * (num_layers - 1) + [out_channels]
    lins = [
        init_linear(keys[i], dims[i], dims[i + 1], dtype=dtype)
        for i in range(num_layers)
    ]
    return {"lins": lins}


def apply_link_predictor(
    params: dict,
    hi: jnp.ndarray,
    hj: jnp.ndarray,
    *,
    mode: str,
    dropout: float = 0.0,
    train: bool = False,
    rng: Optional[jax.Array] = None,
    fused: bool = False,
) -> jnp.ndarray:
    """Score endpoint embedding pairs; output shape = broadcasted batch dims.

    ``fused=True`` (inference only) opts supported shapes into the Pallas
    SDDMM kernel (see :mod:`llp_tpu.ops.pallas.sddmm_kernel`)."""
    if mode == "inner":
        return hadamard_inner_score(hi, hj)
    if mode == "mlp":
        return hadamard_mlp_score(
            params["lins"],
            hi,
            hj,
            dropout=dropout if train else 0.0,
            rng=rng if train else None,
            fused=fused and not train,
        )
    raise ValueError(f"unknown predictor mode {mode!r}")
