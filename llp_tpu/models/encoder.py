"""Unified encoder dispatch mirroring the reference's --encoder flag
(sage | gcn | mlp, reference ``src/train_teacher_gnn.py:375-389``), with the
coauthor-physics special case (SAGEConv_updated) exposed as ``conv``.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from llp_tpu.core.graph import Graph
from llp_tpu.models.gcn import apply_gcn, init_gcn
from llp_tpu.models.mlp import apply_mlp, init_mlp
from llp_tpu.models.sage import apply_sage, init_sage


def init_encoder(
    key: jax.Array,
    name: str,
    in_channels: int,
    hidden_channels: int,
    out_channels: int,
    num_layers: int,
    *,
    norm_type: str = "none",
    dtype=jnp.float32,
) -> dict:
    if name == "sage":
        return init_sage(
            key, in_channels, hidden_channels, out_channels, num_layers,
            norm_type=norm_type, dtype=dtype,
        )
    if name == "gcn":
        # The reference GCN takes no norm_type (models.py:56-80).
        if norm_type != "none":
            raise ValueError("the GCN encoder has no inter-layer norms")
        return init_gcn(key, in_channels, hidden_channels, out_channels, num_layers, dtype=dtype)
    if name == "mlp":
        return init_mlp(
            key, num_layers, in_channels, hidden_channels, out_channels,
            norm_type=norm_type, dtype=dtype,
        )
    raise ValueError(f"unknown encoder {name!r}")


def apply_encoder(
    name: str,
    params: dict,
    graph: Optional[Graph],
    x: jnp.ndarray,
    *,
    dropout: float = 0.0,
    train: bool = False,
    rng: Optional[jax.Array] = None,
    conv: str = "sage",
    norm_type: str = "none",
    impl: str = "xla",
):
    """Returns ``h``; with norm_type="batch", ``(h, new_norm_state)``."""
    if name == "sage":
        return apply_sage(
            params, graph, x, dropout=dropout, train=train, rng=rng, conv=conv,
            norm_type=norm_type, impl=impl,
        )
    if name == "gcn":
        if norm_type != "none":
            raise ValueError("the GCN encoder has no inter-layer norms")
        return apply_gcn(params, graph, x, dropout=dropout, train=train, rng=rng, impl=impl)
    if name == "mlp":
        return apply_mlp(
            params, x, dropout=dropout, train=train, rng=rng, norm_type=norm_type
        )
    raise ValueError(f"unknown encoder {name!r}")
