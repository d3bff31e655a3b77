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
    x_agg=None,
    norm_axis=None,
    norm_row_mask=None,
    last_rows=None,
    packed_first: bool = False,
):
    """Returns ``h``; with norm_type="batch", ``(h, new_norm_state)``.

    ``x_agg``: optional precomputed layer-1 aggregation of ``x`` (see
    :func:`precompute_first_aggregation`) — exact, hoists one full-graph SpMM
    out of every training batch.

    ``norm_axis``/``norm_row_mask``: cross-device batch-norm statistics for
    sharded training (see :func:`llp_tpu.models.norms.apply_norm`).

    ``last_rows``: optional (B,) node ids — return only those ROWS of the
    final layer's output (the last projection commutes with row gathering;
    hidden layers still run full-graph).  The training loops pass the batch
    edge endpoints here: the decoder reads B rows, so the full (N, H) final
    embedding — and, more importantly, its (N, H) cotangent — never
    materializes.  At N=10M/H=128 that is ~5 GB off the step peak and an
    N·H² → B·H² MXU saving.  Exact up to float reassociation (test-gated).

    ``packed_first``: ``x`` is the packed (N, 2D) ``[x | mean_agg(x)]`` pair
    from :func:`pack_first_layer_input`; layer 1 runs as one stacked-weight
    matmul (sage family only).
    """
    if name == "sage":
        return apply_sage(
            params, graph, x, dropout=dropout, train=train, rng=rng, conv=conv,
            norm_type=norm_type, impl=impl, x_agg=x_agg,
            norm_axis=norm_axis, norm_row_mask=norm_row_mask,
            last_rows=last_rows, packed_first=packed_first,
        )
    if packed_first:
        raise ValueError("packed_first is only supported for the sage encoder")
    if name == "gcn":
        if norm_type != "none":
            raise ValueError("the GCN encoder has no inter-layer norms")
        return apply_gcn(
            params, graph, x, dropout=dropout, train=train, rng=rng, impl=impl,
            x_agg=x_agg, last_rows=last_rows,
        )
    if name == "mlp":
        if x_agg is not None:
            raise ValueError("the MLP encoder has no aggregation to hoist")
        return apply_mlp(
            params, x, dropout=dropout, train=train, rng=rng, norm_type=norm_type,
            norm_axis=norm_axis, norm_row_mask=norm_row_mask,
            last_rows=last_rows,
        )
    raise ValueError(f"unknown encoder {name!r}")


def precompute_first_aggregation(
    name: str,
    graph: Optional[Graph],
    x: jnp.ndarray,
    *,
    conv: str = "sage",
    impl: str = "xla",
):
    """Layer-1 neighbor aggregation of the (training-invariant) input features.

    GNN layer-1 aggregation commutes with the per-step layer weights
    (``agg(xW) = agg(x)W`` for linear reductions), so it can run once per
    epoch instead of once per batch — the reference recomputes the full-graph
    forward every batch (reference train_teacher_gnn.py:40-44).  Returns the
    tensor ``apply_encoder(..., x_agg=...)`` expects:

    * sage / sage_updated: ``spmm_mean(x)``
    * gcn: ``Â x`` (weighted sum + analytic self-loop term)
    * mlp: ``None`` (no aggregation)
    """
    from llp_tpu.ops.spmm import mean_aggregate

    if name == "mlp":
        return None
    if name == "gcn":
        from llp_tpu.models.gcn import _normalized_aggregate, gcn_norm_coeffs

        return _normalized_aggregate(graph, x, gcn_norm_coeffs(graph), impl=impl)
    if name == "sage":
        del conv  # both variants hoist the same (weighted-aware) mean
        return mean_aggregate(graph, x, impl=impl)
    raise ValueError(f"unknown encoder {name!r}")


def pack_first_layer_input(
    graph: Graph, x: jnp.ndarray, *, impl: str = "xla"
) -> jnp.ndarray:
    """``[x | mean_agg(x)]`` along features — the packed, epoch-invariant
    layer-1 input for ``apply_encoder(..., packed_first=True)`` (sage family).

    Why pack instead of passing ``x_agg`` separately: bf16 (N, D) arrays
    with D < 128 tile-pad to 128 HBM lanes (2x physical memory at D=64 —
    the compile-time OOM the round-5 10M-node teacher hit: x and its
    in-program hoisted aggregation cost 2.38 GB EACH padded, plus XLA kept
    a full copy of the loop-invariant x).  The packed (N, 2D) array is one
    lane-aligned argument: compute it ONCE per run (it is parameter-free),
    outside the epoch program.
    """
    from llp_tpu.ops.spmm import mean_aggregate

    agg = mean_aggregate(graph, x, impl=impl)
    return jnp.concatenate([x, agg.astype(x.dtype)], axis=1)
