"""GraphSAGE encoder with both conv variants the reference uses.

* ``apply_sage_conv`` — PyG SAGEConv semantics (aggregate-then-linear):
  ``out = W_l · mean_{j∈N(i)} x_j + b + W_r · x_i``.
* ``apply_sage_conv_updated`` — the reference's memory-efficient variant
  (reference ``src/sageconv_updated.py:65-81``), linear-then-aggregate:
  ``out = mean_{j∈N(i)} (W_l · x_j + b) + W_r · x_i``.  Mathematically equal
  on nodes with neighbors; on isolated nodes the bias contribution differs
  (0 vs b) exactly as in the reference pair.  Used for coauthor-physics
  (reference ``src/train_teacher_gnn.py:375-383``) where D >> H makes the
  pre-aggregation projection cheaper: SpMM width drops from D to H.

The SAGE stack (reference ``src/models.py:82-119``): convs with optional norm
+ ReLU + dropout between, nothing after the last conv.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from llp_tpu.core.graph import Graph
from llp_tpu.ops.rng import inverted_dropout
from llp_tpu.models.init import apply_linear, init_linear
from llp_tpu.models.norms import apply_norm, check_norm_type, init_norm
from llp_tpu.ops.spmm import mean_aggregate, weighted_in_degree


def init_sage_conv(key: jax.Array, din: int, dout: int, *, dtype=jnp.float32) -> dict:
    kl, kr = jax.random.split(key)
    return {
        "lin_l": init_linear(kl, din, dout, bias=True, dtype=dtype),
        "lin_r": init_linear(kr, din, dout, bias=False, dtype=dtype),
    }


def apply_sage_conv(
    params: dict,
    graph: Graph,
    x: jnp.ndarray,
    *,
    impl: str = "xla",
    x_agg: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """PyG SAGEConv: aggregate neighbors (mean), then project.

    ``x_agg`` — optional precomputed ``spmm_mean(x)``.  Layer-1 aggregation
    of the (fixed) input features is training-invariant, so the train loops
    hoist it out of the batch loop (the reference recomputes the full-graph
    aggregation every batch, train_teacher_gnn.py:40).
    """
    agg = mean_aggregate(graph, x, impl=impl) if x_agg is None else x_agg
    return apply_linear(params["lin_l"], agg) + apply_linear(params["lin_r"], x)


def apply_sage_conv_updated(
    params: dict,
    graph: Graph,
    x: jnp.ndarray,
    *,
    impl: str = "xla",
    x_agg: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Reference SAGEConv_updated: project, then aggregate (mean).

    With a precomputed ``x_agg = spmm_mean(x)``, linearity moves the
    (per-step) projection after the (hoisted) aggregation:
    ``mean_j(W x_j + b) = W mean_j(x_j) + b·1{deg>0}`` — isolated rows drop
    the bias exactly like the direct order (torch_sparse mean yields 0 rows
    there).
    """
    if x_agg is not None:
        w = params["lin_l"]["w"]
        out = jnp.dot(x_agg, w, preferred_element_type=jnp.float32).astype(x.dtype)
        if getattr(graph, "edge_weight", None) is None:
            has_nbr = (graph.in_degree > 0).astype(x.dtype)[:, None]
        else:
            # Weighted mean zeroes rows whose incident weights sum to 0, so
            # the bias must vanish exactly there.
            has_nbr = (weighted_in_degree(graph) > 0).astype(x.dtype)[:, None]
        out = out + params["lin_l"]["b"].astype(x.dtype) * has_nbr
    else:
        out = apply_linear(params["lin_l"], x)
        out = mean_aggregate(graph, out, impl=impl)
    return out + apply_linear(params["lin_r"], x)


_CONV_APPLY = {
    "sage": apply_sage_conv,
    "sage_updated": apply_sage_conv_updated,
}


def _has_nbr(graph: Graph, dtype) -> jnp.ndarray:
    """(N,) 1.0 where the (possibly weighted) in-degree is positive — the
    rows whose hoisted bias survives (torch_sparse mean yields 0 rows on
    isolated nodes, so the bias must vanish exactly there)."""
    if getattr(graph, "edge_weight", None) is None:
        return (graph.in_degree > 0).astype(dtype)
    return (weighted_in_degree(graph) > 0).astype(dtype)


def _stacked_first_weights(params: dict, dtype) -> jnp.ndarray:
    """[[W_r], [W_l]] — the contraction matrix for a PACKED layer-1 input
    ``xp = [x | mean_agg(x)]``:  ``xp @ [[W_r],[W_l]] = x W_r + agg W_l``."""
    return jnp.concatenate(
        [params["lin_r"]["w"].astype(dtype), params["lin_l"]["w"].astype(dtype)],
        axis=0,
    )


def _apply_packed_first(
    conv: str, params: dict, graph: Graph, xp: jnp.ndarray
) -> jnp.ndarray:
    """Layer-1 on the packed epoch-invariant pair ``xp = [x | mean_agg(x)]``
    (N, 2D): ONE lane-aligned matmul with the stacked weights replaces the
    two D-wide matmuls.

    Exact up to float reassociation vs the two-matmul order (one fused 2D
    contraction instead of two D contractions + add).  The point is HBM
    layout at huge N: bf16 (N, D) arrays with D < 128 tile-pad to 128 lanes
    (2x physical HBM at D=64 — the round-3 ``local_ids`` bug class), so
    keeping x and x_agg as separate epoch arguments costs 2x2 unpadded
    sizes while the packed (N, 2D) array costs exactly one.
    """
    out = jnp.dot(xp, _stacked_first_weights(params, xp.dtype),
                  preferred_element_type=jnp.float32)
    b = params["lin_l"]["b"].astype(jnp.float32)
    if conv == "sage":
        out = out + b
    else:  # sage_updated: the hoisted bias drops on isolated rows
        out = out + b * _has_nbr(graph, jnp.float32)[:, None]
    return out.astype(xp.dtype)


def _packed_first_rows(
    conv: str, params: dict, graph: Graph, xp: jnp.ndarray, idx: jnp.ndarray
) -> jnp.ndarray:
    """``_apply_packed_first(...)[idx]`` without the (N, dout) output —
    the single-layer ``last_rows`` counterpart (projection commutes with
    row gathering)."""
    rows = jnp.take(xp, idx, axis=0)
    out = jnp.dot(rows, _stacked_first_weights(params, xp.dtype),
                  preferred_element_type=jnp.float32)
    b = params["lin_l"]["b"].astype(jnp.float32)
    if conv == "sage":
        out = out + b
    else:
        out = out + b * jnp.take(_has_nbr(graph, jnp.float32), idx)[:, None]
    return out.astype(xp.dtype)


def _sage_conv_rows(
    conv: str,
    params: dict,
    graph: Graph,
    h: jnp.ndarray,
    idx: jnp.ndarray,
    *,
    impl: str = "xla",
    x_agg: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """The conv's output ROWS ``conv(h)[idx]`` without materializing the
    full (N, dout) output.

    The final encoder layer feeds only the decoder's gathered edge rows
    during training, and a linear projection commutes with row gathering —
    so the last layer projects (B, din) gathered rows instead of all N
    (N·H² → B·H² MXU FLOPs, and the (N, H) output + its cotangent never
    exist; at N=10M/H=128 that is 2×2.5 GB off the step's peak).  The
    aggregation itself still runs full-graph (every row may be a sender).
    For 'sage_updated' the projection moves after the aggregation by the
    same linearity identity the layer-1 hoist uses (bias ⊙ 1{deg>0}).
    """
    agg = mean_aggregate(graph, h, impl=impl) if x_agg is None else x_agg
    rows_agg = jnp.take(agg, idx, axis=0)
    rows_h = jnp.take(h, idx, axis=0)
    if conv == "sage":
        return apply_linear(params["lin_l"], rows_agg) + apply_linear(
            params["lin_r"], rows_h
        )
    # sage_updated: mean_j(W x_j + b) == W mean_j(x_j) + b·1{deg>0}
    w = params["lin_l"]["w"]
    out = jnp.dot(rows_agg, w, preferred_element_type=jnp.float32).astype(
        h.dtype
    )
    if getattr(graph, "edge_weight", None) is None:
        has_nbr = (graph.in_degree > 0).astype(h.dtype)
    else:
        has_nbr = (weighted_in_degree(graph) > 0).astype(h.dtype)
    out = out + params["lin_l"]["b"].astype(h.dtype) * jnp.take(
        has_nbr, idx
    )[:, None]
    return out + apply_linear(params["lin_r"], rows_h)


def init_sage(
    key: jax.Array,
    in_channels: int,
    hidden_channels: int,
    out_channels: int,
    num_layers: int,
    *,
    norm_type: str = "none",
    dtype=jnp.float32,
) -> dict:
    check_norm_type(norm_type)
    keys = jax.random.split(key, num_layers)
    dims = [in_channels] + [hidden_channels] * (num_layers - 1) + [out_channels]
    convs = [
        init_sage_conv(keys[i], dims[i], dims[i + 1], dtype=dtype)
        for i in range(num_layers)
    ]
    norms, norm_state = [], []
    if norm_type != "none":
        for i in range(num_layers - 1):
            np_, ns = init_norm(norm_type, dims[i + 1], dtype=dtype)
            norms.append(np_)
            norm_state.append(ns)
    params = {"convs": convs, "norms": norms}
    if norm_type == "batch":
        params["norm_state"] = norm_state
    return params


def apply_sage(
    params: dict,
    graph: Graph,
    x: jnp.ndarray,
    *,
    dropout: float = 0.0,
    train: bool = False,
    rng: Optional[jax.Array] = None,
    conv: str = "sage",
    norm_type: str = "none",
    impl: str = "xla",
    x_agg: Optional[jnp.ndarray] = None,
    norm_axis: Optional[str] = None,
    norm_row_mask: Optional[jnp.ndarray] = None,
    last_rows: Optional[jnp.ndarray] = None,
    packed_first: bool = False,
) -> jnp.ndarray:
    """``last_rows``: optional (B,) node ids — return only those ROWS of the
    final conv's output (see :func:`_sage_conv_rows`; the hidden layers
    still run full-graph).

    ``packed_first``: ``x`` is the PACKED (N, 2D) pair ``[x | mean_agg(x)]``
    (see :func:`llp_tpu.models.encoder.pack_first_layer_input`); layer 1
    consumes it via one stacked-weight matmul and no in-program layer-1
    aggregation runs.  Mutually exclusive with ``x_agg``.
    """
    if packed_first and x_agg is not None:
        raise ValueError("packed_first and x_agg are mutually exclusive")
    conv_fn = _CONV_APPLY[conv]
    convs = params["convs"]
    h = x
    new_state = []
    for i, cp in enumerate(convs[:-1]):
        if i == 0 and packed_first:
            h = _apply_packed_first(conv, cp, graph, h)
        else:
            h = conv_fn(cp, graph, h, impl=impl, x_agg=x_agg if i == 0 else None)
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
    last_agg = x_agg if len(convs) == 1 else None
    if len(convs) == 1 and packed_first:
        h = (_packed_first_rows(conv, convs[-1], graph, h, last_rows)
             if last_rows is not None
             else _apply_packed_first(conv, convs[-1], graph, h))
    elif last_rows is not None:
        h = _sage_conv_rows(
            conv, convs[-1], graph, h, last_rows, impl=impl, x_agg=last_agg
        )
    else:
        h = conv_fn(convs[-1], graph, h, impl=impl, x_agg=last_agg)
    if norm_type == "batch":
        return h, new_state
    return h
