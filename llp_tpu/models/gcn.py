"""GCN encoder — symmetric-normalized graph convolution.

Matches PyG ``GCNConv(cached=True)`` as used by the reference ``GCN``
(reference ``src/models.py:56-80``) over an unweighted edge_index:

    x' = D̂^{-1/2} (A + I) D̂^{-1/2} · x · W + b,     D̂ = deg(A) + 1

The per-edge weight ``1/sqrt(d̂_u d̂_v)`` separates into endpoint factors, so
the conv is applied as ``inv_sqrt ⊙ spmm_sum(inv_sqrt ⊙ x) + (1/d̂) ⊙ x`` —
an UNWEIGHTED sum over the real edges (which rides the fast Pallas segsum
kernel) plus an analytic self-loop term; the Graph container never needs
self-loops added.  The normalization coefficients depend only on graph
structure — compute them once with :func:`gcn_norm_coeffs` and reuse across
layers/steps (this is what ``cached=True`` buys the reference).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from llp_tpu.core.graph import Graph
from llp_tpu.ops.rng import inverted_dropout
from llp_tpu.models.init import init_linear
from llp_tpu.ops.spmm import spmm


def gcn_norm_coeffs(graph: Graph) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Factored sym-norm: node scalings ``1/sqrt(d̂_v)`` and self weights
    ``1/d̂_v`` (both (N,)).  The per-edge coefficient ``w_uv/sqrt(d̂_u d̂_v)``
    factors into the endpoint scalings times the (possibly unit) edge weight,
    so the normalized aggregation is pre/post scaling around a sum-SpMM —
    unweighted (kernel-fast) for binary graphs, the weighted segsum kernel
    otherwise.

    Unweighted: d̂ = in-degree + 1 (PyG ``gcn_norm`` with self-loops, the
    reference's ``GCNConv(cached=True)``, ``src/models.py:56-80``).
    Weighted graphs use the weighted degree ``d̂_v = 1 + Σ_e w_e`` (PyG
    ``gcn_norm`` with ``edge_weight``, self-loop fill value 1).
    """
    if getattr(graph, "edge_weight", None) is not None:
        from llp_tpu.ops.spmm import weighted_in_degree

        deg_hat = weighted_in_degree(graph) + 1.0
    else:
        deg_hat = graph.in_degree.astype(jnp.float32) + 1.0
    return jax.lax.rsqrt(deg_hat), 1.0 / deg_hat


def _normalized_aggregate(
    graph: Graph,
    x: jnp.ndarray,
    norm: Tuple[jnp.ndarray, jnp.ndarray],
    *,
    impl: str = "xla",
) -> jnp.ndarray:
    """``Â x`` via the factored normalization (unweighted kernel-fast SpMM;
    weighted graphs ride the weighted segsum kernel)."""
    inv_sqrt, self_w = norm
    xs = x * inv_sqrt[:, None].astype(x.dtype)
    out = spmm(graph, xs, reduce="sum", edge_weight=getattr(graph, "edge_weight", None), impl=impl)
    out = out * inv_sqrt[:, None].astype(x.dtype)
    return out + self_w[:, None].astype(x.dtype) * x


def init_gcn_conv(key: jax.Array, din: int, dout: int, *, dtype=jnp.float32) -> dict:
    return {"lin": init_linear(key, din, dout, bias=True, init="glorot", dtype=dtype)}


def apply_gcn_conv(
    params: dict,
    graph: Graph,
    x: jnp.ndarray,
    norm: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    *,
    impl: str = "xla",
    x_agg: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """``x_agg`` — optional precomputed ``Â x`` (normalized adjacency incl.
    the analytic self-loop term).  ``Â (x W) = (Â x) W`` by linearity, so the
    train loops hoist the structure-only product out of the batch loop."""
    if x_agg is not None:
        out = jnp.dot(
            x_agg, params["lin"]["w"], preferred_element_type=jnp.float32
        ).astype(x.dtype)
        return out + params["lin"]["b"]
    if norm is None:
        norm = gcn_norm_coeffs(graph)
    xw = jnp.dot(x, params["lin"]["w"], preferred_element_type=jnp.float32).astype(
        x.dtype
    )
    return _normalized_aggregate(graph, xw, norm, impl=impl) + params["lin"]["b"]


def init_gcn(
    key: jax.Array,
    in_channels: int,
    hidden_channels: int,
    out_channels: int,
    num_layers: int,
    *,
    dtype=jnp.float32,
) -> dict:
    keys = jax.random.split(key, num_layers)
    dims = [in_channels] + [hidden_channels] * (num_layers - 1) + [out_channels]
    convs = [
        init_gcn_conv(keys[i], dims[i], dims[i + 1], dtype=dtype)
        for i in range(num_layers)
    ]
    return {"convs": convs}


def apply_gcn(
    params: dict,
    graph: Graph,
    x: jnp.ndarray,
    *,
    dropout: float = 0.0,
    train: bool = False,
    rng: Optional[jax.Array] = None,
    norm: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    impl: str = "xla",
    x_agg: Optional[jnp.ndarray] = None,
    last_rows: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """ReLU + dropout between convs, nothing after the last (models.py:74-80).

    ``last_rows``: optional (B,) node ids — return only those ROWS of the
    final conv's output: ``(Â h)[idx] W + b`` by the same ``Â (h W) =
    (Â h) W`` linearity the hoist uses; the full (N, H) final embedding
    (and its training cotangent) never materializes."""
    if norm is None:
        norm = gcn_norm_coeffs(graph)
    convs = params["convs"]
    h = x
    for i, cp in enumerate(convs[:-1]):
        h = apply_gcn_conv(cp, graph, h, norm, impl=impl, x_agg=x_agg if i == 0 else None)
        h = jax.nn.relu(h)
        if train and dropout > 0.0:
            if rng is None:
                raise ValueError("train-mode dropout requires an rng key")
            h = inverted_dropout(h, dropout, jax.random.fold_in(rng, i))
    last_agg = x_agg if len(convs) == 1 else None
    if last_rows is not None:
        agg = (
            _normalized_aggregate(graph, h, norm, impl=impl)
            if last_agg is None
            else last_agg
        )
        rows = jnp.take(agg, last_rows, axis=0)
        cp = convs[-1]
        out = jnp.dot(
            rows, cp["lin"]["w"], preferred_element_type=jnp.float32
        ).astype(h.dtype)
        return out + cp["lin"]["b"]
    return apply_gcn_conv(convs[-1], graph, h, norm, impl=impl, x_agg=last_agg)
