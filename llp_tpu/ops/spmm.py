"""Sparse matrix × dense matrix aggregation (the GNN message-passing core).

TPU-native replacement for the reference's ``torch_sparse.matmul(adj_t, x,
reduce=...)`` (reference ``src/sageconv_updated.py:86-89``) and for the
scatter-based PyG ``MessagePassing`` engine backing SAGEConv/GCNConv
(reference ``src/models.py``).

Two implementations behind one interface:

* ``impl="xla"`` — gather sender rows, mask, ``jax.ops.segment_sum`` /
  ``segment_max`` into receivers.  XLA lowers this to the TPU's native
  dynamic-gather + scatter-add; accumulation is fp32 even for bf16 inputs.
* ``impl="segsum"`` — windowed Pallas segmented-sum kernel (see
  :mod:`llp_tpu.ops.pallas.segsum_kernel`), the fastest path on TPU (2.2×
  over the sorted XLA scatter); requires ``prepare_segsum(graph)`` outside
  jit, falls back to XLA otherwise.

(A third, blocked-tile implementation lived behind ``impl="pallas"`` through
round 2; it never beat segsum in any measured regime — 28 ms vs 3.0 ms at
LLP densities, RCM-reordered collab 1.7× WORSE (BASELINE.md) — and was
retired from this dispatch surface in round 3.  The module remains as an
archived experiment: docs/archived/spmm_tile_kernel.py.)

Semantics (matching torch_sparse.matmul over an adjacency whose values were
stripped, i.e. binary weights):

* ``sum``:   out[v] = Σ_{e: recv[e]=v} x[send[e]]
* ``mean``:  sum / in_degree, 0 for isolated nodes (torch_sparse convention)
* ``max``:   elementwise max over senders, 0 for isolated nodes
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from llp_tpu.core.graph import Graph

_IMPLS = ("xla", "segsum")


def spmm(
    graph: Graph,
    x: jnp.ndarray,
    reduce: str = "mean",
    *,
    edge_weight: jnp.ndarray | None = None,
    impl: str = "xla",
) -> jnp.ndarray:
    """Aggregate sender features into receivers over the graph's edges.

    Args:
      graph: padded graph (COO + CSR views).
      x: (N, D) node features.
      reduce: "sum" | "mean" | "max".
      edge_weight: optional (E_pad,) per-edge scalar weights (sum/mean only) —
        used by GCN's symmetric normalization.
      impl: "xla" (segment ops), "segsum" (windowed Pallas kernel — the
        fastest path on TPU; needs prepare_segsum(graph) outside jit), or
        a callable (injected device-local aggregation for sharded epochs).
        The retired "pallas" blocked-tile impl raises with a pointer to
        its archive.

    Returns:
      (N, D) aggregated features, dtype follows x (accumulation in fp32).
    """
    if reduce not in ("sum", "mean", "max"):
        raise ValueError(f"unknown reduce {reduce!r}")
    if edge_weight is not None and reduce == "max":
        raise ValueError("edge_weight is not supported with reduce='max'")
    if callable(impl):
        # Injected aggregation (the sharded epoch functions pass a device-
        # local gather+segment-sum+psum closure here so the unmodified model
        # code runs inside shard_map — see llp_tpu.parallel.epoch).
        return impl(graph, x, reduce, edge_weight)
    if impl == "segsum":
        # Windowed Pallas segmented-sum — the fastest single-chip path
        # (2.2x over the XLA sorted scatter on v5e). Requires
        # prepare_segsum(graph) before jit (weighted=True for the
        # edge-weighted variant); falls back to XLA otherwise.
        from llp_tpu.ops.pallas.segsum_kernel import (
            segsum_ready,
            segsum_weighted_ready,
            spmm_segsum,
            spmm_segsum_args,
        )

        if reduce in ("sum", "mean"):
            # ARGUMENT-PASSED layouts first (attach_segsum): layout arrays
            # are traced jit arguments — the only kernel path that scales to
            # huge graphs on remote-compile runtimes (closure layouts become
            # HLO constants: ~16 B/edge of compile upload).
            if graph.seg is not None and edge_weight is None:
                return spmm_segsum_args(graph, x, reduce)
            concrete = not isinstance(graph.senders, jax.core.Tracer)
            ready = (
                segsum_weighted_ready(graph)
                if edge_weight is not None
                else segsum_ready(graph)
            )
            if ready or concrete:
                return spmm_segsum(graph, x, reduce, edge_weight)
        impl = "xla"
    if impl == "pallas":
        raise ValueError(
            "impl='pallas' (blocked-tile kernel) was retired in round 3: it "
            "never beat the segsum kernel in any measured regime "
            "(BASELINE.md). Use impl='segsum' (TPU) or 'xla'; the archived "
            "experiment lives in docs/archived/spmm_tile_kernel.py."
        )
    if impl != "xla":
        raise ValueError(f"unknown impl {impl!r}; expected one of {_IMPLS}")
    return _spmm_xla(graph, x, reduce, edge_weight)


def weighted_in_degree(graph: Graph) -> jnp.ndarray:
    """Σ of real-edge weights into each receiver, (N,) fp32.

    ``build_graph`` precomputes this (``w_in_degree``) — essential under
    edge sharding, where each device's ``edge_weight`` is a slice and a
    local recompute would be a partial sum.  The fallback recompute serves
    hand-built single-device graphs (padded edges carry weight 0 and
    receiver == num_nodes, so the segment op drops them natively).
    """
    wdeg = getattr(graph, "w_in_degree", None)
    if wdeg is not None:
        return wdeg
    if graph.edge_weight is None:
        raise ValueError("graph carries no edge weights")
    return jax.ops.segment_sum(
        graph.edge_weight.astype(jnp.float32),
        graph.receivers,
        num_segments=graph.num_nodes,
        indices_are_sorted=graph.receiver_sorted,
    )


def mean_aggregate(graph: Graph, x: jnp.ndarray, *, impl: str = "xla") -> jnp.ndarray:
    """Neighbor mean; the WEIGHTED mean ``Σ w·x / Σ w`` when the graph carries
    edge weights (``torch_sparse.matmul(reduce='mean')`` semantics over a
    value-carrying SparseTensor — the weighted-graph counterpart of the
    reference's stripped-values mean, reference ``src/sageconv_updated.py:
    86-89``).  Receiver-normalizing the weights up front keeps the hot path a
    single sum-SpMM that rides the weighted segsum kernel.
    """
    # getattr: the sharded epoch programs pass lightweight graph stand-ins
    # (per-shard namespaces) that predate the edge_weight field.
    if getattr(graph, "edge_weight", None) is None:
        return spmm(graph, x, reduce="mean", impl=impl)
    inv = 1.0 / jnp.maximum(weighted_in_degree(graph), 1e-12)
    recv = jnp.clip(graph.receivers, 0, graph.num_nodes - 1)  # pad rows: w=0
    w_norm = graph.edge_weight.astype(jnp.float32) * jnp.take(inv, recv)
    return spmm(graph, x, reduce="sum", edge_weight=w_norm, impl=impl)


def _spmm_xla(
    graph: Graph,
    x: jnp.ndarray,
    reduce: str,
    edge_weight: jnp.ndarray | None = None,
) -> jnp.ndarray:
    n = graph.num_nodes
    acc_dtype = jnp.float32 if x.dtype in (jnp.bfloat16, jnp.float16) else x.dtype

    if reduce in ("sum", "mean") and edge_weight is None and graph.receiver_sorted:
        # Hot path: sorted scatter forward, sorted scatter backward over the
        # sender-sorted (CSR) edge view — ~1.8x faster than unsorted scatter
        # on TPU in each direction.
        inv_deg = (
            1.0 / jnp.maximum(graph.in_degree.astype(jnp.float32), 1.0)
            if reduce == "mean"
            else None
        )
        out = _sorted_spmm(
            x,  # gathered in native dtype (half-width reads under bf16),
            graph.senders,  # upcast to fp32 only for the scatter-accumulate
            graph.receivers,
            graph.col,
            graph.csr_row,
            n,
        )
        if inv_deg is not None:
            out = out * inv_deg[:, None].astype(acc_dtype)
        return out.astype(x.dtype)

    msgs = jnp.take(x, graph.senders, axis=0).astype(acc_dtype)
    if edge_weight is not None:
        msgs = msgs * edge_weight.astype(acc_dtype)[:, None]

    if reduce == "max":
        neg = jnp.asarray(-jnp.inf, dtype=acc_dtype)
        msgs = jnp.where(graph.edge_mask[:, None], msgs, neg)
        out = jax.ops.segment_max(
            msgs, graph.receivers, num_segments=n, indices_are_sorted=False
        )
        # Isolated nodes (and padding scatters) produce -inf; zero them like
        # torch_sparse's reduce="max" does for empty rows.
        out = jnp.where(jnp.isfinite(out), out, jnp.zeros_like(out))
        return out.astype(x.dtype)

    msgs = jnp.where(graph.edge_mask[:, None], msgs, jnp.zeros_like(msgs))
    out = jax.ops.segment_sum(
        msgs,
        graph.receivers,
        num_segments=n,
        indices_are_sorted=graph.receiver_sorted,
    )
    if reduce == "mean":
        deg = graph.in_degree.astype(acc_dtype)
        out = out / jnp.maximum(deg, 1.0)[:, None]
    return out.astype(x.dtype)


def _float0_like(a):
    import numpy as onp

    return onp.zeros(a.shape, jax.dtypes.float0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _sorted_spmm(x, senders, receivers, col, csr_row, n):
    """sum-SpMM with sorted scatters in both directions; output is fp32.

    Padded edges carry receiver/csr_row == n (out of range) and are dropped
    by the segment op natively — no mask multiply needed.  The gather runs in
    x's dtype (halving read bandwidth for bf16); accumulation is fp32.
    """
    msgs = jnp.take(x, senders, axis=0).astype(jnp.float32)
    return jax.ops.segment_sum(
        msgs, receivers, num_segments=n, indices_are_sorted=True
    )


def _sorted_spmm_fwd(x, senders, receivers, col, csr_row, n):
    return _sorted_spmm(x, senders, receivers, col, csr_row, n), (
        senders,
        receivers,
        col,
        csr_row,
        jnp.zeros((0,), x.dtype),  # dtype witness for the cotangent
    )


def _sorted_spmm_bwd(n, res, g):
    senders, receivers, col, csr_row, proto = res
    # dx = A^T g: gather g at the ORIGINAL receivers of each sender-sorted
    # edge (= col), scatter into the sorted senders (= csr_row).  Round g to
    # the compute dtype first (it was produced from it), keeping the gather
    # stream half-width under bf16 while accumulating fp32.
    msgs = jnp.take(g.astype(proto.dtype), col, axis=0).astype(jnp.float32)
    dx = jax.ops.segment_sum(msgs, csr_row, num_segments=n, indices_are_sorted=True)
    return (
        dx.astype(proto.dtype),
        _float0_like(senders),
        _float0_like(receivers),
        _float0_like(col),
        _float0_like(csr_row),
    )


_sorted_spmm.defvjp(_sorted_spmm_fwd, _sorted_spmm_bwd)
