"""Immutable, statically-shaped graph containers for TPU execution.

The reference implementation (snap-research/linkless-link-prediction) passes raw
``edge_index`` tensors (2, E) around and leans on torch_sparse.SparseTensor for
its one explicit SpMM (reference ``src/sageconv_updated.py:86-89``).  On TPU we
need static shapes everywhere that XLA traces, so a graph is built once on the
host (numpy), padded to an aligned edge count, and carried as a pytree of
device arrays:

* COO layout (``senders``/``receivers`` + ``edge_mask``) feeds the XLA
  segment-sum aggregation path; padded edges have mask=False and point at
  node 0 (their messages are zeroed before the scatter).
* CSR-by-sender (``row_ptr``/``col``) feeds the on-device random-walk sampler
  and the Pallas SpMM kernel.  Edges here are the same set sorted by sender.

All LLP graphs are undirected with both directions materialized (the reference
trains on ``to_undirected`` train edges), so one CSR covers both the
out-neighborhood (walks) and in-neighborhood (aggregation) views; a directed
build stores the extra in-CSR explicitly.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np
from flax import struct


def round_up(x: int, m: int) -> int:
    """Smallest multiple of ``m`` that is >= ``x`` (and >= m)."""
    if x <= 0:
        return m
    return ((x + m - 1) // m) * m


@struct.dataclass
class Graph:
    """A padded, statically-shaped graph.

    Attributes
    ----------
    senders, receivers : (E_pad,) int32
        COO edge list, sorted by receiver (canonical order — fast sorted
        scatter). Message on edge e flows senders[e] -> receivers[e].
        Padded entries have sender 0, receiver ``num_nodes`` (out-of-range:
        segment ops drop them natively) and ``edge_mask`` False.
    edge_mask : (E_pad,) bool
        True for real edges.
    row_ptr : (N + 1,) int32
        CSR offsets by sender. ``col[row_ptr[u]:row_ptr[u+1]]`` are u's
        out-neighbors. Only real edges are covered (row_ptr[N] == num_edges).
    col : (E_pad,) int32
        CSR neighbor array (sorted by sender); padded tail repeats 0.
    csr_row : (E_pad,) int32
        Sender of each CSR-ordered edge (sorted ascending); padding is
        ``num_nodes``. (csr_row, col) is the sender-sorted edge view — the
        transposed-SpMM backward scatters into it sorted.
    in_degree : (N,) int32
        Number of real in-edges per node (aggregation fan-in).
    out_degree : (N,) int32
        Number of real out-edges per node (random-walk fan-out).
    num_nodes : int (static)
    num_edges : int (static)
        Count of real (unpadded) edges.
    """

    senders: jnp.ndarray
    receivers: jnp.ndarray
    edge_mask: jnp.ndarray
    row_ptr: jnp.ndarray
    col: jnp.ndarray
    csr_row: jnp.ndarray
    in_degree: jnp.ndarray
    out_degree: jnp.ndarray
    num_nodes: int = struct.field(pytree_node=False)
    num_edges: int = struct.field(pytree_node=False)
    # True when the COO arrays are sorted by receiver (build_graph's canonical
    # order): lets the SpMM pass indices_are_sorted to the scatter, and makes
    # (csr_row, col) the matching sender-sorted view for the transposed
    # backward scatter.
    receiver_sorted: bool = struct.field(pytree_node=False, default=False)
    # Static identity token (assigned by build_graph): lets kernel-side caches
    # (e.g. the Pallas SpMM tile cache) key a graph even while it is a tracer
    # inside jit.
    cache_token: int = struct.field(pytree_node=False, default=-1)
    # Optional (E_pad,) float32 per-edge weights in the canonical COO order
    # (padded tail is 0).  The reference's ogbl-collab download carries
    # co-authorship counts (reference ``src/main.py:310`` loads them, though
    # its hot path never aggregates with them); encoders here aggregate
    # weighted when this is set (weighted mean for SAGE, weighted sym-norm
    # for GCN — the intended weighted-graph semantics).
    edge_weight: Optional[jnp.ndarray] = None
    # (N,) float32 Σ of incident real-edge weights per receiver, precomputed
    # at build time.  Kept on the Graph (not recomputed from edge_weight)
    # so the DP-sharded epoch — where each device sees only its edge slice —
    # still normalizes by the GLOBAL weighted degree without a collective.
    w_in_degree: Optional[jnp.ndarray] = None
    # Optional ARGUMENT-PASSED segsum layouts (round 5): a pytree of layout
    # arrays (fwd + bwd directions) built by
    # :func:`llp_tpu.ops.pallas.segsum_kernel.attach_segsum`.  When set,
    # ``spmm(..., impl="segsum")`` routes through these TRACED arrays
    # instead of the token-cached closure fns — essential for huge graphs
    # on remote runtimes: a jit CLOSING OVER layout arrays serializes them
    # into the compile upload (~16 B/edge; a 70M-edge graph is ~1.1 GB of
    # HLO constants, a guaranteed relay failure), while traced arguments
    # ship once as device buffers.  ``seg_meta`` carries the static block
    # counts: ((num_blocks_f, n_out_pad_f), (num_blocks_b, n_out_pad_b)).
    seg: Optional[tuple] = None
    seg_meta: Optional[tuple] = struct.field(pytree_node=False, default=None)

    @property
    def num_padded_edges(self) -> int:
        return int(self.senders.shape[0])


def build_graph(
    edge_index: np.ndarray,
    num_nodes: int,
    *,
    pad_to_multiple: int = 128,
    e_pad: Optional[int] = None,
    edge_weight: Optional[np.ndarray] = None,
) -> Graph:
    """Build a padded :class:`Graph` from a host (2, E) edge list.

    Mirrors the data contract of the reference's ``data.adj_t = train_edges.t()``
    (reference ``src/train_teacher_gnn.py:316-317``): the edge list given here IS
    the message graph. No symmetrization or dedup is performed — callers that
    want both directions must pass them (as the reference's splits do).
    """
    edge_index = np.asarray(edge_index, dtype=np.int64)
    if edge_index.ndim != 2 or edge_index.shape[0] != 2:
        raise ValueError(f"edge_index must be (2, E), got {edge_index.shape}")
    e = edge_index.shape[1]
    if e > 0 and (edge_index.min() < 0 or edge_index.max() >= num_nodes):
        raise ValueError("edge_index contains out-of-range node ids")
    if e_pad is None:
        e_pad = round_up(e, pad_to_multiple)

    send_real = edge_index[0].astype(np.int32)
    recv_real = edge_index[1].astype(np.int32)

    # Canonical COO order: sorted by receiver (sorted scatter on TPU).
    r_order = np.argsort(recv_real, kind="stable")
    senders = np.zeros((e_pad,), np.int32)
    receivers = np.full((e_pad,), num_nodes, np.int32)  # pad = out-of-range
    senders[:e] = send_real[r_order]
    receivers[:e] = recv_real[r_order]
    mask = np.zeros((e_pad,), bool)
    mask[:e] = True

    ew = wdeg = None
    if edge_weight is not None:
        edge_weight = np.asarray(edge_weight, np.float32).reshape(-1)
        if edge_weight.shape[0] != e:
            raise ValueError(
                f"edge_weight has {edge_weight.shape[0]} entries for {e} edges"
            )
        w = np.zeros((e_pad,), np.float32)
        w[:e] = edge_weight[r_order]
        ew = jnp.asarray(w)
        wdeg = jnp.asarray(
            np.bincount(
                recv_real, weights=edge_weight.astype(np.float64),
                minlength=num_nodes,
            ).astype(np.float32)
        )

    # CSR by sender (stable sort keeps deterministic neighbor order).
    s_order = np.argsort(send_real, kind="stable")
    col = np.zeros((e_pad,), dtype=np.int32)
    col[:e] = recv_real[s_order]
    csr_row = np.full((e_pad,), num_nodes, np.int32)
    csr_row[:e] = send_real[s_order]
    counts = np.bincount(send_real, minlength=num_nodes).astype(np.int64)
    row_ptr = np.zeros((num_nodes + 1,), dtype=np.int32)
    row_ptr[1:] = np.cumsum(counts).astype(np.int32)

    out_degree = counts.astype(np.int32)
    in_degree = np.bincount(recv_real, minlength=num_nodes).astype(np.int32)

    global _NEXT_TOKEN
    token = _NEXT_TOKEN
    _NEXT_TOKEN += 1

    return Graph(
        senders=jnp.asarray(senders),
        receivers=jnp.asarray(receivers),
        edge_mask=jnp.asarray(mask),
        row_ptr=jnp.asarray(row_ptr),
        col=jnp.asarray(col),
        csr_row=jnp.asarray(csr_row),
        in_degree=jnp.asarray(in_degree),
        out_degree=jnp.asarray(out_degree),
        num_nodes=int(num_nodes),
        num_edges=int(e),
        receiver_sorted=True,
        cache_token=token,
        edge_weight=ew,
        w_in_degree=wdeg,
    )


_NEXT_TOKEN = 0


def to_undirected_np(edge_index: np.ndarray, num_nodes: int) -> np.ndarray:
    """Host helper: symmetrize + dedup an edge list (drops duplicates)."""
    edge_index = np.asarray(edge_index, dtype=np.int64)
    both = np.concatenate([edge_index, edge_index[::-1]], axis=1)
    keys = both[0] * num_nodes + both[1]
    _, idx = np.unique(keys, return_index=True)
    return both[:, np.sort(idx)].astype(np.int64)
