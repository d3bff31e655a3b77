"""ARCHIVED EXPERIMENT — Pallas blocked-tile SpMM (out of the package surface).

Retired from ``llp_tpu.ops.spmm`` in round 3: across every measured regime it
lost to the windowed segsum kernel — 28 ms vs 3.0 ms at LLP densities
(413k×256, 13% tile fill), and RCM reordering (its densification lever)
measured 1.7× WORSE at collab scale because it destroys the stand-ins'
native community locality (BASELINE.md "Collab-scale teacher roofline",
levers table).  One-hot adjacency recovery pays O(TILE_E·128) MXU FLOPs per
chunk regardless of fill; at link-prediction sparsity the windowed
segmented-sum formulation (segsum_kernel.py) dominates.  Kept in-tree as the
record of the design + measurements; ``build_tiles`` still serves the
reorder diagnostics (tests/test_reorder.py).

Original design notes follow.

Blocked-tile SpMM — the MXU-native sparse aggregation formulation.

Replaces ``torch_sparse.matmul`` (reference ``src/sageconv_updated.py:86-89``)
with a formulation that keeps every FLOP on the MXU instead of fighting the
TPU with scatter/gather:

1.  Host side, once per graph: edges are bucketed into 128×128 tiles of the
    (receiver, sender) adjacency, sorted by tile-row, and each tile's edges
    are packed into fixed-size chunks of ``TILE_E`` local coordinates
    (er*128+ec, -1 padding).  Chunks of the same tile simply accumulate.
2.  Kernel, per (d-tile, chunk) grid step: the chunk's local coordinate list
    is expanded into one-hot matrices R (E_t×128, receivers) and S (E_t×128,
    senders) with broadcasted-iota compares, the tile adjacency is recovered
    as A = RᵀS (one small MXU matmul — optionally weighted by per-edge
    values), and the contribution A @ x_tile (128×D_t MXU matmul) accumulates
    into the output row-block, which stays resident in VMEM across the
    consecutive chunks of one tile-row.

Sum and mean reduce (mean divides by in-degree outside the kernel); the
backward pass is the same kernel over the transposed tile set via custom_vjp.
Efficiency depends on tile fill; callers can reorder nodes (community/BFS
order) to densify tiles.  ``pallas_supported`` gates on shapes.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from llp_tpu.core.graph import Graph

from llp_tpu.data.tiles import TILE, TILE_E, SpmmTiles, build_tiles  # noqa: E402


def _make_kernel(weighted: bool):
    def kernel(rows_ref, cols_ref, *refs):
        if weighted:
            coords_ref, w_ref, x_ref, _zeros_ref, out_ref = refs
        else:
            coords_ref, x_ref, _zeros_ref, out_ref = refs
            w_ref = None
        # _zeros_ref is aliased to out_ref: row blocks no tile maps to keep
        # their zero initialization (without the alias those HBM blocks are
        # UNDEFINED on hardware — interpret mode zero-fills, hiding it).
        t = pl.program_id(1)
        coords = coords_ref[...]  # (TILE_E, 1)
        valid = coords >= 0
        cc = jnp.where(valid, coords, 0)
        er = cc // TILE
        ec = cc % TILE
        lanes = jax.lax.broadcasted_iota(jnp.int32, (TILE_E, TILE), 1)
        rmat = jnp.where((er == lanes) & valid, 1.0, 0.0)
        if weighted:
            rmat = rmat * w_ref[...]
        smat = jnp.where((ec == lanes) & valid, 1.0, 0.0)
        a_tile = jax.lax.dot_general(
            rmat, smat, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        contrib = jnp.dot(
            a_tile, x_ref[...].astype(jnp.float32), preferred_element_type=jnp.float32
        )
        first = jnp.logical_or(t == 0, rows_ref[t] != rows_ref[jnp.maximum(t - 1, 0)])

        @pl.when(first)
        def _():
            out_ref[...] = contrib

        @pl.when(jnp.logical_not(first))
        def _():
            out_ref[...] = out_ref[...] + contrib

    return kernel


def _spmm_tiles_call(tiles: SpmmTiles, x_pad: jnp.ndarray, *, d_tile: int, interpret: bool):
    t_total = tiles.tile_rows.shape[0]
    d_pad = x_pad.shape[1]
    weighted = tiles.weights is not None

    in_specs = [
        pl.BlockSpec((TILE_E, 1), lambda d, t, rows, cols: (t, 0)),
    ]
    operands = [tiles.coords]
    if weighted:
        in_specs.append(pl.BlockSpec((TILE_E, 1), lambda d, t, rows, cols: (t, 0)))
        operands.append(tiles.weights)
    in_specs.append(
        pl.BlockSpec((TILE, d_tile), lambda d, t, rows, cols: (cols[t], d))
    )
    operands.append(x_pad)
    # Zero-initialized buffer aliased to the output: row blocks that no tile
    # maps to (all-residual or isolated-node stripes) get no grid step, so
    # without the alias their HBM contents would be undefined on hardware.
    in_specs.append(
        pl.BlockSpec((TILE, d_tile), lambda d, t, rows, cols: (rows[t], d))
    )
    operands.append(jnp.zeros((tiles.n_rows_pad, d_pad), jnp.float32))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(d_pad // d_tile, t_total),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((TILE, d_tile), lambda d, t, rows, cols: (rows[t], d)),
    )
    out = pl.pallas_call(
        _make_kernel(weighted),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((tiles.n_rows_pad, d_pad), jnp.float32),
        # zeros is the LAST operand; +2 for the scalar-prefetch args
        input_output_aliases={2 + len(operands) - 1: 0},
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(tiles.tile_rows, tiles.tile_cols, *operands)
    return out


def spmm_tiles_apply(
    tiles: SpmmTiles,
    x: jnp.ndarray,
    num_out_rows: int,
    *,
    d_tile: int = 128,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Run the tiled SpMM: returns (num_out_rows, D) fp32 partial sums."""
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    n, d = x.shape
    d_pad = ((d + d_tile - 1) // d_tile) * d_tile
    x_pad = jnp.zeros((tiles.n_cols_pad, d_pad), x.dtype)
    x_pad = x_pad.at[:n, :d].set(x)
    out = _spmm_tiles_call(tiles, x_pad, d_tile=d_tile, interpret=interpret)
    return out[:num_out_rows, :d]


# ---- integration with ops.spmm ------------------------------------------------

# Caches keyed by the identity of the graph's senders buffer (a reference to
# the array is kept in the value to pin it against id reuse after gc).
_TILE_CACHE: dict = {}
_FN_CACHE: dict = {}


# Tiles below this fill go through the XLA segment-sum residual path instead
# of a (mostly-empty) MXU chunk.
MIN_TILE_EDGES = 16


def _graph_tiles(graph: Graph, transpose: bool):
    """Returns (tiles, res_recv, res_send) — hybrid dense/residual split."""
    key = (graph.cache_token, transpose)
    hit = _TILE_CACHE.get(key)
    if hit is not None:
        return hit
    if isinstance(graph.senders, jax.core.Tracer):
        raise RuntimeError(
            "Pallas SpMM tile data for this graph has not been built yet and "
            "the graph is a tracer inside jit. Call prepare_pallas(graph) "
            "with the concrete graph before jit-compiling (the epoch "
            "builders do this when spmm_impl='pallas')."
        )
    e = graph.num_edges
    send = np.asarray(jax.device_get(graph.senders))[:e]
    recv = np.asarray(jax.device_get(graph.receivers))[:e]
    if transpose:
        send, recv = recv, send
    tiles, res_recv, res_send, _ = build_tiles(
        recv, send, graph.num_nodes, min_tile_edges=MIN_TILE_EDGES
    )
    out = (tiles, jnp.asarray(res_recv, jnp.int32), jnp.asarray(res_send, jnp.int32))
    _TILE_CACHE[key] = out
    return out


def prepare_pallas(graph: Graph) -> None:
    """Pre-build forward+transpose tile data and the vjp'd fns (outside jit)."""
    _get_spmm_fn(graph, "mean")
    _get_spmm_fn(graph, "sum")


def pallas_supported(graph: Graph, x: jnp.ndarray) -> bool:
    return x.ndim == 2


def _get_spmm_fn(graph: Graph, reduce: str):
    """custom_vjp'd x -> A@x with the tile data closed over (Graph holds
    integer arrays, so it can't be a differentiable primal; closure keeps the
    vjp signature purely float)."""
    key = (graph.cache_token, reduce)
    hit = _FN_CACHE.get(key)
    if hit is not None:
        return hit

    tiles_f, res_recv_f, res_send_f = _graph_tiles(graph, transpose=False)
    tiles_b, res_recv_b, res_send_b = _graph_tiles(graph, transpose=True)
    inv_deg = 1.0 / np.maximum(
        np.asarray(jax.device_get(graph.in_degree), np.float32), 1.0
    )
    inv_deg_dev = jnp.asarray(inv_deg)
    n = graph.num_nodes

    def residual(recv, send, x):
        if recv.shape[0] == 0:
            return 0.0
        msgs = jnp.take(x, send, axis=0).astype(jnp.float32)
        return jax.ops.segment_sum(msgs, recv, num_segments=n)

    def fwd_impl(x):
        out = spmm_tiles_apply(tiles_f, x, n) + residual(res_recv_f, res_send_f, x)
        if reduce == "mean":
            out = out * inv_deg_dev[:, None]
        return out.astype(x.dtype)

    @jax.custom_vjp
    def f(x):
        return fwd_impl(x)

    def f_fwd(x):
        return fwd_impl(x), ()

    def f_bwd(_res, g):
        gf = g.astype(jnp.float32)
        if reduce == "mean":
            gf = gf * inv_deg_dev[:, None]
        dx = spmm_tiles_apply(tiles_b, gf, n) + residual(res_recv_b, res_send_b, gf)
        return (dx.astype(g.dtype),)

    f.defvjp(f_fwd, f_bwd)
    _FN_CACHE[key] = f
    return f


def spmm_pallas(graph: Graph, x: jnp.ndarray, reduce: str) -> jnp.ndarray:
    if reduce == "max":
        from llp_tpu.ops.spmm import _spmm_xla

        return _spmm_xla(graph, x, "max")
    return _get_spmm_fn(graph, reduce)(x)
