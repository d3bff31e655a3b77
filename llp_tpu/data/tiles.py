"""Host-side 128x128 adjacency tiling — the diagnostic behind RCM reorder.

Extracted from the archived blocked-tile SpMM experiment
(docs/archived/spmm_tile_kernel.py) when the kernel left the package
surface (round 4): ``build_tiles`` remains live because the reorder
diagnostics (``llp_tpu/data/reorder.py``, tests/test_reorder.py) measure
tile fill / tile counts of a (receiver, sender) adjacency under different
node orderings.  The archived kernel imports these symbols from here.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np


TILE = 128
TILE_E = 128


class SpmmTiles(NamedTuple):
    """Device-ready tile data for one direction of an SpMM."""

    tile_rows: jnp.ndarray  # (T,) int32 — output row-block per chunk (sorted)
    tile_cols: jnp.ndarray  # (T,) int32 — x row-block per chunk
    coords: jnp.ndarray     # (T*TILE_E, 1) int32 — er*TILE+ec, -1 = padding
    weights: Optional[jnp.ndarray]  # (T*TILE_E, 1) f32 or None (binary)
    # (column-vector layout: Mosaic requires >=2-D vectors; a (TILE_E, 1)
    # block broadcasts against (TILE_E, TILE) iota without any reshape)
    n_rows_pad: int
    n_cols_pad: int


def build_tiles(
    receivers: np.ndarray,
    senders: np.ndarray,
    num_nodes: int,
    edge_weight: Optional[np.ndarray] = None,
    *,
    min_tile_edges: int = 0,
):
    """Host-side tiling of the (receiver, sender) adjacency.

    Edges landing in tiles with fewer than ``min_tile_edges`` entries are
    split off into a residual COO list (returned separately) — the hybrid
    path sends them through the XLA segment-sum instead of wasting a whole
    MXU chunk on a near-empty tile.

    Returns ``(tiles, res_recv, res_send, res_weight)``; the residual arrays
    are empty when ``min_tile_edges == 0``.
    """
    receivers = np.asarray(receivers, np.int64)
    senders = np.asarray(senders, np.int64)
    n_pad = ((num_nodes + TILE - 1) // TILE) * TILE
    w_all = None if edge_weight is None else np.asarray(edge_weight, np.float32)

    empty_res = (
        np.zeros((0,), np.int64),
        np.zeros((0,), np.int64),
        None if w_all is None else np.zeros((0,), np.float32),
    )

    def empty_tiles():
        return SpmmTiles(
            jnp.zeros((1,), jnp.int32),
            jnp.zeros((1,), jnp.int32),
            -jnp.ones((TILE_E, 1), jnp.int32),
            None if w_all is None else jnp.zeros((TILE_E, 1), jnp.float32),
            n_pad,
            n_pad,
        )

    e_all = receivers.shape[0]
    if e_all == 0:
        return empty_tiles(), *empty_res

    tr_all = receivers // TILE
    tc_all = senders // TILE
    order = np.lexsort((tc_all, tr_all))
    recv_s, send_s = receivers[order], senders[order]
    tr, tc = tr_all[order], tc_all[order]
    w_s = None if w_all is None else w_all[order]

    key = tr * (n_pad // TILE) + tc
    group_start = np.r_[0, np.flatnonzero(np.diff(key)) + 1]
    group_len = np.diff(np.r_[group_start, e_all])

    if min_tile_edges > 0:
        dense_group = group_len >= min_tile_edges
        edge_dense = np.repeat(dense_group, group_len)
        res_recv = recv_s[~edge_dense]
        res_send = send_s[~edge_dense]
        res_w = None if w_s is None else w_s[~edge_dense]
        recv_s, send_s = recv_s[edge_dense], send_s[edge_dense]
        tr, tc = tr[edge_dense], tc[edge_dense]
        if w_s is not None:
            w_s = w_s[edge_dense]
        group_start_sizes = group_len[dense_group]
        group_start = np.r_[0, np.cumsum(group_start_sizes)[:-1]].astype(np.int64)
        group_len = group_start_sizes
    else:
        res_recv, res_send, res_w = empty_res

    e = recv_s.shape[0]
    if e == 0:
        return empty_tiles(), res_recv, res_send, res_w

    er = (recv_s % TILE).astype(np.int32)
    ec = (send_s % TILE).astype(np.int32)

    # Vectorized chunk packing: edge j of group g goes to chunk
    # chunk_base[g] + j // TILE_E, slot j % TILE_E.
    n_chunks_per_group = -(-group_len // TILE_E)
    chunk_base = np.r_[0, np.cumsum(n_chunks_per_group)[:-1]].astype(np.int64)
    t_total = int(n_chunks_per_group.sum())
    within = np.arange(e, dtype=np.int64) - np.repeat(group_start, group_len)
    chunk_of_edge = np.repeat(chunk_base, group_len) + within // TILE_E
    slot = within % TILE_E

    tile_rows = np.empty((t_total,), np.int32)
    tile_cols = np.empty((t_total,), np.int32)
    first_edge_of_chunk = np.searchsorted(chunk_of_edge, np.arange(t_total))
    tile_rows[:] = tr[first_edge_of_chunk]
    tile_cols[:] = tc[first_edge_of_chunk]

    coords = -np.ones((t_total * TILE_E,), np.int32)
    coords[chunk_of_edge * TILE_E + slot] = er.astype(np.int32) * TILE + ec
    weights = None
    if w_s is not None:
        weights = np.zeros((t_total * TILE_E,), np.float32)
        weights[chunk_of_edge * TILE_E + slot] = w_s

    tiles = SpmmTiles(
        jnp.asarray(tile_rows),
        jnp.asarray(tile_cols),
        jnp.asarray(coords.reshape(-1, 1)),
        None if weights is None else jnp.asarray(weights.reshape(-1, 1)),
        n_pad,
        n_pad,
    )
    return tiles, res_recv, res_send, res_w
