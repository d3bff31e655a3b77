"""Windowed Pallas segmented-sum — sorted-scatter replacement at HBM speed.

(TPU-native replacement for the reference's ``torch_sparse.matmul`` SpMM,
reference ``src/sageconv_updated.py:86-89`` — the fastest of the three
implementations behind :func:`llp_tpu.ops.spmm.spmm`.)

The XLA sorted scatter-add runs at ~80 GB/s effective on v5e (413k×256 f32
rows in ~5 ms): each row is a 1 KB random-ish read-modify-write.  This kernel
restructures the reduction so every HBM access is a large sequential DMA and
every FLOP is an MXU matmul:

*  Host side (static per graph): the receiver-sorted edge stream is cut into
   blocks of BE edges whose receiver span fits a RMAX-row window (blocks are
   closed early at big receiver jumps; short blocks are padded).  Each edge
   stores its window-local receiver id; each block stores its window base r0
   (8-aligned).
*  Kernel, per (d-tile, block) grid step: one-hot expand the BE local ids
   (BE×RMAX, VPU iota compare), reduce the gathered message block with one
   MXU matmul ``M^T @ msgs`` (RMAX×DT), then read-modify-write the
   out[r0:r0+RMAX] window with two explicit DMAs.  Blocks are sequential in
   the grid, so overlapping windows accumulate correctly.

The sorted gather producing ``msgs`` stays in XLA (it already runs at
~200 GB/s).  Used by :func:`llp_tpu.ops.spmm.spmm` when a graph has been
prepared with impl="pallas_segsum"; the transposed layout serves the custom
VJP exactly like the sorted-scatter path.
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BE = 512     # edges per block
RMAX = 512   # receiver window rows per block
DT = 256     # feature tile (narrow features fall back to one 128-lane tile
#              — a D=128 stream otherwise pads its gathered messages 2x)

# Gathered-message budget per kernel dispatch: streams whose (E_pad, D)
# message tensor exceeds this are CHUNKED — the edge stream splits into
# window-aligned block ranges whose partial sums accumulate into the same
# aliased output buffer (the kernel's read-modify-write windows make the
# accumulation exact even when a window spans a chunk boundary).  This is
# what lets a 70M-edge x 128-dim aggregation (a ~36 GB message tensor, 2x
# the chip's HBM) run on one chip at ~4 GB of transient.  Default 4 GB so
# every previously-measured regime (warm 0.3 GB, collab-cold 2.2 GB, 1M-node
# 7.2 GB pre-tile-fix -> 3.6 GB now) keeps its single-dispatch path.
_CHUNK_MSG_BYTES = int(os.environ.get("LLP_SEGSUM_CHUNK_BYTES", 4 << 30))


class BlockedSegsumLayout(NamedTuple):
    senders: jnp.ndarray    # (B*BE,) int32 — gather indices, padded with 0
    local_ids: jnp.ndarray  # (B8, BE) int32 — window-local receiver per block
    #   slot, one ROW per block, rows padded to a multiple of 8 (RMAX-filled);
    #   RMAX marks pad slots.  Lane-aligned rows: the original (B*BE, 1)
    #   column layout tiled to T(8,128) with 128x padding — 3.34 GB x2 of
    #   pure padding at 7M edges, found as an OOM at the round-3 1M-node
    #   scale check.  The kernel reads 8-row tiles and selects row b % 8.
    block_r0: jnp.ndarray   # (B,) int32 — window base row (8-aligned)
    num_blocks: int
    n_out_pad: int          # out rows incl. window overhang
    slot_edge: jnp.ndarray | None = None  # (B*BE,) int32 — original edge id of
    #   each slot (pad = num input edges): permutes per-edge data (weights)
    #   into block order. Only built when edge_ids is passed.


def build_blocked_layout(
    seg_ids: np.ndarray,
    senders: np.ndarray,
    num_segments: int,
    edge_ids: np.ndarray | None = None,
) -> BlockedSegsumLayout:
    """Cut a sorted (seg_ids, senders) edge stream into windowed blocks.

    Fully vectorized: edges are grouped by fixed RMAX-row windows (bases at
    multiples of RMAX — inherently 8-aligned) and each window's edges are
    chunked into blocks of BE. Compared to a greedy scan this splits blocks
    at window boundaries (~N/RMAX extra blocks, a few percent), but builds a
    multi-million-edge layout in milliseconds instead of seconds.

    ``edge_ids`` (optional, (E,)): an id per input edge; when given, the
    layout also records ``slot_edge`` — each block slot's edge id (pad slots
    get ``len(edge_ids)``) — so per-edge payloads (e.g. weights) can be
    gathered into block order at run time.
    """
    seg_ids = np.asarray(seg_ids, np.int64)
    senders = np.asarray(senders, np.int64)
    e = seg_ids.shape[0]
    n_out_pad = ((num_segments + 7) // 8) * 8 + RMAX
    if e == 0:
        return BlockedSegsumLayout(
            jnp.zeros((BE,), jnp.int32),
            jnp.full((8, BE), RMAX, jnp.int32),
            jnp.zeros((1,), jnp.int32),
            1,
            n_out_pad,
            None if edge_ids is None else jnp.zeros((BE,), jnp.int32),
        )
    assert seg_ids[0] >= 0 and (np.diff(seg_ids) >= 0).all(), "seg_ids must be sorted"

    win = seg_ids // RMAX
    group_start = np.r_[0, np.flatnonzero(np.diff(win)) + 1]
    group_len = np.diff(np.r_[group_start, e])
    n_chunks = -(-group_len // BE)
    chunk_base = np.r_[0, np.cumsum(n_chunks)[:-1]].astype(np.int64)
    b = int(n_chunks.sum())

    within = np.arange(e, dtype=np.int64) - np.repeat(group_start, group_len)
    chunk_of_edge = np.repeat(chunk_base, group_len) + within // BE
    slot = within % BE

    send_out = np.zeros((b * BE,), np.int32)
    local = np.full((b * BE,), RMAX, np.int32)
    pos = chunk_of_edge * BE + slot
    send_out[pos] = senders.astype(np.int32)
    r0_of_edge = (win * RMAX).astype(np.int64)
    local[pos] = (seg_ids - r0_of_edge).astype(np.int32)
    r0s = np.zeros((b,), np.int32)
    first_edge = np.searchsorted(chunk_of_edge, np.arange(b))
    r0s[:] = r0_of_edge[first_edge].astype(np.int32)

    slot_edge = None
    if edge_ids is not None:
        se = np.full((b * BE,), e, np.int32)
        se[pos] = np.asarray(edge_ids, np.int64).astype(np.int32)
        slot_edge = jnp.asarray(se)

    return BlockedSegsumLayout(
        jnp.asarray(send_out),
        jnp.asarray(np.concatenate(
            [local.reshape(b, BE),
             np.full(((-b) % 8, BE), RMAX, np.int32)]
        )),
        jnp.asarray(r0s),
        b,
        n_out_pad,
        slot_edge,
    )


def _kernel(r0_ref, lid_ref, msgs_ref, init_ref, out_ref, scratch, sem, *,
            dt: int):
    # init_ref is the aliased initial out buffer (zeros, or a previous
    # chunk's partial sums); reads/writes go to out_ref.
    b = pl.program_id(1)
    d = pl.program_id(0)
    nb = pl.num_programs(1)
    lid = lid_ref[pl.ds(b % 8, 1), :]  # (1, BE): this block's row of the tile
    valid = lid < RMAX
    rows = jax.lax.broadcasted_iota(jnp.int32, (RMAX, BE), 0)
    # One-hot in the message dtype (0/1 are exact in bf16): bf16 messages run
    # the MXU at 2x fp32 rate and halve the msgs DMA; accumulation stays fp32
    # via preferred_element_type + the fp32 scratch window.
    m = jnp.where((lid == rows) & valid, 1.0, 0.0).astype(msgs_ref.dtype)
    contrib = jax.lax.dot_general(
        m,
        msgs_ref[...],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (RMAX, dt) fp32
    r0 = pl.multiple_of(r0_ref[b], 8)  # layout guarantees 8-aligned bases
    window = out_ref.at[pl.ds(r0, RMAX), pl.ds(d * dt, dt)]

    # Consecutive blocks of the same window (~avg_degree·RMAX/BE of them)
    # keep the accumulator resident in VMEM: DMA only at window boundaries.
    first = jnp.logical_or(b == 0, r0_ref[jnp.maximum(b - 1, 0)] != r0_ref[b])
    last = jnp.logical_or(b == nb - 1, r0_ref[jnp.minimum(b + 1, nb - 1)] != r0_ref[b])

    @pl.when(first)
    def _():
        load = pltpu.make_async_copy(window, scratch, sem)
        load.start()
        load.wait()

    scratch[...] = scratch[...] + contrib

    @pl.when(last)
    def _():
        store = pltpu.make_async_copy(scratch, window, sem)
        store.start()
        store.wait()


def _kernel_cast(r0_ref, lid_ref, msgs_ref, init_ref, out_ref, scratch,
                 stage, sem, *, dt: int):
    """Like ``_kernel`` but the HBM out buffer holds a NARROW dtype (bf16):
    windows accumulate fp32 in VMEM and round ONCE at the window store
    (numerically ≈ computing fp32 then casting — only windows spanning a
    chunk boundary round more than once).  Halves the out-buffer HBM — the
    (N, D) fp32 output is the single biggest transient of a huge-graph
    aggregation (5.1 GB at N=10M, D=128)."""
    b = pl.program_id(1)
    d = pl.program_id(0)
    nb = pl.num_programs(1)
    lid = lid_ref[pl.ds(b % 8, 1), :]
    valid = lid < RMAX
    rows = jax.lax.broadcasted_iota(jnp.int32, (RMAX, BE), 0)
    m = jnp.where((lid == rows) & valid, 1.0, 0.0).astype(msgs_ref.dtype)
    contrib = jax.lax.dot_general(
        m, msgs_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    r0 = pl.multiple_of(r0_ref[b], 8)
    window = out_ref.at[pl.ds(r0, RMAX), pl.ds(d * dt, dt)]
    first = jnp.logical_or(b == 0, r0_ref[jnp.maximum(b - 1, 0)] != r0_ref[b])
    last = jnp.logical_or(b == nb - 1, r0_ref[jnp.minimum(b + 1, nb - 1)] != r0_ref[b])

    @pl.when(first)
    def _():
        load = pltpu.make_async_copy(window, stage, sem)
        load.start()
        load.wait()
        scratch[...] = stage[...].astype(jnp.float32)

    scratch[...] = scratch[...] + contrib

    @pl.when(last)
    def _():
        stage[...] = scratch[...].astype(stage.dtype)
        store = pltpu.make_async_copy(stage, window, sem)
        store.start()
        store.wait()


@functools.partial(jax.jit, static_argnames=("num_blocks", "n_out_pad", "interpret"),
                   donate_argnums=(3,))
def _segsum_call(local_ids, block_r0, msgs, init, *, num_blocks, n_out_pad,
                 interpret):
    """One kernel dispatch over ``num_blocks`` blocks, accumulating into
    ``init`` (aliased to the output: zeros for a single-shot call, the
    running partial sums for a chunked stream).  The output dtype follows
    ``init`` (fp32, or bf16 via the casting kernel)."""
    d_pad = msgs.shape[1]
    # Feature tile: 256 lanes when the features fill it, one 128-lane tile
    # otherwise (a D=128 stream at DT=256 would pad every gathered message
    # row 2x — pure DMA+HBM waste, the round-3 local_ids bug class).
    dt = DT if d_pad % DT == 0 else 128
    f32_out = init.dtype == jnp.float32
    scratch_shapes = [pltpu.VMEM((RMAX, dt), jnp.float32)]
    if not f32_out:
        scratch_shapes.append(pltpu.VMEM((RMAX, dt), init.dtype))
    scratch_shapes.append(pltpu.SemaphoreType.DMA)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(d_pad // dt, num_blocks),
        in_specs=[
            pl.BlockSpec((8, BE), lambda d, b, r0s: (b // 8, 0)),
            pl.BlockSpec((BE, dt), lambda d, b, r0s: (b, d)),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=scratch_shapes,
    )
    return pl.pallas_call(
        functools.partial(_kernel if f32_out else _kernel_cast, dt=dt),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_out_pad, d_pad), init.dtype),
        input_output_aliases={3: 0},  # init (arg idx incl. prefetch) -> out
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(block_r0, local_ids, msgs, init)


def _segment_sum_arrays(
    x: jnp.ndarray,
    senders: jnp.ndarray,
    local_ids: jnp.ndarray,
    block_r0: jnp.ndarray,
    *,
    num_blocks: int,
    n_out_pad: int,
    num_segments: int,
    slot_weights: jnp.ndarray | None = None,
    interpret: bool | None = None,
    out_dtype=None,
) -> jnp.ndarray:
    """Kernel entry over raw layout arrays (fp32 output by default —
    ``out_dtype=bfloat16`` selects the casting kernel, which rounds each
    window once at its store; sliced to rows/cols).

    Accepts traced layout arrays so it can run inside ``shard_map`` with
    per-device layout slices (the static ``num_blocks``/``n_out_pad`` must be
    shared across shards — pad per-shard layouts to the max block count).

    ``slot_weights`` (optional, (B*BE,)): per-slot scalars multiplied into the
    gathered messages before the windowed reduction — the weighted-SpMM hook
    (weights already permuted into block order via the layout's slot_edge).
    """
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    d = x.shape[1]
    d_pad = ((d + 127) // 128) * 128

    mdtype = x.dtype if x.dtype in (jnp.float32, jnp.bfloat16) else jnp.float32
    msg_bytes = num_blocks * BE * d_pad * jnp.dtype(mdtype).itemsize

    def gathered(sl, wl):
        m = jnp.take(x, sl, axis=0).astype(mdtype)
        if wl is not None:
            m = m * wl.astype(m.dtype)[:, None]
        if d_pad != d:
            m = jnp.pad(m, ((0, 0), (0, d_pad - d)))
        return m

    out0 = jnp.zeros((n_out_pad, d_pad), out_dtype or jnp.float32)
    if msg_bytes <= _CHUNK_MSG_BYTES:
        wl = None if slot_weights is None else slot_weights
        return _segsum_call(
            local_ids, block_r0, gathered(senders, wl), out0,
            num_blocks=num_blocks, n_out_pad=n_out_pad, interpret=interpret,
        )[:num_segments, :d]

    # CHUNKED stream, serialized with lax.scan: equal window-aligned chunks
    # (multiples of 8 blocks — the lid tile rows), each accumulating into
    # the carried output; a window spanning a chunk boundary is exact
    # because every window's first block read-modify-writes the current HBM
    # content.  A python-loop version of this was measured keeping MANY
    # chunk gathers live at once (the gathers carry no data dependence, so
    # XLA hoists them: 7+ x 512MB buffers in the 10M-node probe) — the scan
    # body forces one-gather-at-a-time and compiles ONE kernel program.
    # The scan covers only the FULL chunks (slices always in bounds — a
    # padded-copy version cost two extra whole-layout-array copies at
    # runtime, 0.75 GB at 91M edges); the leftover tail is one static
    # dispatch after the loop.
    cb = max(8, (_CHUNK_MSG_BYTES // (BE * d_pad *
                                      jnp.dtype(mdtype).itemsize)) // 8 * 8)
    kfull = num_blocks // cb
    tail = num_blocks - kfull * cb

    def body(out, c):
        c0 = c * cb
        sl = jax.lax.dynamic_slice_in_dim(senders, c0 * BE, cb * BE)
        wl = (None if slot_weights is None
              else jax.lax.dynamic_slice_in_dim(slot_weights, c0 * BE,
                                                cb * BE))
        out = _segsum_call(
            jax.lax.dynamic_slice_in_dim(local_ids, c0, cb),
            jax.lax.dynamic_slice_in_dim(block_r0, c0, cb),
            gathered(sl, wl),
            out,
            num_blocks=cb,
            n_out_pad=n_out_pad,
            interpret=interpret,
        )
        return out, None

    out, _ = jax.lax.scan(body, out0, jnp.arange(kfull, dtype=jnp.int32))
    if tail:
        c0 = kfull * cb
        rows8 = -(-tail // 8) * 8
        sl = jax.lax.dynamic_slice_in_dim(senders, c0 * BE, tail * BE)
        wl = (None if slot_weights is None
              else jax.lax.dynamic_slice_in_dim(slot_weights, c0 * BE,
                                                tail * BE))
        out = _segsum_call(
            jax.lax.dynamic_slice_in_dim(local_ids, c0, rows8),
            jax.lax.dynamic_slice_in_dim(block_r0, c0, tail),
            gathered(sl, wl),
            out,
            num_blocks=tail,
            n_out_pad=n_out_pad,
            interpret=interpret,
        )
    return out[:num_segments, :d]


def segment_sum_blocked(
    x: jnp.ndarray,
    layout: BlockedSegsumLayout,
    num_segments: int,
    *,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Gather x rows by layout.senders and segment-sum them (sorted windows)."""
    return _segment_sum_arrays(
        x,
        layout.senders,
        layout.local_ids,
        layout.block_r0,
        num_blocks=layout.num_blocks,
        n_out_pad=layout.n_out_pad,
        num_segments=num_segments,
        interpret=interpret,
    )


# ---- SpMM integration (cached closures per graph, like the tile kernel) ------

_SEG_FN_CACHE: dict = {}


def segsum_ready(graph) -> bool:
    return (graph.cache_token, "mean") in _SEG_FN_CACHE


def get_blocked_spmm_fn(graph, reduce: str):
    """custom-vjp'd x -> aggregate(x) over the graph using windowed segsum in
    both directions (forward: receiver-sorted canonical COO; backward: the
    sender-sorted CSR view)."""
    key = (graph.cache_token, reduce)
    hit = _SEG_FN_CACHE.get(key)
    if hit is not None:
        return hit
    if isinstance(graph.senders, jax.core.Tracer):
        raise RuntimeError(
            "blocked-segsum layout not built for this graph; call "
            "prepare_segsum(graph) outside jit first"
        )
    e = graph.num_edges
    n = graph.num_nodes
    recv = np.asarray(jax.device_get(graph.receivers))[:e]
    send = np.asarray(jax.device_get(graph.senders))[:e]
    assert graph.receiver_sorted, "canonical graphs are receiver-sorted"
    lay_f = build_blocked_layout(recv, send, n)
    csr_row = np.asarray(jax.device_get(graph.csr_row))[:e]
    col = np.asarray(jax.device_get(graph.col))[:e]
    lay_b = build_blocked_layout(csr_row, col, n)
    inv_deg = jnp.asarray(
        1.0 / np.maximum(np.asarray(jax.device_get(graph.in_degree), np.float32), 1.0)
    )

    def fwd_impl(x):
        out = segment_sum_blocked(x, lay_f, n)
        if reduce == "mean":
            out = out * inv_deg[:, None]
        return out.astype(x.dtype)

    @jax.custom_vjp
    def f(x):
        return fwd_impl(x)

    def f_fwd(x):
        return fwd_impl(x), ()

    def f_bwd(_res, g):
        if reduce == "mean":
            # Scale in fp32, then return to the compute dtype so the backward
            # gather/DMA stream stays half-width under bf16.
            g = (g.astype(jnp.float32) * inv_deg[:, None]).astype(g.dtype)
        dx = segment_sum_blocked(g, lay_b, n)
        return (dx.astype(g.dtype),)

    f.defvjp(f_fwd, f_bwd)
    _SEG_FN_CACHE[key] = f
    return f


def segsum_weighted_ready(graph) -> bool:
    return (graph.cache_token, "mean", "w") in _SEG_FN_CACHE


def get_blocked_spmm_weighted_fn(graph, reduce: str):
    """custom-vjp'd (x, w) -> aggregate(w ⊙ x) over the graph — the
    edge-weighted SpMM (per-edge scalar on each message) on the windowed
    kernel in both directions.  Replaces ``torch_sparse.matmul`` over a
    value-carrying SparseTensor (the reference strips values at
    ``src/sageconv_updated.py:86-89``, but GCN-style normalizations and
    weighted graphs need them).  ``w`` is over the graph's canonical
    (receiver-sorted, padded) edge order, like ``spmm``'s ``edge_weight``;
    entries past ``num_edges`` are ignored.  dx rides the kernel; dw is the
    per-edge SDDMM dot <g[recv], x[send]>.
    """
    key = (graph.cache_token, reduce, "w")
    hit = _SEG_FN_CACHE.get(key)
    if hit is not None:
        return hit
    if isinstance(graph.senders, jax.core.Tracer):
        raise RuntimeError(
            "weighted blocked-segsum layout not built for this graph; call "
            "prepare_segsum(graph, weighted=True) outside jit first"
        )
    e = graph.num_edges
    n = graph.num_nodes
    recv = np.asarray(jax.device_get(graph.receivers))[:e]
    send = np.asarray(jax.device_get(graph.senders))[:e]
    assert graph.receiver_sorted, "canonical graphs are receiver-sorted"
    lay_f = build_blocked_layout(recv, send, n, edge_ids=np.arange(e))
    # Backward: the same canonical edges re-sorted by sender, keeping each
    # slot's canonical edge id so the SAME weight vector serves both passes.
    order = np.argsort(send, kind="stable")
    lay_b = build_blocked_layout(send[order], recv[order], n, edge_ids=order)
    inv_deg = jnp.asarray(
        1.0 / np.maximum(np.asarray(jax.device_get(graph.in_degree), np.float32), 1.0)
    )
    recv_c = jnp.asarray(recv.astype(np.int32))
    send_c = jnp.asarray(send.astype(np.int32))

    def _w_ext(w):
        # Canonical weights + a trailing 0 that pad slots (slot_edge == e) hit.
        return jnp.concatenate(
            [w[:e].astype(jnp.float32), jnp.zeros((1,), jnp.float32)]
        )

    def fwd_impl(x, w):
        out = _segment_sum_arrays(
            x, lay_f.senders, lay_f.local_ids, lay_f.block_r0,
            num_blocks=lay_f.num_blocks, n_out_pad=lay_f.n_out_pad,
            num_segments=n, slot_weights=jnp.take(_w_ext(w), lay_f.slot_edge),
        )
        if reduce == "mean":
            out = out * inv_deg[:, None]
        return out.astype(x.dtype)

    @jax.custom_vjp
    def f(x, w):
        return fwd_impl(x, w)

    def f_fwd(x, w):
        return fwd_impl(x, w), (x, w)

    def f_bwd(res, g):
        x, w = res
        gf = g.astype(jnp.float32)
        if reduce == "mean":
            gf = gf * inv_deg[:, None]
        dx = _segment_sum_arrays(
            gf, lay_b.senders, lay_b.local_ids, lay_b.block_r0,
            num_blocks=lay_b.num_blocks, n_out_pad=lay_b.n_out_pad,
            num_segments=n, slot_weights=jnp.take(_w_ext(w), lay_b.slot_edge),
        ).astype(g.dtype)
        # dw[e] = <g_scaled[recv[e]], x[send[e]]> on real edges, 0 on padding.
        dwe = jnp.sum(
            jnp.take(gf, recv_c, axis=0)
            * jnp.take(x, send_c, axis=0).astype(jnp.float32),
            axis=1,
        )
        dw = jnp.zeros(w.shape, w.dtype).at[:e].set(dwe.astype(w.dtype))
        return dx, dw

    f.defvjp(f_fwd, f_bwd)
    _SEG_FN_CACHE[key] = f
    return f


def prepare_segsum(graph, weighted: bool = False) -> None:
    """Pre-build both directions' layouts + vjp'd fns (outside jit)."""
    get_blocked_spmm_fn(graph, "mean")
    get_blocked_spmm_fn(graph, "sum")
    if weighted:
        get_blocked_spmm_weighted_fn(graph, "mean")
        get_blocked_spmm_weighted_fn(graph, "sum")


def attach_segsum(graph):
    """Build both directions' layouts and ATTACH them to the graph as
    pytree fields (``graph.seg`` arrays + static ``graph.seg_meta``) —
    the argument-passed alternative to :func:`prepare_segsum`'s
    token-cached closures.

    Why this exists: a closure-captured device array is serialized as an
    HLO constant into every jit that uses it.  On a remote-compile runtime
    (axon) the layouts of a 70M-edge graph are ~1.1 GB of constants — an
    impossible upload — while as jit ARGUMENTS they ship once as device
    buffers.  ``spmm(impl="segsum")`` prefers ``graph.seg`` when present
    (unweighted sum/mean; other cases fall through to the cached path).

    Returns the new Graph (outside jit only).
    """
    if isinstance(graph.senders, jax.core.Tracer):
        raise RuntimeError("attach_segsum must run outside jit")
    e, n = graph.num_edges, graph.num_nodes
    recv = np.asarray(jax.device_get(graph.receivers))[:e]
    send = np.asarray(jax.device_get(graph.senders))[:e]
    assert graph.receiver_sorted, "canonical graphs are receiver-sorted"
    lay_f = build_blocked_layout(recv, send, n)
    csr_row = np.asarray(jax.device_get(graph.csr_row))[:e]
    col = np.asarray(jax.device_get(graph.col))[:e]
    lay_b = build_blocked_layout(csr_row, col, n)
    return graph.replace(
        seg=(
            (lay_f.senders, lay_f.local_ids, lay_f.block_r0),
            (lay_b.senders, lay_b.local_ids, lay_b.block_r0),
        ),
        seg_meta=(
            (lay_f.num_blocks, lay_f.n_out_pad),
            (lay_b.num_blocks, lay_b.n_out_pad),
        ),
    )


def _float0_zero(a):
    import jax.dtypes

    return np.zeros(np.shape(a), jax.dtypes.float0)


def spmm_segsum_args(graph, x: jnp.ndarray, reduce: str) -> jnp.ndarray:
    """Windowed-segsum SpMM over ARGUMENT-PASSED layouts (``graph.seg``).

    Works with a fully traced graph: the layout arrays are jaxpr variables,
    never HLO constants.  custom-vjp'd like the cached path (backward =
    the transposed-direction kernel).  When ``x`` is bf16 the kernel's HBM
    out buffer is bf16 too (fp32 VMEM accumulation, one round per window
    store) — at N=10M/D=128 that halves the biggest transient of the step.
    """
    if reduce not in ("sum", "mean"):
        raise ValueError(f"segsum arg path supports sum/mean, got {reduce!r}")
    (nbf, npf), (nbb, npb) = graph.seg_meta
    n = graph.num_nodes
    mean = reduce == "mean"
    x_dtype = x.dtype
    out_dtype = jnp.bfloat16 if x_dtype == jnp.bfloat16 else jnp.float32

    def _scale(o, in_degree):
        if not mean:
            return o
        inv = 1.0 / jnp.maximum(in_degree.astype(jnp.float32), 1.0)
        return o * inv[:, None].astype(o.dtype)

    def _prim(x, in_degree, sf, lf, rf):
        o = _segment_sum_arrays(
            x, sf, lf, rf, num_blocks=nbf, n_out_pad=npf, num_segments=n,
            out_dtype=out_dtype,
        )
        return _scale(o, in_degree).astype(x.dtype)

    @jax.custom_vjp
    def f(x, in_degree, sf, lf, rf, sb, lb, rb):
        return _prim(x, in_degree, sf, lf, rf)

    def f_fwd(x, in_degree, sf, lf, rf, sb, lb, rb):
        return (
            _prim(x, in_degree, sf, lf, rf),
            (in_degree, sf, lf, rf, sb, lb, rb),
        )

    def f_bwd(res, g):
        in_degree, sf, lf, rf, sb, lb, rb = res
        xdt = x_dtype  # static python value from the enclosing call
        gs = _scale(g, in_degree).astype(g.dtype) if mean else g
        dx = _segment_sum_arrays(
            gs, sb, lb, rb, num_blocks=nbb, n_out_pad=npb, num_segments=n,
            out_dtype=out_dtype,
        ).astype(xdt)
        # layout/degree args are integer-valued: their cotangents are float0
        return (dx,) + tuple(
            _float0_zero(a) for a in (in_degree, sf, lf, rf, sb, lb, rb)
        )

    f.defvjp(f_fwd, f_bwd)
    (sf, lf, rf), (sb, lb, rb) = graph.seg
    return f(x, graph.in_degree, sf, lf, rf, sb, lb, rb)


def spmm_segsum(
    graph, x: jnp.ndarray, reduce: str, edge_weight: jnp.ndarray | None = None
) -> jnp.ndarray:
    if reduce == "max":
        # MEASURED REJECTION of a windowed max variant (round 3,
        # scripts/heavy_r3.py phase A, 413k x 256 on v5e): XLA sorted
        # segment-max 11.7 ms vs XLA sorted sum 8.1 vs this kernel's sum
        # 3.6 vs the bare sender gather 3.1 — a max kernel could plausibly
        # claw ~3x, BUT the one-hot MXU reduction doesn't express max (it
        # would need an in-window masked-scan formulation), and NOTHING in
        # the protocol calls it: the reference's hot path is reduce='mean'
        # only (reference src/sageconv_updated.py:86-89); 'max' exists for
        # torch_sparse.matmul API completeness.  Cost/benefit: rejected.
        from llp_tpu.ops.spmm import _spmm_xla

        return _spmm_xla(graph, x, "max")
    if edge_weight is not None:
        return get_blocked_spmm_weighted_fn(graph, reduce)(x, edge_weight)
    return get_blocked_spmm_fn(graph, reduce)(x)


# ---- edge-partitioned (shard_map) integration --------------------------------


class ShardedSegsumLayouts(NamedTuple):
    """Per-shard blocked layouts, stacked on a leading shard axis.

    Forward: each device's contiguous slice of the receiver-sorted canonical
    COO (still sorted). Backward: the SAME edge shard re-sorted by sender, so
    ``dx_local = A_shard^T g`` also runs through the windowed kernel.  All
    shards are padded to common block counts so one program serves every
    device under ``shard_map``.
    """

    fwd_senders: jnp.ndarray  # (P, Bf*BE) int32
    fwd_local: jnp.ndarray    # (P, Bf8, BE) int32 (rows padded to 8)
    fwd_r0: jnp.ndarray       # (P, Bf) int32
    bwd_senders: jnp.ndarray  # (P, Bb*BE) int32 — gather indices (receivers)
    bwd_local: jnp.ndarray    # (P, Bb8, BE) int32 — window-local senders
    bwd_r0: jnp.ndarray       # (P, Bb) int32
    num_blocks_f: int         # static, max over shards
    num_blocks_b: int
    n_out_pad: int
    num_shards: int


def _pad_stack(layouts, num_blocks: int):
    """Pad per-shard BlockedSegsumLayouts to ``num_blocks`` and stack."""
    s_list, l_list, r_list = [], [], []
    for lay in layouts:
        pad_b = num_blocks - lay.num_blocks
        s = np.asarray(lay.senders)
        l = np.asarray(lay.local_ids)
        r = np.asarray(lay.block_r0)
        if pad_b:
            s = np.concatenate([s, np.zeros((pad_b * BE,), np.int32)])
            r = np.concatenate([r, np.zeros((pad_b,), np.int32)])
        rows = ((num_blocks + 7) // 8) * 8
        if l.shape[0] != rows:
            # Per-shard rows are round8(b_i) <= round8(max): only padding is
            # possible here; truncation would silently drop block rows.
            assert l.shape[0] <= rows, (l.shape, rows)
            l = np.concatenate(
                [l, np.full((rows - l.shape[0], BE), RMAX, np.int32)]
            )
        s_list.append(s)
        l_list.append(l)
        r_list.append(r)
    return (
        jnp.asarray(np.stack(s_list)),
        jnp.asarray(np.stack(l_list)),
        jnp.asarray(np.stack(r_list)),
    )


def build_shard_layouts(graph, num_shards: int) -> ShardedSegsumLayouts:
    """Host-side prep for the sharded kernel path (call outside jit).

    The sharded train steps split the PADDED edge arrays into ``num_shards``
    contiguous chunks; this builds each chunk's forward (receiver-sorted, as
    stored) and backward (sender-re-sorted) window layouts.  Padded edges
    carry receiver ``n`` and are routed to output rows >= n (sliced away);
    for the backward sort they are masked to segment ``n`` likewise.
    """
    n = graph.num_nodes
    e_pad = graph.num_padded_edges
    if e_pad % num_shards:
        raise ValueError(f"padded edge count {e_pad} not divisible by {num_shards}")
    chunk = e_pad // num_shards
    send = np.asarray(jax.device_get(graph.senders))
    recv = np.asarray(jax.device_get(graph.receivers))
    mask = np.asarray(jax.device_get(graph.edge_mask))

    fwd, bwd = [], []
    for s in range(num_shards):
        sl = slice(s * chunk, (s + 1) * chunk)
        cs, cr, cm = send[sl], recv[sl], mask[sl]
        fwd.append(build_blocked_layout(cr.astype(np.int64), cs, n))
        # Backward: this shard's edges sorted by sender; padded edges pushed
        # to segment n (out of the sliced output).
        seg_b = np.where(cm, cs, n).astype(np.int64)
        idx_b = np.where(cm, cr, 0).astype(np.int64)
        order = np.argsort(seg_b, kind="stable")
        bwd.append(build_blocked_layout(seg_b[order], idx_b[order], n))

    nb_f = max(l.num_blocks for l in fwd)
    nb_b = max(l.num_blocks for l in bwd)
    fs, fl, fr = _pad_stack(fwd, nb_f)
    bs, bl, br = _pad_stack(bwd, nb_b)
    return ShardedSegsumLayouts(
        fs, fl, fr, bs, bl, br, nb_f, nb_b, fwd[0].n_out_pad, num_shards
    )


def make_local_blocked_sum(layouts: ShardedSegsumLayouts, num_nodes: int):
    """Device-local sum-SpMM over one edge shard, kernel-accelerated in both
    directions; differentiable (custom VJP).  For use INSIDE ``shard_map``:

        partial = f(x, fs, fl, fr0, bs, bl, br0)   # (N, D) fp32 partial sums
        out = psum(partial, axis)                  # caller merges + scales

    where the layout slices are the device's rows of the stacked arrays.
    """
    nb_f, nb_b = layouts.num_blocks_f, layouts.num_blocks_b
    n_out_pad = layouts.n_out_pad

    def _f0(a):
        return np.zeros(a.shape, jax.dtypes.float0)

    @jax.custom_vjp
    def f(x, fs, fl, fr0, bs, bl, br0):
        return _segment_sum_arrays(
            x, fs, fl, fr0,
            num_blocks=nb_f, n_out_pad=n_out_pad, num_segments=num_nodes,
        )

    def f_fwd(x, fs, fl, fr0, bs, bl, br0):
        res = (fs, fl, fr0, bs, bl, br0, jnp.zeros((0,), x.dtype))
        return f(x, fs, fl, fr0, bs, bl, br0), res

    def f_bwd(res, g):
        fs, fl, fr0, bs, bl, br0, proto = res
        dx = _segment_sum_arrays(
            g.astype(proto.dtype), bs, bl, br0,
            num_blocks=nb_b, n_out_pad=n_out_pad, num_segments=num_nodes,
        )
        return (
            dx.astype(proto.dtype),
            _f0(fs), _f0(fl), _f0(fr0), _f0(bs), _f0(bl), _f0(br0),
        )

    f.defvjp(f_fwd, f_bwd)
    return f
