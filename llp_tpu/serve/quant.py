"""Int8-quantized embedding tables for serving.

Per-row symmetric int8 quantization shrinks a serving table 4× (collab's
236k × 256 fp32 = 241MB → 61MB incl. the scale vector).  Measured on the
TPU chip (scripts/bench_quant.py, round 2): the memory is the headline —
4× bigger tables per chip (or 4× fewer shards) at a ~1pp recall cost
(recall@10 vs fp32-exact: 0.963 int8+approx vs 0.973 fp32+approx; score
maxerr ≤2e-4 — exact retrieval reorders only near-ties).
Speed: 1M-pair scoring 39.6 → 33.7 ms (1.17×, right AT the bare-gather
floor BASELINE.md records); retrieval is NEUTRAL — 'inner' single-pass is
ApproxTopK-dominated and 'mlp' is FLOP-bound, so the table format doesn't
move either (the int8 MXU dot path is kept because it matches fp32 speed
while reading a 4×-smaller table).

Scheme: ``q[i] = round(h[i] / s_i)`` with ``s_i = max|h[i]| / 127`` (per-row
absmax; zero rows get s=1 so q=0 exactly).  Dequantized scoring uses
``q[i]·s_i``; the int8 dot path computes ``<h_a, h_b> ≈ s_a·s_b·<q_a, q_b>``
with the int32-exact integer dot.  Per-element error is bounded by ``s_i/2 =
max|h_i|/254`` (<0.2% of the row's dynamic range), so sigmoid link scores
move by O(1e-3) — parity/recall gates in ``tests/test_quant.py``.

The reference has no serving layer at all (SURVEY §1); this extends the
llp_tpu serving subsystem (``serve/engine.py``) the TPU-native way: quantized
tables are a deployment memory/bandwidth format, training stays fp32.
"""

from __future__ import annotations

import functools
from typing import Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class QuantTable:
    """Per-row symmetric int8 / packed-int4 embedding table (a jit-able
    pytree).

    ``bits=8``: ``q`` is (N, H) int8 codes.  ``bits=4``: ``q`` is
    LANE-PACKED (ceil(N/2), H) uint8 — two two's-complement nibbles per
    byte (low nibble = even column) and TWO logical rows per storage row
    (row ``r`` occupies bytes ``[(r%2)·H/2, (r%2+1)·H/2)`` of storage row
    ``r//2``) — 8x less table HBM than fp32.  The storage minor dim stays
    the logical H, so the TPU (8,128)-lane tiling pads nothing at H>=128;
    the naive (N, H/2) column layout tiled 2x at H=128 AND provoked a full
    transposed XLA copy — +12 GB on the 100M-row scale check (the same
    layout-padding class as the round-3 segsum local_ids bug).
    ``scale``: (N,) float32 per-row dequant factor (``h ≈ codes *
    scale[:, None]``); its length carries the logical N for bits=4.
    """

    q: jnp.ndarray
    scale: jnp.ndarray
    bits: int = struct.field(pytree_node=False, default=8)

    @property
    def shape(self) -> Tuple[int, int]:  # LOGICAL shape (N, H)
        if self.bits == 4:
            return (self.scale.shape[0], self.q.shape[1])
        return self.q.shape

    @property
    def dtype(self):  # tables report their STORAGE dtype
        return self.q.dtype

    @property
    def fmt(self) -> str:
        return f"int{self.bits}"

    @property
    def nbytes(self) -> int:
        return int(self.q.size * self.q.dtype.itemsize + self.scale.size * 4)


TableLike = Union[jnp.ndarray, QuantTable]


def _levels(bits: int) -> int:
    if bits == 8:
        return 127
    if bits == 4:
        return 7
    raise ValueError(f"bits must be 8 or 4, got {bits}")


def _pack_nibbles(codes: jnp.ndarray) -> jnp.ndarray:
    """(..., W) int8 in [-7, 7] -> (..., W/2) uint8 (low nibble = even col)."""
    if codes.shape[-1] % 2:
        raise ValueError(
            f"int4 packing needs an even hidden dim, got H={codes.shape[-1]} "
            "(quantize='int8' supports any width)"
        )
    u = codes.astype(jnp.uint8) & jnp.uint8(0xF)
    return u[..., 0::2] | (u[..., 1::2] << 4)


def _unpack_nibbles(packed: jnp.ndarray) -> jnp.ndarray:
    """(..., W) uint8 -> (..., 2W) int8 codes (sign-extended nibbles)."""
    lo = (packed & jnp.uint8(0xF)).astype(jnp.int8)
    hi = (packed >> 4).astype(jnp.int8)
    lo = jnp.where(lo >= 8, lo - 16, lo)
    hi = jnp.where(hi >= 8, hi - 16, hi)
    out = jnp.stack([lo, hi], axis=-1)  # (..., W, 2)
    return out.reshape(*packed.shape[:-1], packed.shape[-1] * 2)


def pack_int4(codes: jnp.ndarray) -> jnp.ndarray:
    """(M, H) int8 codes in [-7, 7] -> lane-packed (ceil(M/2), H) uint8.

    Byte layout: nibble-pack each row to H/2 bytes, then place logical rows
    2k and 2k+1 side by side in storage row k (a pure C-order reshape of
    the (M, H/2) nibble array — the linearizations coincide).  Odd M pads
    one zero half-row.  H must be even.
    """
    m = codes.shape[0]
    nib = _pack_nibbles(codes)  # (M, H/2)
    if m % 2:
        nib = jnp.concatenate(
            [nib, jnp.zeros((1, nib.shape[1]), jnp.uint8)], axis=0
        )
    return nib.reshape((m + 1) // 2, codes.shape[1])


def unpack_int4(packed: jnp.ndarray, num_rows: int | None = None) -> jnp.ndarray:
    """Lane-packed (R, H) uint8 -> (num_rows or 2R, H) int8 codes."""
    r, h_dim = packed.shape
    codes = _unpack_nibbles(packed.reshape(2 * r, h_dim // 2))
    return codes if num_rows is None else codes[:num_rows]


def quantize_rows(
    h: jnp.ndarray, bits: int = 8
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-row absmax quantization: ``(codes, scales)`` for (M, H) rows.

    Codes are UNPACKED int8 in [-L, L] (L = 127 for int8, 7 for int4).
    Traceable expression (no jit wrapper) so it composes inside shard_map /
    other jitted programs.  Requantizing rows that were DEQUANTIZED from an
    absmax table is exact at either width: a dequantized row is ``q * s``
    with ``max|q| = L``, so its absmax is ``L s`` and the recovered scale
    and codes equal the originals bit-for-bit (zero rows keep s=1, q=0).
    """
    lv = _levels(bits)
    a = jnp.max(jnp.abs(h.astype(jnp.float32)), axis=1)
    scale = jnp.where(a > 0, a / lv, 1.0)
    q = jnp.round(h.astype(jnp.float32) / scale[:, None])
    return (
        jnp.clip(q, -lv, lv).astype(jnp.int8),
        scale.astype(jnp.float32),
    )


@functools.partial(jax.jit, static_argnames=("bits",))
def quantize_table(h: jnp.ndarray, bits: int = 8) -> QuantTable:
    """Per-row absmax quantization of an (N, H) embedding table.

    ``bits=8``: int8 codes (4x less HBM than fp32, ~1pp recall@10 cost —
    BASELINE.md).  ``bits=4``: packed nibbles (8x less HBM; recall cost
    measured in tests/test_quant.py + BASELINE.md int4 section).
    """
    q, scale = quantize_rows(h, bits)
    if bits == 4:
        q = pack_int4(q)
    return QuantTable(q=q, scale=scale, bits=bits)


def codes_rows(table: QuantTable, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather UNPACKED int8 codes for arbitrary rows (int4 gathers the
    PACKED storage row holding the target — the HBM read stays packed)."""
    if table.bits != 4:
        return jnp.take(table.q, idx, axis=0)
    h_dim = table.q.shape[1]
    rows = jnp.take(table.q, idx // 2, axis=0)  # (M, H) u8: two logical rows
    halves = rows.reshape(idx.shape[0], 2, h_dim // 2)
    sel = jnp.take_along_axis(
        halves, (idx % 2).astype(jnp.int32)[:, None, None], axis=1
    )[:, 0]  # (M, H/2) — this row's nibble bytes
    return _unpack_nibbles(sel)


def codes_slice(table: QuantTable, start, size: int) -> jnp.ndarray:
    """UNPACKED int8 codes for a contiguous row block (``start`` may be a
    traced scalar; ``size`` is static)."""
    if table.bits != 4:
        return jax.lax.dynamic_slice_in_dim(table.q, start, size, axis=0)
    r_total, h_dim = table.q.shape
    # Storage slice covering logical rows [start, start+size) for ANY start
    # parity: size//2 + 1 storage rows, clamped in-bounds; the clamp shifts
    # the logical offset, which the final static-size slice absorbs.
    # (the +1 covers odd starts; when the whole storage is smaller — a
    # tiny shard read in one block — start is necessarily 0 and even)
    rs = min(size // 2 + 1, r_total)
    r0 = jnp.maximum(0, jnp.minimum(start // 2, r_total - rs))
    raw = jax.lax.dynamic_slice_in_dim(table.q, r0, rs, axis=0)  # (rs, H)
    codes = _unpack_nibbles(raw.reshape(2 * rs, h_dim // 2))      # (2rs, H)
    return jax.lax.dynamic_slice_in_dim(codes, start - 2 * r0, size, axis=0)


def dequantize_rows(
    table: QuantTable, idx: jnp.ndarray, *, dtype=jnp.float32
) -> jnp.ndarray:
    """Gather + dequantize rows: reads 1/4 (int8) or 1/8 (int4) the bytes
    of an fp32 gather."""
    rows = codes_rows(table, idx).astype(jnp.float32)
    s = jnp.take(table.scale, idx, axis=0)
    return (rows * s[..., None]).astype(dtype)


def dequantize_slice(
    table: QuantTable, start, size: int, *, dtype=jnp.float32
) -> jnp.ndarray:
    """Dequantize a contiguous row block (the retrieval candidate slice)."""
    rows = codes_slice(table, start, size).astype(jnp.float32)
    s = jax.lax.dynamic_slice_in_dim(table.scale, start, size, axis=0)
    return (rows * s[:, None]).astype(dtype)


# Largest int4 table int8_dot_scores will transiently unpack to (N, H) int8
# for its single whole-table matmul; bigger tables must use the blocked
# retrieval path (per-block unpack).  Module-level so tests can shrink it.
_INT4_UNPACK_MAX_BYTES = 256 * (1 << 20)


def int8_dot_scores(
    table: QuantTable, query_idx: jnp.ndarray, *, pad_to: int = 512
) -> jnp.ndarray:
    """All-pairs dot products ``<h_q, h_c>`` for query rows vs the WHOLE
    table, scored on the MXU int8 path.

    Returns (Q, N_pad) float32 — the integer (Q,H)×(H,N) matmul accumulates
    in int32 (exact: |q|≤127, H≤65k keeps the dot within int32), then the
    rank-1 scale grid ``s_q s_c`` restores magnitudes.  N pads to
    ``pad_to`` with zero rows (score contribution 0, maskable by id).
    """
    n = table.shape[0]
    n_pad = -(-n // pad_to) * pad_to
    if table.bits == 4:
        # Whole-table unpack (transient (N, H) int8): acceptable here only
        # because top_k_partners routes int4 tables to the BLOCKED path
        # (per-block unpack); this function serves direct callers/tests.
        # At the scales int4 exists for (10M-100M rows) that transient is
        # the exact full-table-copy class the blocked path eliminates
        # (~12.8 GB at 100M x 128) — refuse rather than OOM the chip.
        if n * table.shape[1] > _INT4_UNPACK_MAX_BYTES:
            raise ValueError(
                f"int8_dot_scores would unpack the ENTIRE int4 table to a "
                f"({n}, {table.shape[1]}) int8 transient "
                f"({n * table.shape[1] / 2**30:.1f} GiB); use "
                f"top_k_partners / the blocked retrieval path for large "
                f"int4 tables (per-block unpack keeps the packed format's "
                f"memory edge)."
            )
        qp = unpack_int4(table.q, num_rows=n)
    else:
        qp = table.q
    sp = table.scale
    if n_pad != n:
        qp = jnp.concatenate(
            [qp, jnp.zeros((n_pad - n, qp.shape[1]), qp.dtype)], axis=0
        )
        sp = jnp.concatenate([sp, jnp.zeros((n_pad - n,), jnp.float32)])
    q_rows = codes_rows(table, query_idx)  # (Q, H) int8
    s_q = jnp.take(table.scale, query_idx, axis=0)  # (Q,)
    dots = jax.lax.dot_general(
        q_rows,
        qp,
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # (Q, N_pad) int32, exact
    return dots.astype(jnp.float32) * (s_q[:, None] * sp[None, :])


def table_num_nodes(h: TableLike) -> int:
    return int(h.shape[0])


def table_dim(h: TableLike) -> int:
    return int(h.shape[1])


def as_numpy_dense(h: TableLike) -> np.ndarray:
    """Materialize the fp32 view (test/debug aid — O(N·H·4) host bytes)."""
    if isinstance(h, QuantTable):
        codes = (
            np.asarray(unpack_int4(h.q, num_rows=h.shape[0]))
            if h.bits == 4 else np.asarray(h.q)
        )
        return codes.astype(np.float32) * np.asarray(h.scale)[:, None]
    return np.asarray(h, np.float32)
