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

    ``bits=8``: ``q`` is (N, H) int8 codes.  ``bits=4``: ``q`` is (N, H/2)
    uint8 with two two's-complement nibbles per byte (low nibble = even
    column) — 8x less table HBM than fp32.  ``scale``: (N,) float32 per-row
    dequant factor (``h ≈ codes * scale[:, None]``).
    """

    q: jnp.ndarray
    scale: jnp.ndarray
    bits: int = struct.field(pytree_node=False, default=8)

    @property
    def shape(self) -> Tuple[int, int]:  # LOGICAL shape (N, H)
        n, w = self.q.shape
        return (n, w * 2) if self.bits == 4 else (n, w)

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


def pack_int4(codes: jnp.ndarray) -> jnp.ndarray:
    """(M, H) int8 codes in [-7, 7] -> (M, H/2) uint8 two's-complement
    nibbles (low nibble = even column).  H must be even."""
    if codes.shape[-1] % 2:
        raise ValueError(
            f"int4 packing needs an even hidden dim, got H={codes.shape[-1]} "
            "(quantize='int8' supports any width)"
        )
    u = codes.astype(jnp.uint8) & jnp.uint8(0xF)
    return u[..., 0::2] | (u[..., 1::2] << 4)


def unpack_int4(packed: jnp.ndarray) -> jnp.ndarray:
    """(M, H/2) uint8 -> (M, H) int8 codes (sign-extended nibbles)."""
    lo = (packed & jnp.uint8(0xF)).astype(jnp.int8)
    hi = (packed >> 4).astype(jnp.int8)
    lo = jnp.where(lo >= 8, lo - 16, lo)
    hi = jnp.where(hi >= 8, hi - 16, hi)
    out = jnp.stack([lo, hi], axis=-1)  # (..., H/2, 2)
    return out.reshape(*packed.shape[:-1], packed.shape[-1] * 2)


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
    """Gather UNPACKED int8 codes for arbitrary rows (int4 unpacks after
    the gather — the HBM read stays packed)."""
    rows = jnp.take(table.q, idx, axis=0)
    return unpack_int4(rows) if table.bits == 4 else rows


def codes_slice(table: QuantTable, start, size: int) -> jnp.ndarray:
    """UNPACKED int8 codes for a contiguous row block."""
    rows = jax.lax.dynamic_slice_in_dim(table.q, start, size, axis=0)
    return unpack_int4(rows) if table.bits == 4 else rows


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
    n = table.q.shape[0]
    n_pad = -(-n // pad_to) * pad_to
    qp = table.q
    sp = table.scale
    if n_pad != n:  # pad the PACKED codes, then unpack once (padding after
        # unpacking would hold two full unpacked copies live at once)
        qp = jnp.concatenate(
            [qp, jnp.zeros((n_pad - n, qp.shape[1]), qp.dtype)], axis=0
        )
        sp = jnp.concatenate([sp, jnp.zeros((n_pad - n,), jnp.float32)])
    if table.bits == 4:
        # Whole-table unpack (transient (N, H) int8): acceptable here only
        # because top_k_partners routes int4 tables to the BLOCKED path
        # (per-block unpack); this function serves direct callers/tests.
        qp = unpack_int4(qp)
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
            np.asarray(unpack_int4(h.q)) if h.bits == 4 else np.asarray(h.q)
        )
        return codes.astype(np.float32) * np.asarray(h.scale)[:, None]
    return np.asarray(h, np.float32)
