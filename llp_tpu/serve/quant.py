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

from typing import Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class QuantTable:
    """Per-row symmetric int8 embedding table (a jit-able pytree).

    ``q``: (N, H) int8 codes; ``scale``: (N,) float32 per-row dequant factor
    (``h ≈ q * scale[:, None]``).
    """

    q: jnp.ndarray
    scale: jnp.ndarray

    @property
    def shape(self) -> Tuple[int, int]:
        return self.q.shape

    @property
    def dtype(self):  # tables report their STORAGE dtype
        return self.q.dtype

    @property
    def nbytes(self) -> int:
        return int(self.q.size + self.scale.size * 4)


TableLike = Union[jnp.ndarray, QuantTable]


def quantize_rows(h: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-row absmax int8 quantization: ``(codes, scales)`` for (M, H) rows.

    Traceable expression (no jit wrapper) so it composes inside shard_map /
    other jitted programs.  Requantizing rows that were DEQUANTIZED from an
    absmax table is exact: a dequantized row is ``q * s`` with
    ``max|q| = 127``, so its absmax is ``127 s`` and the recovered scale and
    codes equal the originals bit-for-bit (zero rows keep s=1, q=0).
    """
    a = jnp.max(jnp.abs(h.astype(jnp.float32)), axis=1)
    scale = jnp.where(a > 0, a / 127.0, 1.0)
    q = jnp.round(h.astype(jnp.float32) / scale[:, None])
    return (
        jnp.clip(q, -127, 127).astype(jnp.int8),
        scale.astype(jnp.float32),
    )


@jax.jit
def quantize_table(h: jnp.ndarray) -> QuantTable:
    """Per-row absmax int8 quantization of an (N, H) embedding table."""
    q, scale = quantize_rows(h)
    return QuantTable(q=q, scale=scale)


def dequantize_rows(
    table: QuantTable, idx: jnp.ndarray, *, dtype=jnp.float32
) -> jnp.ndarray:
    """Gather + dequantize rows: reads 1/4 the bytes of an fp32 gather."""
    rows = jnp.take(table.q, idx, axis=0).astype(jnp.float32)
    s = jnp.take(table.scale, idx, axis=0)
    return (rows * s[..., None]).astype(dtype)


def dequantize_slice(
    table: QuantTable, start, size: int, *, dtype=jnp.float32
) -> jnp.ndarray:
    """Dequantize a contiguous row block (the retrieval candidate slice)."""
    rows = jax.lax.dynamic_slice_in_dim(table.q, start, size, axis=0)
    s = jax.lax.dynamic_slice_in_dim(table.scale, start, size, axis=0)
    return (rows.astype(jnp.float32) * s[:, None]).astype(dtype)


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
    n, h_dim = table.q.shape
    n_pad = -(-n // pad_to) * pad_to
    qp = table.q
    sp = table.scale
    if n_pad != n:
        qp = jnp.concatenate(
            [qp, jnp.zeros((n_pad - n, h_dim), jnp.int8)], axis=0
        )
        sp = jnp.concatenate([sp, jnp.zeros((n_pad - n,), jnp.float32)])
    q_rows = jnp.take(table.q, query_idx, axis=0)  # (Q, H) int8
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
        return np.asarray(h.q, np.float32) * np.asarray(h.scale)[:, None]
    return np.asarray(h, np.float32)
