"""Fused 'mlp'-decoder retrieval scoring: Hadamard→MLP→logits in VMEM.

The retrieval hot path for the 'mlp' link predictor scores every (query,
candidate) pair through the reference ``LinkPredictor`` head (reference
``src/models.py:139-150``): ``MLP(h_q ⊙ h_c)``.  A naive XLA lowering of a
(Q, B) score tile materializes the hidden activation ``z1 = relu((q⊙c)@W1)``
of shape (Q, B, F) in HBM — 30.8 GB of bf16 round-trip at Q=256, N=235k,
F=256.  This kernel keeps it in VMEM by construction: grid over
(candidate-tile, query-tile); each cell computes the Hadamard expansion, the
full Linear/ReLU stack, and the final logit on-chip, writing only the
(TQ, TB) logit tile.  Per-tile work is one MXU-shaped ``(TQ·TB, H) @ (H,
F)`` matmul per layer.

MEASURED OUTCOME (round 3, scripts/bench_mlp_fused{,2}.py — why this is an
OPT-IN, not the default): XLA performs the same fusion on its own at the
engine's default tile sizes.  At block ≤ 8192 the XLA expression runs at
~150 TFLOP/s effective (51.7 ms at Q=256/N=235k fp32; 553 ms at 10M int8)
and falls off a cliff at block=16384 (191 ms) — the round-2 "z1-traffic
wall" (102-193 ms) was that cliff, measured at b16k.  This kernel reaches
~116 TFLOP/s (68-76 ms; tile sweep tq∈{4..32}, tb∈{256..1024} — XLA's
internal matmul tiling beats these hand tiles), and stays 1.2x slower at
3-layer heads and 10M int8 too.  Kept as the explicit-control variant
(``top_k_partners(mlp_fused=True)``): deterministic VMEM residency
independent of XLA fusion heuristics, in-kernel int8 dequant, and the
starting point if a future XLA/hardware rev moves the cliff.

Sigmoid is NOT applied (monotone — the caller's top-k merge ranks raw
logits and sigmoids only the k winners, like the blocked 'inner' rewrite).

Int8 tables: the candidate tile arrives as int8 codes + per-row scales and
dequantizes in VMEM (4x less candidate DMA on top).

Grid order: candidate tile index is the OUTER grid dimension, so each
candidate tile is DMA'd once and revisited by all query tiles (Pallas skips
re-copies when a block index is unchanged); weights and the query tile are
small and stay resident.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Default tile sizes: TB=256 candidate rows x TQ=8 queries gives a
# (2048, H) x (H, F) MXU matmul per layer per cell with ~4-8 MB of VMEM
# live at H=F=256 (fp32) — safely under the ~16 MB budget with input
# double-buffering.  Tunable per call; measured sweeps in BASELINE.md.
_TQ = 8
_TB = 256

_LANE = 128  # TPU lane width: last-dim alignment unit


def fused_mlp_supported(lins: Sequence[dict], h_dim: int) -> bool:
    """Shapes the kernel handles: ≥2-layer head, all matmul dims lane-aligned
    (H and every hidden width a multiple of 128), scalar output head.

    Unsupported shapes fall back to the XLA expression in the caller.
    """
    if len(lins) < 2:
        return False  # 1-layer head ≡ a cheap (H,1) matvec; XLA is fine
    if h_dim % _LANE or lins[0]["w"].shape[0] != h_dim:
        return False
    for lin in lins[:-1]:
        if lin["w"].shape[1] % _LANE:
            return False
    return lins[-1]["w"].shape[1] == 1


def fused_mlp_default() -> bool:
    """Auto-routing default: the compiled kernel on TPU backends only (CPU
    interpret mode is far slower than the XLA expression)."""
    return jax.default_backend() in ("tpu", "axon")


def _mlp_tile_kernel(nw: int, quant: bool, tq: int, tb: int):
    """Kernel body factory: ``nw`` linear layers, optional int8 candidates."""

    def kernel(*refs):
        if quant:
            q_ref, c_ref, s_ref = refs[:3]
            w_refs = refs[3 : 3 + 2 * nw]
        else:
            q_ref, c_ref = refs[:2]
            w_refs = refs[2 : 2 + 2 * nw]
        out_ref = refs[-1]

        qv = q_ref[:]                                   # (TQ, H) compute dt
        dt = qv.dtype
        if quant:
            # In-VMEM dequant: int8 codes x per-row scale (scale arrives as
            # a (TB, 1) fp32 column so the multiply broadcasts on lanes).
            cv = (c_ref[:].astype(jnp.float32) * s_ref[:]).astype(dt)
        else:
            cv = c_ref[:].astype(dt)                    # (TB, H)

        h_dim = qv.shape[1]
        # Hadamard expansion in VMEM: (TQ, TB, H) -> (TQ*TB, H).  This is
        # the tensor whose HBM materialization the kernel exists to avoid.
        x = (qv[:, None, :] * cv[None, :, :]).reshape(tq * tb, h_dim)

        for li in range(nw - 1):
            w, b = w_refs[2 * li][:], w_refs[2 * li + 1][:]
            z = jnp.dot(x, w, preferred_element_type=jnp.float32) + b
            x = jnp.maximum(z, 0.0).astype(dt)
        w, b = w_refs[2 * (nw - 1)][:], w_refs[2 * (nw - 1) + 1][:]
        # Final layer: (TQ*TB, F) x (F, 1) -> logits; keep fp32 for the
        # caller's top-k merge precision.
        logits = jnp.dot(x, w, preferred_element_type=jnp.float32) + b
        out_ref[:] = logits.reshape(tq, tb)

    return kernel


def _pad_dim0(a: jnp.ndarray, mult: int) -> jnp.ndarray:
    pad = (-a.shape[0]) % mult
    if pad:
        a = jnp.concatenate(
            [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], axis=0
        )
    return a


@functools.partial(
    jax.jit, static_argnames=("nw", "quant", "tq", "tb", "interpret")
)
def _mlp_logits_call(q_h, cand, scales, flat_w, *, nw, quant, tq, tb,
                     interpret):
    """Padded pallas_call: q_h (Qp, H), cand (Bp, H[, int8]), scales (Bp, 1)."""
    qp, bp = q_h.shape[0], cand.shape[0]
    h_dim = q_h.shape[1]
    grid = (bp // tb, qp // tq)  # candidate tiles OUTER (one DMA each)

    in_specs = [
        pl.BlockSpec((tq, h_dim), lambda j, i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tb, h_dim), lambda j, i: (j, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [q_h, cand]
    if quant:
        in_specs.append(
            # (tb, 1) tiles to (tb, 128) in VMEM — the same trailing-lane
            # padding class the segsum local_ids fix removed.  ACCEPTED here:
            # tb<=1024 makes it <=512KB/block of VMEM (not HBM) and the scale
            # column is read once per tile; do NOT copy this layout for
            # larger or HBM-resident arrays.
            pl.BlockSpec((tb, 1), lambda j, i: (j, 0),
                         memory_space=pltpu.VMEM)
        )
        args.append(scales)
    for w in flat_w:  # weights/biases: whole-array blocks, resident
        in_specs.append(
            pl.BlockSpec(w.shape, lambda j, i: (0, 0),
                         memory_space=pltpu.VMEM)
        )
        args.append(w)

    return pl.pallas_call(
        _mlp_tile_kernel(nw, quant, tq, tb),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tq, tb), lambda j, i: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((qp, bp), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * qp * bp * sum(
                int(flat_w[2 * li].shape[0]) * int(flat_w[2 * li].shape[1])
                for li in range(nw)
            ),
            bytes_accessed=(
                cand.size * cand.dtype.itemsize
                + q_h.size * q_h.dtype.itemsize * grid[0]
                + qp * bp * 4
            ),
            transcendentals=0,
        ),
    )(*args)


def _prep_weights(lins, dtype):
    """Flatten [{w,b}...] into (w, b-as-(1,F)) pairs in the compute dtype
    (biases stay fp32: they add onto the fp32 accumulator)."""
    flat = []
    for lin in lins:
        flat.append(lin["w"].astype(dtype))
        flat.append(lin["b"].reshape(1, -1).astype(jnp.float32))
    return tuple(flat)


def mlp_block_logits(
    lins: Sequence[dict],
    q_h: jnp.ndarray,
    cand: jnp.ndarray,
    *,
    scales: Optional[jnp.ndarray] = None,
    tq: int = _TQ,
    tb: int = _TB,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Raw 'mlp'-decoder logits for all (query, candidate) pairs: (Q, B) f32.

    ``q_h`` (Q, H) dense query embeddings in the compute dtype; ``cand``
    (B, H) dense candidates OR int8 codes with ``scales`` (B,) per-row
    dequant factors.  Equals ``logit(apply_link_predictor(...))`` up to the
    deferred sigmoid; the caller masks invalid columns and applies sigmoid
    to its winners.  Pads Q to ``tq`` and B to ``tb`` internally.
    """
    if interpret is None:
        interpret = not fused_mlp_default()
    q, b = q_h.shape[0], cand.shape[0]
    quant = scales is not None
    qp = _pad_dim0(q_h, tq)
    cp = _pad_dim0(cand, tb)
    sp = None
    if quant:
        sp = _pad_dim0(scales.reshape(-1, 1).astype(jnp.float32), tb)
    flat_w = _prep_weights(lins, q_h.dtype)
    out = _mlp_logits_call(
        qp, cp, sp, flat_w, nw=len(lins), quant=quant, tq=tq, tb=tb,
        interpret=interpret,
    )
    return out[:q, :b]
