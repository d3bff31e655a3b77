"""Fused SDDMM edge scoring — Hadamard → MLP head → sigmoid in one kernel.

TPU-native replacement for the reference ``LinkPredictor.forward`` decoder
hot path (reference ``src/models.py:139-150``): given gathered endpoint
embeddings, compute ``sigmoid(W2 · relu(W1 · (hi ⊙ hj) + b1) + b2)`` without
materializing the Hadamard product or the hidden activations in HBM — both
live only in VMEM tiles.

Design notes (measured on v5e-1, BASELINE.md roofline section):

* The endpoint GATHER stays in XLA — its hardware gather runs at ~500 GB/s
  and no Pallas primitive can beat per-row DMA for random rows.
* The TRAINING backward is intentionally NOT a kernel: the bwd is dominated
  by the 2B-row random scatter into dh plus matmul FLOPs, both at their
  hardware floor; a fused bwd's recompute costs what residual reloads save.
  This kernel therefore targets the forward/evaluation path (where it saves
  the z and z1 HBM round-trips — the evaluators score every split per epoch)
  and carries a custom VJP that falls back to the XLA expression so training
  through it stays correct.
* The 1-wide output projection is a VPU reduction (``sum(z1 * w2)``), not a
  degenerate (H, 1) MXU matmul.

Shapes: 2-layer head (the reference hardcodes predictor depth 2 for the
teacher, ``train_teacher_gnn.py:391-392``), D and H multiples of 128,
out_channels 1.  Anything else routes to the XLA expression.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TP = 1024  # pairs per tile


def _kernel(hi_ref, hj_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref):
    z = hi_ref[...] * hj_ref[...]
    z1 = jax.lax.dot_general(
        z, w1_ref[...],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[...].astype(jnp.float32)
    z1 = jnp.maximum(z1, 0.0)
    logit = jnp.sum(z1 * w2_ref[...].astype(jnp.float32), axis=-1) + b2_ref[0, 0]
    # (TP,) -> the (1, 8, TP//8) output tile (sublane-aligned layout).
    out_ref[...] = jax.nn.sigmoid(logit).reshape(1, 8, TP // 8)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _sddmm_call(hi, hj, w1, b1, w2, b2, *, interpret):
    bp, d = hi.shape
    h = w1.shape[1]
    nb = bp // TP
    grid_spec = pl.GridSpec(
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((TP, d), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TP, d), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, h), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 8, TP // 8), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        ),
    )
    return pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb, 8, TP // 8), jnp.float32),
        interpret=interpret,
    )(hi, hj, w1, b1, w2, b2)


def fused_scoring_default() -> bool:
    """Whether evaluators should opt into the fused scorer (compiled-kernel
    backends only; CPU interpret mode would be slower than XLA)."""
    return jax.default_backend() in ("tpu", "axon")


# The kernel only wins while the table its inputs were gathered from is
# cache-warm: measured 1.08x at (20k, 256) = 20MB, but 0.76x at (235k, 256)
# = 240MB, where execution is gather-bound and XLA's scoring hides entirely
# under the gather while the kernel adds ~10 ms/M pairs on top
# (scripts/bench_scorepairs.py).
_FUSED_TABLE_BYTES = 64 * 1024 * 1024


def fused_profitable(h) -> bool:
    """Whether fused scoring pays off for rows gathered from table ``h``."""
    return (
        fused_scoring_default()
        and h.shape[0] * h.shape[1] * h.dtype.itemsize <= _FUSED_TABLE_BYTES
    )


def fused_supported(lins, hi: jnp.ndarray) -> bool:
    if len(lins) != 2 or "b" not in lins[0] or "b" not in lins[1]:
        return False
    d = hi.shape[-1]
    h = lins[0]["w"].shape[1]
    return (
        hi.ndim == 2
        and d % 128 == 0
        and h % 128 == 0
        and lins[1]["w"].shape[1] == 1
    )


def _xla_reference(lins, hi, hj):
    from llp_tpu.ops.edge_score import hadamard_mlp_score

    return hadamard_mlp_score(lins, hi, hj)


@jax.custom_vjp
def _fused(hi, hj, w1, b1, w2, b2):
    b, d = hi.shape
    bp = ((b + TP - 1) // TP) * TP
    if bp != b:
        pad = ((0, bp - b), (0, 0))
        hi = jnp.pad(hi, pad)
        hj = jnp.pad(hj, pad)
    interpret = not fused_scoring_default()
    out = _sddmm_call(
        hi, hj, w1, b1.reshape(1, -1), w2.reshape(1, -1), b2.reshape(1, 1),
        interpret=interpret,
    )
    return out.reshape(bp)[:b]


def _fused_fwd(hi, hj, w1, b1, w2, b2):
    return _fused(hi, hj, w1, b1, w2, b2), (hi, hj, w1, b1, w2, b2)


def _fused_bwd(res, g):
    # Rare path (training through the fused scorer): differentiate the
    # equivalent XLA expression — the measured-at-floor backward.
    hi, hj, w1, b1, w2, b2 = res

    def ref(hi, hj, w1, b1, w2, b2):
        lins = [{"w": w1, "b": b1}, {"w": w2, "b": b2}]
        return _xla_reference(lins, hi, hj)

    _, vjp = jax.vjp(ref, hi, hj, w1, b1, w2, b2)
    return vjp(g)


_fused.defvjp(_fused_fwd, _fused_bwd)


def fused_mlp_score(lins, hi: jnp.ndarray, hj: jnp.ndarray) -> jnp.ndarray:
    """Fused Hadamard→MLP→sigmoid scoring (fp32 probabilities).

    Caller must check :func:`fused_supported` first (falls back via
    ``hadamard_mlp_score`` otherwise).
    """
    return _fused(
        hi, hj, lins[0]["w"], lins[0]["b"], lins[1]["w"], lins[1]["b"]
    )
