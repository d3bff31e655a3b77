"""Pairwise edge scoring (the link-prediction decoder hot path).

TPU-native replacement for the reference ``LinkPredictor.forward`` (reference
``src/models.py:139-150``): gather the two endpoint embeddings, Hadamard
product, then either an MLP head ('mlp') or a plain sum ('inner', i.e. dot
product), always squashed through a sigmoid.

The functions here are pure numerics over already-initialized parameters so
they can be reused by the model layer, the fused Pallas SDDMM kernel's
reference path, and the sharded evaluators.  Linear parameters are dicts
``{"w": (in, out), "b": (out,)}``.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from llp_tpu.ops.rng import inverted_dropout


def _dropout(x: jnp.ndarray, rate: float, rng: Optional[jax.Array]) -> jnp.ndarray:
    if rate <= 0.0 or rng is None:
        return x
    return inverted_dropout(x, rate, rng)


def hadamard_inner_score(hi: jnp.ndarray, hj: jnp.ndarray) -> jnp.ndarray:
    """sigmoid(<hi, hj>) — the 'inner' predictor (models.py:147-150).

    Probabilities come back fp32 regardless of input dtype: the dot
    accumulates in fp32, and downstream loss/metric math is fp32.
    """
    return jax.nn.sigmoid(jnp.sum(hi * hj, axis=-1, dtype=jnp.float32))


def hadamard_mlp_score(
    lins: Sequence[dict],
    hi: jnp.ndarray,
    hj: jnp.ndarray,
    *,
    dropout: float = 0.0,
    rng: Optional[jax.Array] = None,
    fused: bool = False,
) -> jnp.ndarray:
    """sigmoid(MLP(hi * hj)) — the 'mlp' predictor (models.py:141-146).

    ReLU + dropout between layers, none after the last; final output squeezed
    to drop the trailing singleton channel.

    ``fused=True`` routes supported shapes (2-layer head, lane-aligned dims,
    no dropout) to the Pallas SDDMM kernel on TPU — used by the evaluators;
    training keeps the XLA expression (its backward is at the hardware
    floor, see :mod:`llp_tpu.ops.pallas.sddmm_kernel`).
    """
    if fused and (rng is None or dropout == 0.0):
        from llp_tpu.ops.pallas.sddmm_kernel import fused_mlp_score, fused_supported

        if fused_supported(lins, hi):
            return fused_mlp_score(lins, hi, hj)
    x = hi * hj
    dt = x.dtype  # keep intermediates in compute dtype (fp32 accumulation)
    for i, lin in enumerate(lins[:-1]):
        x = (jnp.dot(x, lin["w"], preferred_element_type=jnp.float32) + lin["b"]).astype(dt)
        x = jax.nn.relu(x)
        if rng is not None and dropout > 0.0:
            x = _dropout(x, dropout, jax.random.fold_in(rng, i))
    x = jnp.dot(x, lins[-1]["w"], preferred_element_type=jnp.float32) + lins[-1]["b"]
    # fp32 probabilities even under bf16 compute: the final logit is a cheap
    # (B,) vector and loss/metric math downstream is fp32.
    return jax.nn.sigmoid(x.squeeze(-1).astype(jnp.float32))


def score_edges(
    h: jnp.ndarray,
    src: jnp.ndarray,
    dst: jnp.ndarray,
    *,
    mode: str = "inner",
    lins: Optional[Sequence[dict]] = None,
    dropout: float = 0.0,
    rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Gather endpoint rows of ``h`` and score the (src, dst) pairs.

    The gather + Hadamard + head is the SDDMM-shaped hot op the Pallas kernel
    fuses; this is the XLA expression of it.
    """
    hi = jnp.take(h, src, axis=0)
    hj = jnp.take(h, dst, axis=0)
    if mode == "inner":
        return hadamard_inner_score(hi, hj)
    if mode == "mlp":
        if lins is None:
            raise ValueError("mode='mlp' requires predictor parameters")
        return hadamard_mlp_score(lins, hi, hj, dropout=dropout, rng=rng)
    raise ValueError(f"unknown predictor mode {mode!r}")
