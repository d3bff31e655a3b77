"""Shared evaluator edge scoring (single source for the fused-SDDMM gating)."""

from __future__ import annotations

import jax.numpy as jnp

from llp_tpu.models.predictor import apply_link_predictor


def make_score(predictor_mode: str):
    """``score(params, h, edges)`` — probabilities for (M, 2) edge rows.

    Routes through the Pallas SDDMM kernel on supported shapes, but only
    while the table being gathered from is cache-warm — on big tables the
    scoring pass is gather-bound and the XLA expression hides under the
    gather while the kernel adds overhead (``fused_profitable``;
    scripts/bench_scorepairs.py).
    """
    from llp_tpu.ops.pallas.sddmm_kernel import fused_profitable

    def score(params, h, edges):
        return apply_link_predictor(
            params["predictor"],
            jnp.take(h, edges[:, 0], axis=0),
            jnp.take(h, edges[:, 1], axis=0),
            mode=predictor_mode,
            train=False,
            fused=fused_profitable(h),
        )

    return score
