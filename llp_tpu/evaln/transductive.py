"""Transductive evaluation — Hits@K + AUC over valid/test pos/neg edge sets.

Reproduces reference ``test_transductive`` (reference ``src/train_teacher_gnn.py
:76-155``): one eval-mode full-graph encode (message graph = train edges), pair
scores for the four edge sets, OGB hits@{10,20,30,50} (non-collab) or
{10,50,100} (collab) plus sklearn-equivalent AUC.  The reference batches the
scoring loop for GPU memory and round-trips every batch through the host; here
the whole evaluation — encode, score, top-k, AUC — is ONE jit'd device program
returning scalars.

Also returns the node embeddings ``h`` (the reference reuses them as the
teacher's exported features, ``train_teacher_gnn.py:155,451``).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from llp_tpu.models.encoder import apply_encoder
from llp_tpu.ops.metrics import hits_at_k, roc_auc


def make_transductive_eval_fn(
    *,
    encoder: str,
    conv: str = "sage",
    predictor_mode: str = "mlp",
    hits_ks: Sequence[int] = (10, 20, 30, 50),
    spmm_impl: str = "xla",
    norm_type: str = "none",
):
    """Returns jitted ``eval_fn(params, graph, x, valid_pos, valid_neg,
    test_pos, test_neg[, x_agg]) -> (results, h)`` with edge arrays (M, 2)
    int32 and ``results`` a dict: 'Hits@K'/'AUC' -> (valid, test) float
    scalars.

    ``x_agg``: optional precomputed layer-1 aggregation of ``x`` over
    ``graph`` (:func:`llp_tpu.models.encoder.precompute_first_aggregation`).
    The eval inputs (x, message graph) never change across a run, so the
    driver computes this ONCE and every eval call skips its layer-1 SpMM —
    exact, same hoist as the training epoch programs."""

    ks = tuple(hits_ks)

    from llp_tpu.evaln.scoring import make_score

    score = make_score(predictor_mode)

    @jax.jit
    def eval_fn(params, graph, x, valid_pos, valid_neg, test_pos, test_neg,
                x_agg=None):
        h = apply_encoder(
            encoder, params["encoder"], graph, x, train=False, conv=conv,
            norm_type=norm_type, impl=spmm_impl, x_agg=x_agg,
        )
        if norm_type == "batch":
            h, _ = h  # eval mode: running buffers used, not updated
        vp = score(params, h, valid_pos)
        vn = score(params, h, valid_neg)
        tp = score(params, h, test_pos)
        tn = score(params, h, test_neg)
        results = {}
        for k in ks:
            results[f"Hits@{k}"] = (hits_at_k(vp, vn, k), hits_at_k(tp, tn, k))
        results["AUC"] = (roc_auc(vp, vn), roc_auc(tp, tn))
        return results, h

    return eval_fn
