"""Production (unseen-node) evaluation.

Reproduces reference ``test_production`` (reference ``src/train_teacher_gnn.py:
157-268``): encode the validation graph (old nodes only) for val scores, then
re-encode the inference graph (old + new nodes) for test scores; evaluate the
merged test set plus the old-old / old-new / new-new buckets, each against ONE
shared negative set; report 5-tuples (val, test, old_old, old_new, new_new)
for Hits@{10,20,30,50} and AUC.  One jit'd program.

Note the two encodes use different node counts (n_old vs N), hence two graphs
and two feature matrices.  Returns val-graph embeddings (the teacher feature
export uses them — ``saved_h`` at reference ``:173,268``).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from llp_tpu.models.encoder import apply_encoder
from llp_tpu.ops.metrics import hits_at_k, roc_auc


def make_production_eval_fn(
    *,
    encoder: str,
    conv: str = "sage",
    predictor_mode: str = "mlp",
    hits_ks: Sequence[int] = (10, 20, 30, 50),
    spmm_impl: str = "xla",
    norm_type: str = "none",
):
    """Returns jitted ``eval_fn(params, val_graph, val_x, inf_graph, inf_x,
    val_pos, val_neg, test_edges[, val_x_agg, inf_x_agg]) -> (results, h_val)``.

    ``test_edges`` is a dict with (M, 2) arrays: 'merged', 'old_old',
    'old_new', 'new_new', 'neg' (the shared global negatives).

    ``val_x_agg`` / ``inf_x_agg``: optional precomputed layer-1 aggregations
    of the two (run-invariant) feature matrices over their message graphs —
    the driver computes them once so each eval skips both layer-1 SpMMs.
    """
    ks = tuple(hits_ks)

    from llp_tpu.evaln.scoring import make_score

    score = make_score(predictor_mode)

    @jax.jit
    def eval_fn(params, val_graph, val_x, inf_graph, inf_x, val_pos, val_neg,
                test_edges, val_x_agg=None, inf_x_agg=None):
        h_val = apply_encoder(
            encoder, params["encoder"], val_graph, val_x, train=False, conv=conv,
            norm_type=norm_type, impl=spmm_impl, x_agg=val_x_agg,
        )
        if norm_type == "batch":
            h_val, _ = h_val  # eval mode: running buffers used, not updated
        vp = score(params, h_val, val_pos)
        vn = score(params, h_val, val_neg)

        h_inf = apply_encoder(
            encoder, params["encoder"], inf_graph, inf_x, train=False, conv=conv,
            norm_type=norm_type, impl=spmm_impl, x_agg=inf_x_agg,
        )
        if norm_type == "batch":
            h_inf, _ = h_inf
        tp = score(params, h_inf, test_edges["merged"])
        oo = score(params, h_inf, test_edges["old_old"])
        on = score(params, h_inf, test_edges["old_new"])
        nn = score(params, h_inf, test_edges["new_new"])
        tneg = score(params, h_inf, test_edges["neg"])

        results = {}
        for k in ks:
            results[f"Hits@{k}"] = (
                hits_at_k(vp, vn, k),
                hits_at_k(tp, tneg, k),
                hits_at_k(oo, tneg, k),
                hits_at_k(on, tneg, k),
                hits_at_k(nn, tneg, k),
            )
        results["AUC"] = (
            roc_auc(vp, vn),
            roc_auc(tp, tneg),
            roc_auc(oo, tneg),
            roc_auc(on, tneg),
            roc_auc(nn, tneg),
        )
        return results, h_val

    return eval_fn
