"""Ranking metrics: Hits@K (OGB semantics) and tie-averaged ROC-AUC.

TPU-native replacements for the reference's OGB ``Evaluator(name='ogbl-ddi')``
hits@K (reference ``src/train_teacher_gnn.py:119-145``) and
``sklearn.roc_auc_score`` (reference ``:147-153``).  Both are jit-able with
static shapes: padded score vectors carry boolean masks.

Hits@K (OGB): fraction of positive scores strictly greater than the K-th
largest negative score; defined as 1.0 when there are fewer than K negatives.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

# Python scalar, NOT jnp.float32(...): a module-level device constant would
# initialize the XLA backend at import time — which breaks
# jax.distributed.initialize (must run before any backend init) and eagerly
# opens a device client on `import llp_tpu.ops`.
_NEG_INF = float("-inf")


def hits_at_k(
    pos: jnp.ndarray,
    neg: jnp.ndarray,
    k: int,
    pos_mask: Optional[jnp.ndarray] = None,
    neg_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """OGB hits@K over (possibly padded) 1-D score vectors."""
    pos = pos.astype(jnp.float32)
    neg = neg.astype(jnp.float32)
    if neg_mask is not None:
        neg = jnp.where(neg_mask, neg, _NEG_INF)
        n_neg = jnp.sum(neg_mask.astype(jnp.int32))
    else:
        n_neg = jnp.asarray(neg.shape[0], jnp.int32)

    if neg.shape[0] < k:
        # Statically fewer negative slots than K -> OGB returns 1.0.
        return jnp.float32(1.0)

    kth = jax.lax.top_k(neg, k)[0][-1]
    hit = (pos > kth).astype(jnp.float32)
    if pos_mask is not None:
        m = pos_mask.astype(jnp.float32)
        frac = jnp.sum(hit * m) / jnp.maximum(jnp.sum(m), 1.0)
    else:
        frac = jnp.mean(hit)
    # Dynamically fewer real negatives than K (mask path) -> 1.0.
    return jnp.where(n_neg < k, jnp.float32(1.0), frac)


def roc_auc(
    pos: jnp.ndarray,
    neg: jnp.ndarray,
    pos_mask: Optional[jnp.ndarray] = None,
    neg_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Tie-averaged ROC-AUC, identical to sklearn.roc_auc_score.

    AUC = E_{p,n}[ 1[s_p > s_n] + 0.5 * 1[s_p == s_n] ], computed in
    O((P+N) log N) via a sort over negatives plus two searchsorted passes
    rather than the O(P*N) pairwise form.
    """
    pos = pos.astype(jnp.float32)
    neg = neg.astype(jnp.float32)
    if neg_mask is not None:
        # Masked negatives float to +inf: never counted as "less than" a
        # positive, never equal to a finite score.
        neg = jnp.where(neg_mask, neg, jnp.float32(jnp.inf))
        n_neg = jnp.sum(neg_mask.astype(jnp.float32))
    else:
        n_neg = jnp.asarray(neg.shape[0], jnp.float32)

    sorted_neg = jnp.sort(neg)
    cnt_less = jnp.searchsorted(sorted_neg, pos, side="left").astype(jnp.float32)
    cnt_leq = jnp.searchsorted(sorted_neg, pos, side="right").astype(jnp.float32)
    per_pos = (cnt_less + 0.5 * (cnt_leq - cnt_less)) / jnp.maximum(n_neg, 1.0)

    if pos_mask is not None:
        m = pos_mask.astype(jnp.float32)
        return jnp.sum(per_pos * m) / jnp.maximum(jnp.sum(m), 1.0)
    return jnp.mean(per_pos)
