"""Training losses, numerically matched to the reference's torch semantics.

All losses take an optional boolean ``mask`` so padded (static-shape) batches
reduce exactly like the reference's dynamic batches: masked elements drop out
of both numerator and denominator.

Reference semantics reproduced:
  * BCE on sigmoid outputs, mean reduction  (train_teacher_gnn.py:33,59)
  * LLP_D: ``KL(log_softmax(s/T) || softmax(t/T)) * T^2 / B`` where the inner
    kl_div sums over all elements  (main.py:27-31, called with T=1)
  * LLP_R: MarginRankingLoss, mean over B*P pair slots — including target-0
    (tied) pairs, which contribute a constant ``margin``  (main.py:110-122)
  * KD_RM: ``1 - mean cosine(s, stop_grad(t))``  (main.py:24-25)
  * KD_LM: MSE on predictor outputs  (main.py:220)
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

_EPS = 1e-12


def _masked_mean(x: jnp.ndarray, mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    if mask is None:
        return jnp.mean(x)
    mask = mask.astype(x.dtype)
    return jnp.sum(x * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def bce_loss(
    probs: jnp.ndarray, labels: jnp.ndarray, mask: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """torch.nn.BCELoss on probabilities (inputs already sigmoided).

    Clamps log terms like torch (log bounded at -100) for stability.
    """
    p = probs.astype(jnp.float32)
    y = labels.astype(jnp.float32)
    log_p = jnp.maximum(jnp.log(jnp.maximum(p, _EPS)), -100.0)
    log_1p = jnp.maximum(jnp.log(jnp.maximum(1.0 - p, _EPS)), -100.0)
    losses = -(y * log_p + (1.0 - y) * log_1p)
    return _masked_mean(losses, mask)


def kl_div_loss(
    s: jnp.ndarray,
    t: jnp.ndarray,
    temperature: float = 1.0,
    row_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """LLP_D distribution-matching loss (reference kl_loss, main.py:27-31).

    ``s``/``t`` are (B, C) student/teacher context scores (already sigmoided —
    the reference softmaxes sigmoid outputs, reproduced here on purpose).
    Sum-reduction KL over all elements, scaled by T^2 and divided by the
    (real) row count.
    """
    T = temperature
    y_s = jax.nn.log_softmax(s.astype(jnp.float32) / T, axis=-1)
    p_t = jax.nn.softmax(jax.lax.stop_gradient(t).astype(jnp.float32) / T, axis=-1)
    # F.kl_div(y_s, p_t, size_average=False) = sum p_t * (log p_t - y_s)
    elt = p_t * (jnp.log(jnp.maximum(p_t, _EPS)) - y_s)
    if row_mask is not None:
        elt = elt * row_mask.astype(elt.dtype)[:, None]
        b = jnp.maximum(jnp.sum(row_mask.astype(jnp.float32)), 1.0)
    else:
        b = jnp.asarray(s.shape[0], jnp.float32)
    return jnp.sum(elt) * (T * T) / b


def margin_rank_loss(
    x1: jnp.ndarray,
    x2: jnp.ndarray,
    target: jnp.ndarray,
    margin: float,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """torch.nn.MarginRankingLoss: mean(max(0, -target*(x1-x2) + margin)).

    target in {-1, 0, +1}; target==0 slots contribute the constant ``margin``
    (and zero gradient), exactly like the reference's tied teacher pairs.
    """
    x1 = x1.astype(jnp.float32)
    x2 = x2.astype(jnp.float32)
    losses = jnp.maximum(0.0, -target.astype(jnp.float32) * (x1 - x2) + margin)
    return _masked_mean(losses, mask)


def cosine_loss(
    s: jnp.ndarray, t: jnp.ndarray, mask: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """KD_RM representation-matching: 1 - mean cos(s, stop_grad(t))."""
    t = jax.lax.stop_gradient(t)
    s32 = s.astype(jnp.float32)
    t32 = t.astype(jnp.float32)
    num = jnp.sum(s32 * t32, axis=-1)
    denom = jnp.maximum(
        jnp.linalg.norm(s32, axis=-1) * jnp.linalg.norm(t32, axis=-1), 1e-8
    )
    return 1.0 - _masked_mean(num / denom, mask)


def mse_loss(
    s: jnp.ndarray, t: jnp.ndarray, mask: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """KD_LM logit-matching: mean squared error vs stop_grad(teacher)."""
    t = jax.lax.stop_gradient(t)
    sq = jnp.square(s.astype(jnp.float32) - t.astype(jnp.float32))
    return _masked_mean(sq, mask)
