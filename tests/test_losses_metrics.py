"""Loss and metric numerics vs torch / sklearn references."""

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F
from sklearn.metrics import roc_auc_score

from llp_tpu.ops import (
    bce_loss,
    cosine_loss,
    hits_at_k,
    kl_div_loss,
    margin_rank_loss,
    mse_loss,
    roc_auc,
)


def test_bce_matches_torch(rng):
    p = rng.random(50).astype(np.float32) * 0.98 + 0.01
    y = (rng.random(50) > 0.5).astype(np.float32)
    ours = float(bce_loss(jnp.asarray(p), jnp.asarray(y)))
    ref = float(torch.nn.BCELoss()(torch.from_numpy(p), torch.from_numpy(y)))
    assert abs(ours - ref) < 5e-6


def test_bce_mask_equals_subset(rng):
    p = rng.random(10).astype(np.float32) * 0.9 + 0.05
    y = (rng.random(10) > 0.5).astype(np.float32)
    mask = np.array([1, 1, 1, 1, 1, 1, 0, 0, 0, 0], bool)
    a = float(bce_loss(jnp.asarray(p), jnp.asarray(y), jnp.asarray(mask)))
    b = float(bce_loss(jnp.asarray(p[:6]), jnp.asarray(y[:6])))
    assert abs(a - b) < 1e-6


def test_kl_matches_reference_kl_loss(rng):
    # reference main.py:27-31 with T=1.
    s = rng.random((8, 12)).astype(np.float32)
    t = rng.random((8, 12)).astype(np.float32)
    ours = float(kl_div_loss(jnp.asarray(s), jnp.asarray(t), 1.0))
    ts, tt = torch.from_numpy(s), torch.from_numpy(t)
    y_s = F.log_softmax(ts, dim=-1)
    y_t = F.softmax(tt, dim=-1)
    ref = float(F.kl_div(y_s, y_t, reduction="sum") / s.shape[0])
    assert abs(ours - ref) < 1e-5


def test_margin_rank_matches_torch(rng):
    x1 = rng.normal(size=40).astype(np.float32)
    x2 = rng.normal(size=40).astype(np.float32)
    y = rng.choice([-1.0, 0.0, 1.0], size=40).astype(np.float32)
    ours = float(margin_rank_loss(jnp.asarray(x1), jnp.asarray(x2), jnp.asarray(y), 0.1))
    ref = float(
        torch.nn.MarginRankingLoss(margin=0.1)(
            torch.from_numpy(x1), torch.from_numpy(x2), torch.from_numpy(y)
        )
    )
    assert abs(ours - ref) < 1e-6


def test_cosine_matches_torch(rng):
    s = rng.normal(size=(6, 16)).astype(np.float32)
    t = rng.normal(size=(6, 16)).astype(np.float32)
    ours = float(cosine_loss(jnp.asarray(s), jnp.asarray(t)))
    ref = float(
        1
        - torch.nn.functional.cosine_similarity(
            torch.from_numpy(s), torch.from_numpy(t), dim=-1
        ).mean()
    )
    assert abs(ours - ref) < 1e-6


def test_mse(rng):
    s = rng.normal(size=20).astype(np.float32)
    t = rng.normal(size=20).astype(np.float32)
    assert abs(float(mse_loss(jnp.asarray(s), jnp.asarray(t))) - float(np.mean((s - t) ** 2))) < 1e-6


def test_hits_at_k_ogb_semantics(rng):
    pos = np.array([0.9, 0.5, 0.2, 0.7], np.float32)
    neg = np.array([0.6, 0.4, 0.3, 0.1, 0.8], np.float32)
    # OGB: kth best neg (K=2) = 0.6; hits = |{0.9, 0.7}| / 4.
    assert float(hits_at_k(jnp.asarray(pos), jnp.asarray(neg), 2)) == 0.5
    # Fewer negatives than K -> 1.0.
    assert float(hits_at_k(jnp.asarray(pos), jnp.asarray(neg[:1]), 2)) == 1.0
    # Ties are NOT hits (strict >).
    assert float(hits_at_k(jnp.asarray(np.array([0.6], np.float32)), jnp.asarray(neg), 2)) == 0.0


def test_hits_at_k_masked_equals_subset(rng):
    pos = rng.random(32).astype(np.float32)
    neg = rng.random(64).astype(np.float32)
    pm = rng.random(32) < 0.7
    nm = rng.random(64) < 0.7
    a = float(hits_at_k(jnp.asarray(pos), jnp.asarray(neg), 5, jnp.asarray(pm), jnp.asarray(nm)))
    b = float(hits_at_k(jnp.asarray(pos[pm]), jnp.asarray(neg[nm]), 5))
    assert abs(a - b) < 1e-6


def test_auc_matches_sklearn(rng):
    pos = rng.normal(size=100).astype(np.float32)
    neg = rng.normal(loc=-0.5, size=150).astype(np.float32)
    ours = float(roc_auc(jnp.asarray(pos), jnp.asarray(neg)))
    y = np.concatenate([np.ones(100), np.zeros(150)])
    s = np.concatenate([pos, neg])
    assert abs(ours - roc_auc_score(y, s)) < 1e-6


def test_auc_with_ties_matches_sklearn(rng):
    pos = rng.integers(0, 5, size=80).astype(np.float32) / 4.0
    neg = rng.integers(0, 5, size=120).astype(np.float32) / 4.0
    ours = float(roc_auc(jnp.asarray(pos), jnp.asarray(neg)))
    y = np.concatenate([np.ones(80), np.zeros(120)])
    s = np.concatenate([pos, neg])
    assert abs(ours - roc_auc_score(y, s)) < 1e-6


def test_auc_masked(rng):
    pos = rng.normal(size=50).astype(np.float32)
    neg = rng.normal(size=70).astype(np.float32)
    pm = rng.random(50) < 0.6
    nm = rng.random(70) < 0.6
    a = float(roc_auc(jnp.asarray(pos), jnp.asarray(neg), jnp.asarray(pm), jnp.asarray(nm)))
    b = roc_auc_score(
        np.concatenate([np.ones(pm.sum()), np.zeros(nm.sum())]),
        np.concatenate([pos[pm], neg[nm]]),
    )
    assert abs(a - b) < 1e-6
