"""Sharded evaluation — Hits@K and AUC over device-sharded negative sets.

At pod scale the negative/candidate sets get large; this evaluator keeps
negatives sharded across the ``data`` mesh axis and computes exactly the
single-device metrics:

* Hits@K: each device takes its local top-K negatives, an ``all_gather``
  merges the per-shard candidates (K·D values, tiny), and the global K-th
  best threshold is identical on every device — positives are replicated so
  the hit fraction needs no further reduction.
* AUC: the tie-averaged rank statistic decomposes over negative shards —
  per-shard (count-less, count-equal) via two searchsorted passes, summed
  with ``psum``.

SURVEY.md §6 "hard parts": global top-K under sharding -> per-shard top-K +
merge.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P


def make_sharded_hits_auc(mesh: Mesh, ks: Sequence[int], axis: str = "data"):
    """Returns jitted ``fn(pos_scores, neg_scores_sharded) -> dict`` with
    'Hits@K' and 'AUC' scalars. ``pos_scores`` replicated (P,), negatives
    (Nn,) sharded on ``axis`` (Nn divisible by mesh size)."""
    kmax = max(ks)

    def device_fn(pos, neg_shard):
        neg_shard = neg_shard.astype(jnp.float32)
        pos = pos.astype(jnp.float32)
        k_eff = min(kmax, neg_shard.shape[0])
        local_top = jax.lax.top_k(neg_shard, k_eff)[0]
        all_top = jax.lax.all_gather(local_top, axis).reshape(-1)

        out = {}
        for k in ks:
            if all_top.shape[0] < k:
                out[f"Hits@{k}"] = jnp.float32(1.0)
                continue
            kth = jax.lax.top_k(all_top, k)[0][-1]
            out[f"Hits@{k}"] = jnp.mean((pos > kth).astype(jnp.float32))

        sorted_neg = jnp.sort(neg_shard)
        less = jnp.searchsorted(sorted_neg, pos, side="left").astype(jnp.float32)
        leq = jnp.searchsorted(sorted_neg, pos, side="right").astype(jnp.float32)
        tot_less = jax.lax.psum(less, axis)
        tot_eq = jax.lax.psum(leq - less, axis)
        n_neg = jax.lax.psum(jnp.float32(neg_shard.shape[0]), axis)
        out["AUC"] = jnp.mean((tot_less + 0.5 * tot_eq) / jnp.maximum(n_neg, 1.0))
        return out

    @jax.jit
    def fn(pos_scores, neg_scores):
        return shard_map(
            device_fn,
            mesh=mesh,
            in_specs=(P(), P(axis)),
            out_specs=P(),
            check_vma=False,
        )(pos_scores, neg_scores)

    return fn
