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


def make_sharded_topk_partners(
    mesh: Mesh,
    *,
    k: int,
    mode: str,
    num_nodes: int,
    block: int = 4096,
    axis: str = "data",
    exclude_self: bool = True,
):
    """Distributed top-K partner retrieval over a NODE-SHARDED embedding table
    (the multi-chip counterpart of :func:`llp_tpu.serve.top_k_partners`).

    Each device brute-force scores the replicated queries against its own
    shard of the table in MXU-friendly blocks with a running top-k merge,
    then one ``all_gather`` of the per-shard (Q, k) candidates (tiny) yields
    the exact global top-k on every device.

    Returns jitted ``fn(predictor_params, h_sharded, query_h, query_ids) ->
    (scores, ids)``: ``h_sharded`` is (N_pad, H) with N_pad divisible by the
    mesh size (rows >= num_nodes are padding), ``query_h``/``query_ids``
    replicated.
    """

    def device_fn(params, h_shard, q_h, query_ids):
        nl = h_shard.shape[0]
        blk = min(block, nl)
        nb = -(-nl // blk)
        pad = nb * blk - nl
        hp = jnp.pad(h_shard, ((0, pad), (0, 0)))
        base = jax.lax.axis_index(axis).astype(jnp.int32) * nl
        q = q_h.shape[0]

        def body(carry, b0):
            vals, ids = carry
            cand = jax.lax.dynamic_slice_in_dim(hp, b0, blk, axis=0)
            gid = base + b0 + jnp.arange(blk, dtype=jnp.int32)
            scores = _score_block(params, q_h, cand, mode)
            invalid = (gid[None, :] >= num_nodes) | (
                b0 + jnp.arange(blk) >= nl
            )
            if exclude_self:
                invalid = invalid | (gid[None, :] == query_ids[:, None])
            scores = jnp.where(invalid, -jnp.inf, scores.astype(jnp.float32))
            all_vals = jnp.concatenate([vals, scores], axis=1)
            all_ids = jnp.concatenate(
                [ids, jnp.broadcast_to(gid[None, :], (q, blk))], axis=1
            )
            top_vals, top_pos = jax.lax.top_k(all_vals, k)
            return (top_vals, jnp.take_along_axis(all_ids, top_pos, axis=1)), None

        init = (
            jnp.full((q, k), -jnp.inf, jnp.float32),
            jnp.full((q, k), -1, jnp.int32),
        )
        (vals, ids), _ = jax.lax.scan(
            body, init, jnp.arange(nb, dtype=jnp.int32) * blk
        )
        # Merge the per-shard candidates globally (K·P values per query).
        allv = jax.lax.all_gather(vals, axis)  # (P, Q, k)
        alli = jax.lax.all_gather(ids, axis)
        p = allv.shape[0]
        allv = jnp.transpose(allv, (1, 0, 2)).reshape(q, p * k)
        alli = jnp.transpose(alli, (1, 0, 2)).reshape(q, p * k)
        gvals, gpos = jax.lax.top_k(allv, k)
        return gvals, jnp.take_along_axis(alli, gpos, axis=1)

    def _score_block(params, q_h, cand, mode):
        from llp_tpu.models.predictor import apply_link_predictor

        return apply_link_predictor(
            params, q_h[:, None, :], cand[None, :, :], mode=mode, train=False
        )

    @jax.jit
    def fn(params, h_sharded, query_h, query_ids):
        return shard_map(
            device_fn,
            mesh=mesh,
            in_specs=(P(), P(axis), P(), P()),
            out_specs=(P(), P()),
            check_vma=False,
        )(params, h_sharded, query_h, query_ids)

    return fn
