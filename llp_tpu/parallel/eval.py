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


def make_halo_encode(mesh, part, encoder, conv, norm_type, axis):
    """Node-sharded eval-mode encode over a halo partition: returns
    ``encode(params, x_sharded, in_degree_sharded) -> h_sharded`` (call under
    jit; the shard_map is inside)."""
    from types import SimpleNamespace

    from llp_tpu.models.encoder import apply_encoder
    from llp_tpu.parallel.halo import halo_spmm_local, plan_args

    n_plan = len(plan_args(part))

    def encode_body(params, x, in_deg, *plan):
        graph_shim = SimpleNamespace(in_degree=in_deg)

        def impl(g, feats, reduce, edge_weight):
            if edge_weight is not None:
                raise ValueError("edge_weight is not supported in halo eval")
            return halo_spmm_local(
                part, axis, feats, in_deg, *plan, reduce=reduce
            )

        h = apply_encoder(
            encoder, params["encoder"], graph_shim, x, train=False,
            conv=conv, norm_type=norm_type, impl=impl,
        )
        if norm_type == "batch":
            h, _ = h  # eval mode: running buffers used, not updated
        return h

    def encode(params, x_sharded, in_degree_sharded):
        return shard_map(
            encode_body,
            mesh=mesh,
            in_specs=(P(), P(axis), P(axis)) + (P(axis),) * n_plan,
            out_specs=P(axis),
            check_vma=False,
        )(params, x_sharded, in_degree_sharded, *plan_args(part))

    return encode


def _make_score(predictor_mode):
    from llp_tpu.models.predictor import apply_link_predictor

    def score(params, h, edges):
        return apply_link_predictor(
            params["predictor"],
            jnp.take(h, edges[:, 0], axis=0),
            jnp.take(h, edges[:, 1], axis=0),
            mode=predictor_mode,
            train=False,
        )

    return score


def _make_table_encode(mesh, norm_type, axis):
    """Row-parallel MLP encode over an owner-sharded feature table."""
    from llp_tpu.models.encoder import apply_encoder

    def encode_body(params, x):
        h = apply_encoder(
            "mlp", params["encoder"], None, x, train=False,
            norm_type=norm_type,
        )
        if norm_type == "batch":
            h, _ = h  # eval mode: running buffers used, not updated
        return h

    def encode(params, x_sharded):
        return shard_map(
            encode_body,
            mesh=mesh,
            in_specs=(P(), P(axis)),
            out_specs=P(axis),
            check_vma=False,
        )(params, x_sharded)

    return encode


def make_halo_transductive_eval_fn(
    mesh: Mesh,
    part,
    *,
    encoder: str,
    conv: str = "sage",
    predictor_mode: str = "mlp",
    hits_ks: Sequence[int] = (10, 20, 30, 50),
    norm_type: str = "none",
    axis: str = "data",
):
    """FEATURE-SHARDED transductive evaluation for the halo training regime.

    When training runs ``--sharding=halo`` it is because the (N, D) feature
    matrix does not fit one chip — so evaluation cannot run the replicated
    single-device program either.  This evaluator encodes node-sharded (the
    same halo-exchange aggregation as ``make_halo_teacher_epoch_fn``, eval
    mode) and only the narrow (N, H) embeddings leave the shards: scoring and
    the Hits@K / AUC reductions run on them under GSPMD (XLA inserts
    the gather collectives).

    Returns jitted ``eval_fn(params, x_sharded, in_degree_sharded, valid_pos,
    valid_neg, test_pos, test_neg) -> (results, h)`` — the metric/embedding
    contract of :func:`llp_tpu.evaln.transductive.make_transductive_eval_fn`
    (reference protocol ``src/train_teacher_gnn.py:76-155``); ``h`` is
    the (padded-N, H) embedding table reused for the teacher feature
    export.
    """
    encode = make_halo_encode(mesh, part, encoder, conv, norm_type, axis)
    score = _make_score(predictor_mode)
    ks = tuple(hits_ks)

    from llp_tpu.ops.metrics import hits_at_k, roc_auc

    @jax.jit
    def eval_fn(params, x_sharded, in_degree_sharded,
                valid_pos, valid_neg, test_pos, test_neg):
        h = encode(params, x_sharded, in_degree_sharded)
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


def make_halo_production_eval_fn(
    mesh: Mesh,
    val_part,
    inf_part,
    *,
    encoder: str,
    conv: str = "sage",
    predictor_mode: str = "mlp",
    hits_ks: Sequence[int] = (10, 20, 30, 50),
    norm_type: str = "none",
    axis: str = "data",
):
    """FEATURE-SHARDED production (unseen-node) evaluation.

    The halo counterpart of
    :func:`llp_tpu.evaln.production.make_production_eval_fn` (reference
    protocol ``src/train_teacher_gnn.py:157-268``): the validation graph
    (old nodes) and the inference graph (old + new nodes) each get their own
    halo partition and node-sharded encode; the merged test set and the
    old-old / old-new / new-new buckets score against one shared negative
    set on the narrow gathered embeddings.

    Returns jitted ``eval_fn(params, val_x_sh, val_deg_sh, inf_x_sh,
    inf_deg_sh, val_pos, val_neg, test_edges) -> (results, h_val)`` with
    5-tuple metrics; ``test_edges`` is the same dict the replicated
    evaluator takes.
    """
    encode_val = make_halo_encode(mesh, val_part, encoder, conv, norm_type, axis)
    encode_inf = make_halo_encode(mesh, inf_part, encoder, conv, norm_type, axis)
    score = _make_score(predictor_mode)
    ks = tuple(hits_ks)

    from llp_tpu.ops.metrics import hits_at_k, roc_auc

    @jax.jit
    def eval_fn(params, val_x_sh, val_deg_sh, inf_x_sh, inf_deg_sh,
                val_pos, val_neg, test_edges):
        h_val = encode_val(params, val_x_sh, val_deg_sh)
        vp = score(params, h_val, val_pos)
        vn = score(params, h_val, val_neg)

        h_inf = encode_inf(params, inf_x_sh, inf_deg_sh)
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


def make_table_transductive_eval_fn(
    mesh: Mesh,
    *,
    predictor_mode: str = "mlp",
    hits_ks: Sequence[int] = (10, 20, 30, 50),
    norm_type: str = "none",
    axis: str = "data",
):
    """Transductive evaluation for the TABLE-SHARDED student (MLP encoder,
    owner-sharded feature matrix — the huge-x regime of
    ``make_sharded_student_epoch_fn(feature_sharding='table')``).

    The MLP encode is embarrassingly row-parallel, so each device encodes
    only its own feature rows; scoring and Hits@K/AUC run on the narrow
    (N, H) embeddings under GSPMD.  Returns jitted ``eval_fn(params,
    x_sharded, valid_pos, valid_neg, test_pos, test_neg) -> (results, h)``
    with the metric contract of
    :func:`llp_tpu.evaln.transductive.make_transductive_eval_fn`.
    """
    from llp_tpu.ops.metrics import hits_at_k, roc_auc

    ks = tuple(hits_ks)
    encode = _make_table_encode(mesh, norm_type, axis)
    score = _make_score(predictor_mode)

    @jax.jit
    def eval_fn(params, x_sharded, valid_pos, valid_neg, test_pos, test_neg):
        h = encode(params, x_sharded)
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


def make_table_production_eval_fn(
    mesh: Mesh,
    *,
    predictor_mode: str = "mlp",
    hits_ks: Sequence[int] = (10, 20, 30, 50),
    norm_type: str = "none",
    axis: str = "data",
):
    """Production (unseen-node) evaluation for the TABLE-SHARDED student:
    both feature matrices (val-graph x over old nodes, inference x over
    old + new nodes) arrive owner-sharded and are encoded row-parallel;
    5-tuple bucket metrics on the narrow embeddings under GSPMD.

    Returns jitted ``eval_fn(params, val_x_sh, inf_x_sh, val_pos, val_neg,
    test_edges) -> (results, h_val)`` — the metric contract of
    :func:`llp_tpu.evaln.production.make_production_eval_fn`.
    """
    from llp_tpu.ops.metrics import hits_at_k, roc_auc

    score = _make_score(predictor_mode)
    ks = tuple(hits_ks)
    encode = _make_table_encode(mesh, norm_type, axis)

    @jax.jit
    def eval_fn(params, val_x_sh, inf_x_sh, val_pos, val_neg, test_edges):
        h_val = encode(params, val_x_sh)
        vp = score(params, h_val, val_pos)
        vn = score(params, h_val, val_neg)
        h_inf = encode(params, inf_x_sh)
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


def make_sharded_topk_partners(
    mesh: Mesh,
    *,
    k: int,
    mode: str,
    num_nodes: int,
    block: int | None = None,
    axis: str = "data",
    exclude_self: bool = True,
    approx: bool = False,
    compute_dtype=None,
    mlp_fused: bool | None = None,
):
    """Distributed top-K partner retrieval over a NODE-SHARDED embedding table
    (the multi-chip counterpart of :func:`llp_tpu.serve.top_k_partners`).

    Each device brute-force scores the replicated queries against its own
    shard of the table in MXU-friendly blocks with a running top-k merge,
    then one ``all_gather`` of the per-shard (Q, k) candidates (tiny) yields
    the exact global top-k on every device.  ``approx=True`` swaps the
    per-block exact merges for XLA ApproxTopK (4-5x at serving shapes on
    TPU, recall ~0.95-0.98, exact on CPU — see llp_tpu.serve.top_k_partners);
    the cross-shard merge stays exact.

    Returns jitted ``fn(predictor_params, h_sharded, query_h, query_ids) ->
    (scores, ids)``: ``h_sharded`` is (N_pad, H) with N_pad divisible by the
    mesh size (rows >= num_nodes are padding), ``query_h``/``query_ids``
    replicated.
    """

    def device_fn(params, h_shard, q_h, query_ids):
        from llp_tpu.serve.quant import QuantTable, dequantize_slice

        quant = isinstance(h_shard, QuantTable)
        inner_int8 = quant and mode == "inner"
        if inner_int8:
            # Mirror the single-device engine's int8-codes dot (engine.py
            # _topk_blocked): dot the int8 codes directly on the MXU int8
            # path (int32-exact) and restore magnitudes with the rank-1
            # scale grid — no dequantized candidate block ever materializes
            # (4x less block traffic at exactly the table-doesn't-fit scale
            # this path exists for).  The replicated queries arrive as
            # DEQUANTIZED fp32 table rows; per-row absmax requantization
            # recovers their original codes exactly (quant.quantize_rows) —
            # which is why this MUST run BEFORE any compute_dtype cast
            # below: a bf16 round-trip flips codes by ±1.
            from llp_tpu.serve.quant import quantize_rows

            q_codes, q_scale = quantize_rows(q_h, bits=h_shard.bits)
        if compute_dtype is not None:
            # Scoring in the reduced dtype (the 'mlp' decoder is FLOP-bound:
            # bf16 is its ~2x lever — llp_tpu.serve.engine semantics); the
            # per-block/cross-shard merges stay fp32 (block_scores upcasts).
            # Int8 shards stay int8 at rest; compute_dtype then sets the
            # dequantized block dtype instead.
            from llp_tpu.utils.precision import cast_params

            params = cast_params(params, compute_dtype)
            q_h = q_h.astype(compute_dtype)
            if not quant:
                h_shard = h_shard.astype(compute_dtype)
        nl = h_shard.shape[0]
        if block is None:
            # ONE auto-block policy for single-chip and sharded retrieval:
            # llp_tpu.serve.engine.auto_topk_block (the mlp 16384-cliff pin
            # in test_serve.py protects this path too).
            from llp_tpu.serve.engine import auto_topk_block

            blk = auto_topk_block(mode, approx, int(q_h.shape[0]))
        else:
            blk = block
        blk = min(blk, nl)
        nb = -(-nl // blk)
        # No padded shard copy (the engine's no-pad rationale at scale):
        # the last block's start clamps to nl - blk and the overlap rows
        # the previous block already covered are masked invalid.
        hp = h_shard
        base = jax.lax.axis_index(axis).astype(jnp.int32) * nl
        q = q_h.shape[0]

        # 'inner' blocks score as a (Q,H)x(H,B) matmul on raw dots (sigmoid
        # is monotone — applied after the cross-shard merge).  The generic
        # predictor expression broadcasts a (Q,B,H) Hadamard intermediate
        # XLA does not rewrite into a matmul — measured 26x slower at scale
        # (scripts/serve_scale10m_blocks.py; llp_tpu.serve.engine does the
        # same rewrite single-device).
        inner_dot = mode == "inner"
        # 'mlp' shards can opt into the fused VMEM Hadamard→MLP kernel
        # (raw logits, sigmoid after the cross-shard merge).  Default OFF:
        # the XLA expression measured faster at every serving shape on v5e
        # (llp_tpu.serve.engine.top_k_partners rationale).
        from llp_tpu.ops.pallas.mlp_topk_kernel import fused_mlp_supported

        use_fused = (
            mode == "mlp"
            and bool(mlp_fused)
            and fused_mlp_supported(params["lins"], int(q_h.shape[1]))
        )
        raw_scores = inner_dot or use_fused

        def block_scores(b0):
            b0c = jnp.maximum(0, jnp.minimum(b0, nl - blk)).astype(jnp.int32)
            overlap = b0 - b0c  # rows [0, overlap) were the prior block's
            b0 = b0c
            gid = base + b0 + jnp.arange(blk, dtype=jnp.int32)
            if inner_dot and quant:
                from llp_tpu.serve.quant import codes_slice

                cq = codes_slice(hp, b0, blk)  # int4 unpacks after the read
                cs = jax.lax.dynamic_slice_in_dim(hp.scale, b0, blk, axis=0)
                scores = jax.lax.dot_general(
                    q_codes, cq, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32,
                ).astype(jnp.float32) * (q_scale[:, None] * cs[None, :])
            elif inner_dot:
                cand = jax.lax.dynamic_slice_in_dim(hp, b0, blk, axis=0)
                # fp32 dot accumulation even under bf16 operands (free on
                # the MXU): near-tie cross-shard ordering keeps full bits.
                scores = jnp.matmul(
                    q_h.astype(cand.dtype), cand.T,
                    preferred_element_type=jnp.float32,
                )
            elif use_fused:
                from llp_tpu.ops.pallas.mlp_topk_kernel import (
                    mlp_block_logits,
                )

                if quant:
                    from llp_tpu.serve.quant import codes_slice

                    cq = codes_slice(hp, b0, blk)
                    cs = jax.lax.dynamic_slice_in_dim(
                        hp.scale, b0, blk, axis=0
                    )
                    scores = mlp_block_logits(
                        params["lins"], q_h, cq, scales=cs
                    )
                else:
                    cand = jax.lax.dynamic_slice_in_dim(hp, b0, blk, axis=0)
                    scores = mlp_block_logits(params["lins"], q_h, cand)
            else:
                if quant:
                    cand = dequantize_slice(
                        hp, b0, blk, dtype=compute_dtype or jnp.float32
                    )
                else:
                    cand = jax.lax.dynamic_slice_in_dim(hp, b0, blk, axis=0)
                scores = _score_block(params, q_h, cand, mode)
            invalid = (
                (gid[None, :] >= num_nodes)
                | (b0 + jnp.arange(blk) >= nl)
                | (jnp.arange(blk)[None, :] < overlap)
            )
            if exclude_self:
                invalid = invalid | (gid[None, :] == query_ids[:, None])
            return jnp.where(invalid, -jnp.inf, scores.astype(jnp.float32)), gid

        starts = jnp.arange(nb, dtype=jnp.int32) * blk

        if approx and k <= blk:  # approx_max_k needs k <= its reduction
            # width; k > blk (tiny shards/blocks) falls through to the exact
            # merge, which handles any k via the (k + blk)-wide concat.
            def abody(_, b0):
                scores, gid = block_scores(b0)
                bv, bp = jax.lax.approx_max_k(scores, k)
                return None, (bv, jnp.take(gid, bp.astype(jnp.int32)))

            _, (bv, bi) = jax.lax.scan(abody, None, starts)   # (nb, Q, k)
            av = jnp.transpose(bv, (1, 0, 2)).reshape(q, nb * k)
            ai = jnp.transpose(bi, (1, 0, 2)).reshape(q, nb * k)
            vals, pos = jax.lax.top_k(av, k)
            ids = jnp.take_along_axis(ai, pos, axis=1)
            # -inf slots may carry padded out-of-range ids ApproxTopK picked
            # among invalid entries — restore the -1 empty-slot sentinel.
            ids = jnp.where(jnp.isfinite(vals), ids, -1)
        else:
            def body(carry, b0):
                vals, ids = carry
                scores, gid = block_scores(b0)
                all_vals = jnp.concatenate([vals, scores], axis=1)
                all_ids = jnp.concatenate(
                    [ids, jnp.broadcast_to(gid[None, :], (q, blk))], axis=1
                )
                top_vals, top_pos = jax.lax.top_k(all_vals, k)
                return (
                    top_vals, jnp.take_along_axis(all_ids, top_pos, axis=1)
                ), None

            init = (
                jnp.full((q, k), -jnp.inf, jnp.float32),
                jnp.full((q, k), -1, jnp.int32),
            )
            (vals, ids), _ = jax.lax.scan(body, init, starts)
        # Merge the per-shard candidates globally (K·P values per query).
        allv = jax.lax.all_gather(vals, axis)  # (P, Q, k)
        alli = jax.lax.all_gather(ids, axis)
        p = allv.shape[0]
        allv = jnp.transpose(allv, (1, 0, 2)).reshape(q, p * k)
        alli = jnp.transpose(alli, (1, 0, 2)).reshape(q, p * k)
        gvals, gpos = jax.lax.top_k(allv, k)
        gids = jnp.take_along_axis(alli, gpos, axis=1)
        if raw_scores:  # raw dots/logits -> probabilities; keep -inf slots
            gvals = jnp.where(
                jnp.isfinite(gvals), jax.nn.sigmoid(gvals), -jnp.inf
            )
        return gvals, gids

    def _score_block(params, q_h, cand, mode):
        from llp_tpu.models.predictor import apply_link_predictor

        return apply_link_predictor(
            params, q_h[:, None, :], cand[None, :, :], mode=mode, train=False
        )

    @jax.jit
    def fn(params, h_sharded, query_h, query_ids):
        from llp_tpu.serve.quant import QuantTable

        h_spec = (
            # bits is a STATIC pytree field: the spec tree must carry the
            # table's value or the shard_map treedefs mismatch.
            QuantTable(q=P(axis), scale=P(axis), bits=h_sharded.bits)
            if isinstance(h_sharded, QuantTable)
            else P(axis)
        )
        return shard_map(
            device_fn,
            mesh=mesh,
            in_specs=(P(), h_spec, P(), P()),
            out_specs=(P(), P()),
            check_vma=False,
        )(params, h_sharded, query_h, query_ids)

    return fn
