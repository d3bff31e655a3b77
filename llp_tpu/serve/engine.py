"""Link-prediction serving: batch scoring + top-K partner retrieval.

The reference has no serving layer (SURVEY §1: single training process, no
inference entry point) — yet serving is the POINT of LLP: the distilled MLP
student exists so production systems can score links without graph access
(reference ``src/main.py`` trains it; nothing ships it).  This subsystem is
the deployment counterpart, TPU-shaped:

* :func:`encode_nodes` — embed a node-feature matrix with a trained encoder
  as ONE device program (a ``lax.scan`` over fixed-size row blocks: static
  shapes at any N, peak memory bounded by the block).
* :func:`score_pairs` — probability for (src, dst) candidate pairs, blocked
  the same way; routes through the fused Pallas SDDMM eval kernel on TPU.
* :func:`top_k_partners` — for each query node, the top-K highest-scoring
  partner nodes over the whole embedding table, via a running top-k merge
  over candidate blocks (brute-force scored on the MXU — ``q @ H^T`` for the
  'inner' decoder, batched Hadamard→MLP for 'mlp').
* :func:`load_serving_artifacts` — reads the training checkpoint (the
  teacher/student artifact contract, reference ``train_teacher_gnn.py:
  446-452`` / ``main.py:356-363``) with its self-describing arch metadata.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from llp_tpu.models.mlp import apply_mlp
from llp_tpu.models.predictor import apply_link_predictor
from llp_tpu.serve.quant import (
    QuantTable,
    dequantize_rows,
    dequantize_slice,
    int8_dot_scores,
)
from llp_tpu.utils.checkpoint import load_checkpoint


def load_serving_artifacts(path: str) -> Tuple[Any, Any, Dict[str, Any]]:
    """Load a training checkpoint: ``(params, features_or_None, meta)``.

    Teacher checkpoints carry best-val node features (the reference's
    ``../saved-features`` contract) — GNN-encoder serving uses those
    directly; MLP (student) checkpoints encode fresh features on demand.
    """
    ckpt, meta = load_checkpoint(path)
    if isinstance(ckpt, dict) and "params" in ckpt:
        return ckpt["params"], ckpt.get("features"), meta
    return ckpt, None, meta


def _pad_rows(a: jnp.ndarray, block: int) -> Tuple[jnp.ndarray, int]:
    n = a.shape[0]
    nb = max(1, -(-n // block))
    pad = nb * block - n
    if pad:
        a = jnp.concatenate([a, jnp.zeros((pad,) + a.shape[1:], a.dtype)])
    return a, nb


def _take_rows(h, idx, dtype=None):
    """Row gather from a plain or int8-quantized table (dequantized)."""
    if isinstance(h, QuantTable):
        return dequantize_rows(h, idx, dtype=dtype or jnp.float32)
    rows = jnp.take(h, idx, axis=0)
    return rows.astype(dtype) if dtype is not None else rows


@functools.partial(jax.jit, static_argnames=("norm_type", "block"))
def _encode_blocked(params, x, *, norm_type: str, block: int):
    xp, nb = _pad_rows(x, block)

    def body(_, xb):
        h = apply_mlp(params, xb, train=False, norm_type=norm_type)
        if norm_type == "batch":  # stateful mode returns (h, new_norm_state)
            h, _unused = h
        return None, h

    _, hb = jax.lax.scan(body, None, xp.reshape(nb, block, x.shape[1]))
    return hb.reshape(nb * block, -1)[: x.shape[0]]


def encode_nodes(
    encoder_params,
    x: jnp.ndarray,
    *,
    norm_type: str = "none",
    block: int = 8192,
) -> jnp.ndarray:
    """(N, D) features -> (N, H) embeddings, one jit, block-bounded memory."""
    return _encode_blocked(encoder_params, jnp.asarray(x),
                           norm_type=norm_type, block=min(block, max(1, x.shape[0])))


@functools.partial(jax.jit, static_argnames=("enc", "cv", "nt", "impl"))
def _encode_graph_fwd(params, g, xx, *, enc, cv, nt, impl):
    from llp_tpu.models.encoder import apply_encoder

    h = apply_encoder(
        enc, params, g, xx, train=False, conv=cv, norm_type=nt, impl=impl,
    )
    if nt == "batch":  # stateful mode returns (h, new_norm_state)
        h, _unused = h
    return h


def encode_graph_nodes(
    encoder_params,
    graph,
    x: jnp.ndarray,
    *,
    encoder: str = "sage",
    conv: str = "sage",
    norm_type: str = "none",
    spmm_impl: str = "segsum",
) -> jnp.ndarray:
    """GNN-encoder serving: embed nodes with a full-graph forward.

    The inductive (production) serving path — when new nodes arrive, the
    teacher re-encodes the inference graph (reference ``train_teacher_gnn.py:
    190-193``); this is that forward as one jit'd program (module-level jit:
    repeated re-encodes on the same shapes hit the compile cache), riding the
    windowed segsum kernel on TPU.
    """
    if spmm_impl == "segsum":
        from llp_tpu.ops.pallas.segsum_kernel import prepare_segsum

        prepare_segsum(graph)

    return _encode_graph_fwd(encoder_params, graph, jnp.asarray(x),
                             enc=encoder, cv=conv, nt=norm_type, impl=spmm_impl)


@functools.partial(jax.jit, static_argnames=("mode", "block", "fused"))
def _score_blocked(params, h, src, dst, *, mode: str, block: int,
                   fused: bool = False):
    n_pairs = src.shape[0]
    sp, nb = _pad_rows(src, block)
    dp, _ = _pad_rows(dst, block)

    def body(_, sd):
        s, d = sd
        hi = _take_rows(h, s)
        hj = _take_rows(h, d)
        # fused=False default: at serving scale (big cold table, uniform
        # random pairs) the plain XLA expression sits ON the random-gather
        # floor while the Pallas SDDMM kernel's per-row DMA gathers run 30%
        # slower (mlp 33.7 vs 44.3 ms/1M pairs, scripts/bench_scorepairs.py);
        # the kernel wins only on small cache-warm tables (evaluators).
        return None, apply_link_predictor(
            params, hi, hj, mode=mode, train=False, fused=fused
        )

    _, out = jax.lax.scan(body, None, (sp.reshape(nb, block), dp.reshape(nb, block)))
    return out.reshape(-1)[:n_pairs]


def score_pairs(
    predictor_params,
    h: jnp.ndarray,
    src: jnp.ndarray,
    dst: jnp.ndarray,
    *,
    mode: str = "mlp",
    block: int = 131072,
    fused: bool = False,
) -> jnp.ndarray:
    """Probabilities for candidate (src, dst) pairs against embeddings h.

    Runs at the uniform-random gather floor (~63M rows/s on a 240MB cold
    table — 4x below the sorted-edge-order gather rate training enjoys;
    scripts/bench_scorepairs.py). ``fused=True`` opts into the Pallas SDDMM
    kernel — only profitable on small cache-warm tables.  ``h`` may be an
    int8 :class:`~llp_tpu.serve.quant.QuantTable` — measured 1.17x here
    (33.7 ms/1M pairs, AT the bare-gather floor) with 4x less table HBM."""
    src = jnp.asarray(src, jnp.int32)
    dst = jnp.asarray(dst, jnp.int32)
    return _score_blocked(predictor_params, h, src, dst, mode=mode,
                          block=min(block, max(1, src.shape[0])), fused=fused)


@functools.partial(
    jax.jit,
    static_argnames=("mode", "k", "block", "exclude_self", "cdtype", "approx",
                     "mlp_fused"),
)
def _topk_blocked(params, h, query_ids, *, mode: str, k: int, block: int,
                  exclude_self: bool, cdtype=None, approx: bool = False,
                  mlp_fused: bool = False):
    n = h.shape[0]
    quant = isinstance(h, QuantTable)
    if cdtype is not None:
        # Retrieval tolerates reduced precision: bf16 table/query halve the
        # candidate DMA and double the MXU rate; scores merge in fp32.
        # (Quantized tables already store int8; cdtype then sets the
        # DEQUANTIZED scoring dtype instead.)
        if not quant:
            h = h.astype(cdtype)
        params = jax.tree_util.tree_map(lambda a: a.astype(cdtype), params)
    q_h = _take_rows(h, query_ids, dtype=cdtype)  # (Q, H)
    q = q_h.shape[0]
    # No padded table copy: padding to a block multiple materializes a
    # SECOND full table inside the jit (at 100M int4 rows that is +6.8 GB —
    # the copy OOM'd the one-chip scale check).  Instead the last block's
    # start CLAMPS to n - block and the rows it re-reads (already covered
    # by the previous block) are masked invalid — exact, duplicate-free.
    hp = h
    nb = -(-n // block)
    # 'inner' blocks score as ONE (Q,H)x(H,B) matmul on raw dots (sigmoid is
    # monotone — applied to the k winners at the end).  The generic
    # predictor expression broadcasts a (Q,B,H) Hadamard intermediate that
    # XLA does NOT rewrite into a matmul — measured 26x slower on a 10M-row
    # int8 table (672 -> 25.5 ms, scripts/serve_scale10m_blocks.py).  For
    # quantized tables the dot runs directly on the int8 codes (MXU int8
    # path, int32-exact) with a rank-1 scale grid — no dequantized block
    # ever materializes.
    inner_dot = mode == "inner"
    if inner_dot and quant:
        from llp_tpu.serve.quant import codes_rows

        q_codes = codes_rows(h, query_ids)                # (Q, H) int8
        q_scale = jnp.take(h.scale, query_ids, axis=0)    # (Q,)
    # 'mlp' blocks with the fused Pallas kernel score Hadamard→MLP tiles
    # entirely in VMEM (raw logits; sigmoid deferred like 'inner') — the
    # (Q, B, F) hidden activation that made the XLA path z1-traffic-bound
    # never reaches HBM (BASELINE.md "'mlp' retrieval is z1-TRAFFIC-bound").
    raw_scores = inner_dot or (mlp_fused and mode == "mlp")

    def block_scores(b0):
        b0c = jnp.maximum(0, jnp.minimum(b0, np.int32(n - block)))  # clamp
        overlap = b0 - b0c  # rows [0, overlap) were the previous block's
        cand_ids = b0c + jnp.arange(block, dtype=jnp.int32)
        b0 = b0c
        if inner_dot and quant:
            from llp_tpu.serve.quant import codes_slice

            cq = codes_slice(hp, b0, block)  # int4 unpacks AFTER the read
            cs = jax.lax.dynamic_slice_in_dim(hp.scale, b0, block, axis=0)
            scores = jax.lax.dot_general(
                q_codes, cq, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32) * (q_scale[:, None] * cs[None, :])
        elif inner_dot:
            cand = jax.lax.dynamic_slice_in_dim(hp, b0, block, axis=0)
            # preferred_element_type: bf16 operands accumulate straight into
            # fp32 dots (free on the MXU) instead of rounding through bf16
            # before the upcast — near-tie top-k ordering keeps full precision.
            scores = jnp.matmul(
                q_h, cand.T, preferred_element_type=jnp.float32
            )  # raw dots, fp32
        elif mlp_fused and mode == "mlp":
            from llp_tpu.ops.pallas.mlp_topk_kernel import mlp_block_logits

            if quant:
                # The fused kernel's in-VMEM dequant expects int8 codes;
                # int4 blocks unpack first (codes_slice) — the HBM read is
                # still the packed table.
                from llp_tpu.serve.quant import codes_slice

                cq = codes_slice(hp, b0, block)
                cs = jax.lax.dynamic_slice_in_dim(hp.scale, b0, block, axis=0)
                scores = mlp_block_logits(params["lins"], q_h, cq, scales=cs)
            else:
                cand = jax.lax.dynamic_slice_in_dim(hp, b0, block, axis=0)
                scores = mlp_block_logits(params["lins"], q_h, cand)
        else:
            if quant:
                cand = dequantize_slice(
                    hp, b0, block, dtype=cdtype or jnp.float32
                )  # (B, H)
            else:
                cand = jax.lax.dynamic_slice_in_dim(hp, b0, block, axis=0)
            scores = apply_link_predictor(
                params, q_h[:, None, :], cand[None, :, :], mode=mode,
                train=False,
            )  # (Q, B)
        invalid = (
            (cand_ids[None, :] >= n)
            | (jnp.arange(block, dtype=jnp.int32)[None, :] < overlap)
        )
        if exclude_self:
            invalid = invalid | (cand_ids[None, :] == query_ids[:, None])
        return jnp.where(invalid, -jnp.inf, scores.astype(jnp.float32)), cand_ids

    def finish(vals, ids):
        if raw_scores:  # raw dots/logits -> probabilities; keep -inf slots
            vals = jnp.where(jnp.isfinite(vals), jax.nn.sigmoid(vals), -jnp.inf)
        return vals, ids

    starts = jnp.arange(nb, dtype=jnp.int32) * block

    if approx and k <= block:  # approx_max_k needs k <= its reduction width;
        # k > block (tiny configs) falls through to the exact merge below,
        # which handles any k via the (k + block)-wide concat.
        # Per-block ApproxTopK (the XLA PartialReduce TPU path — measured
        # 4-5x faster than exact lax.top_k at serving shapes, recall@10
        # ~0.98; exact on CPU) + ONE exact merge over the nb*k survivors.
        def body(_, b0):
            scores, cand_ids = block_scores(b0)
            bv, bp = jax.lax.approx_max_k(scores, k)
            return None, (bv, jnp.take(cand_ids, bp.astype(jnp.int32)))

        _, (bv, bi) = jax.lax.scan(body, None, starts)        # (nb, Q, k)
        all_vals = jnp.moveaxis(bv, 0, 1).reshape(q, nb * k)
        all_ids = jnp.moveaxis(bi, 0, 1).reshape(q, nb * k)
        top_vals, top_pos = jax.lax.top_k(all_vals, k)
        top_ids = jnp.take_along_axis(all_ids, top_pos, axis=1)
        # -inf slots may carry arbitrary (even padded out-of-range) ids the
        # ApproxTopK picked among invalid entries — restore the exact path's
        # -1 empty-slot sentinel.
        return finish(top_vals, jnp.where(jnp.isfinite(top_vals), top_ids, -1))

    def body(carry, b0):
        vals, ids = carry  # (Q, k) each
        scores, cand_ids = block_scores(b0)
        all_vals = jnp.concatenate([vals, scores], axis=1)          # (Q, k+B)
        all_ids = jnp.concatenate(
            [ids, jnp.broadcast_to(cand_ids[None, :], (q, block))], axis=1
        )
        top_vals, top_pos = jax.lax.top_k(all_vals, k)
        top_ids = jnp.take_along_axis(all_ids, top_pos, axis=1)
        return (top_vals, top_ids), None

    init = (
        jnp.full((q, k), -jnp.inf, jnp.float32),
        jnp.full((q, k), -1, jnp.int32),
    )
    (vals, ids), _ = jax.lax.scan(body, init, starts)
    return finish(vals, ids)


# Budget for the materialized (Q, N) score matrix of the single-pass inner
# retrieval path (fp32): past this, fall back to the blocked scan.
_SINGLE_PASS_SCORE_BYTES = 1 << 30

# Per-block score-tile budget for AUTO block sizing (block=None): the
# 'inner' matmul path wants TALL blocks (fewer top-k merges — measured
# 25.4 ms at block=2M vs 30.2 at 262k on a 10M-row table), bounded so a
# max-size request cannot OOM on its (Q, block) fp32 tile.
_BLOCKED_SCORE_BYTES = 256 << 20

# 'mlp' retrieval block: XLA keeps the head's hidden activation tile-resident
# (reduce-epilogue fusion) up to b8192 and falls off a CLIFF at b16384
# (51.7 -> 191 ms at Q=256/N=235k — the round-2 "z1-traffic wall" was this
# cliff, measured at b16k; scripts/bench_mlp_fused2.py block curve).  The
# auto choice must stay STRICTLY below the cliff — pinned by
# tests/test_serve.py::test_auto_topk_block_stays_below_mlp_cliff; the TPU
# bench floor (bench.py extra.serving mlp_approx_235k_ms) is the hardware
# backstop.
MLP_TOPK_BLOCK = 8192
MLP_BLOCK_CLIFF = 16384


def auto_topk_block(mode: str, approx: bool, q_count: int) -> int:
    """Auto block size for :func:`top_k_partners` (``block=None``).

    'inner'+approx: tall matmul tiles — approx_max_k is wide-friendly, so
    fewer merges win (25.4 ms at block=2M vs 672 at 65k on 10M rows),
    bounded by the 256MB score-tile budget.  'inner' exact: 16384 (lax.top_k
    degrades with width; 10.7 ms vs 23.4 at 4096 on 235k).  'mlp':
    ``MLP_TOPK_BLOCK`` (see the cliff note above).
    """
    if mode == "inner" and approx:
        return max(4096, _BLOCKED_SCORE_BYTES // (4 * max(1, q_count)))
    if mode == "inner":
        return 16384
    return MLP_TOPK_BLOCK


@functools.partial(
    jax.jit, static_argnames=("k", "exclude_self", "cdtype")
)
def _topk_inner_single_pass(params, h, query_ids, *, k: int,
                            exclude_self: bool, cdtype=None):
    """'inner'-decoder retrieval as ONE (Q,H)x(H,N) matmul + ONE ApproxTopK.

    The inner decoder is sigmoid(<h_q, h_c>) — monotone in the dot product,
    so top-k by raw dots equals top-k by probability; sigmoid applies only to
    the k winners.  Measured 4.1x (fp32) / 4.8x (bf16) over the exact
    blocked merge at Q=256, N=235k, k=10 (scripts/bench_topk.py): exact
    lax.top_k dominates every blocked variant, and a full-table top_k is
    worse still — ApproxTopK over the whole row is the fast shape.
    """
    n = h.shape[0]
    if isinstance(h, QuantTable):
        # Whole-table scoring on the MXU int8 path: the (Q,H)x(H,N) dot
        # accumulates int32-exact on the int8 codes; the rank-1 scale grid
        # restores magnitudes (cdtype is moot — int8 beats bf16 on both
        # bytes and MXU rate).
        dots = int8_dot_scores(h, query_ids, pad_to=512)     # (Q, Npad) f32
    else:
        if cdtype is not None:
            h = h.astype(cdtype)
        q_h = jnp.take(h, query_ids, axis=0)                 # (Q, H)
        hp, _ = _pad_rows(h, 512)
        # fp32 accumulation even under bf16 operands (free on the MXU).
        dots = jnp.matmul(
            q_h, hp.T, preferred_element_type=jnp.float32
        )                                                    # (Q, Npad) f32
    ids_all = jnp.arange(dots.shape[1], dtype=jnp.int32)
    invalid = ids_all[None, :] >= n
    if exclude_self:
        invalid = invalid | (ids_all[None, :] == query_ids[:, None])
    dots = jnp.where(invalid, -jnp.inf, dots)
    vals, ids = jax.lax.approx_max_k(dots, k)
    probs = jnp.where(jnp.isfinite(vals), jax.nn.sigmoid(vals), -jnp.inf)
    # -1 sentinel for empty slots (k > valid candidates), like the exact path
    ids = jnp.where(jnp.isfinite(vals), ids.astype(jnp.int32), -1)
    return probs, ids


def top_k_partners(
    predictor_params,
    h: jnp.ndarray,
    query_ids: jnp.ndarray,
    *,
    k: int = 10,
    mode: str = "mlp",
    block: Optional[int] = None,
    exclude_self: bool = True,
    compute_dtype=None,
    approx: bool = False,
    mlp_fused: Optional[bool] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Top-K partner retrieval: for each query node, the K nodes with the
    highest link probability.  Returns ``(scores, node_ids)``, each (Q, K),
    sorted descending.

    ``approx=True`` retrieves through XLA's ApproxTopK (recall ~0.95-0.98
    at default settings; exact on CPU): the 'inner' decoder becomes one
    whole-table matmul + one ApproxTopK when the (Q, N) score matrix fits
    (4-5x measured, scripts/bench_topk.py), otherwise per-block ApproxTopK
    replaces the exact running merges.  ``approx=False`` (default) keeps the
    exact blocked (k + block) merge.  ``compute_dtype=jnp.bfloat16`` runs the
    scoring passes half-width with fp32 merges — ~2x on the FLOP-bound 'mlp'
    decoder, composes with ``approx``.

    ``block=None`` auto-sizes: for 'inner'+``approx`` as tall as a 256MB
    (Q, block) score tile allows (blocked 'inner' scores as a block MATMUL
    and approx_max_k is wide-friendly, so fewer/taller blocks mean fewer
    merges — 26x measured on a 10M-row table,
    scripts/serve_scale10m_blocks.py); 16384 for 'inner' exact (lax.top_k
    degrades with tile width); 8192 for 'mlp' (XLA's reduce-epilogue
    fusion keeps the head's hidden activation tile-resident up to b8192
    and cliffs at b16384 — see the in-body rationale).

    ``h`` may be an int8 :class:`~llp_tpu.serve.quant.QuantTable`: 'inner'
    dots run directly on the int8 codes (MXU int8 path, int32-exact, no
    dequantized block ever materializes — blocked AND single-pass); 'mlp'
    candidate blocks dequantize on the fly.  4x less table HBM at a ~1pp
    recall@10 cost under approx (0.963 int8 vs 0.973 fp32 at collab scale;
    scripts/bench_quant.py).

    ``mlp_fused=True`` opts supported 'mlp' head shapes into the fused VMEM
    Hadamard→MLP Pallas kernel (:mod:`llp_tpu.ops.pallas.mlp_topk_kernel`;
    sigmoid defers to the k winners — identical ranks).  Default (None) is
    the XLA expression: measured FASTER than the kernel at every serving
    shape on v5e — XLA's reduce-epilogue fusion already keeps the hidden
    activation tile-resident at the default block size (the round-2
    "z1-traffic wall" only exists at block≥16384;
    scripts/bench_mlp_fused2.py)."""
    query_ids = jnp.asarray(query_ids, jnp.int32)
    n = h.shape[0]
    if mlp_fused is None:
        # Default OFF (round-3 measurement, scripts/bench_mlp_fused{,2}.py):
        # at block<=8192 XLA already fuses the 2-layer head's (F,1) matvec
        # as a reduce-epilogue on the Hadamard matmul — the hidden
        # activation stays tile-resident and the XLA path runs at ~150
        # TFLOP/s effective (51.7 ms at Q=256/N=235k fp32), beating the
        # Pallas kernel (68-76 ms) at every measured shape incl. 3-layer
        # heads and 10M int8 tables.  The kernel stays the explicit opt-in.
        mlp_fused = False
    elif mlp_fused:
        from llp_tpu.ops.pallas.mlp_topk_kernel import fused_mlp_supported

        mlp_fused = mode == "mlp" and fused_mlp_supported(
            predictor_params["lins"], int(h.shape[1])
        )
    if block is None:
        block = auto_topk_block(mode, approx, int(query_ids.shape[0]))
    # Clamp to the TABLE: since the no-padded-copy rewrite, _topk_blocked
    # slices the unpadded table, and a block > n fails at trace time
    # ("slice_sizes must be <= operand shape").  Tables smaller than the
    # auto block (tiny demos/tests) retrieve in one exact block; the approx
    # path already falls through to the exact merge when k > block.
    block = max(1, min(block, n))
    k = min(k, n - 1 if exclude_self else n)
    cdtype = None
    if compute_dtype is not None:
        cdtype = jnp.dtype(compute_dtype).name
        cdtype = None if cdtype == h.dtype.name else getattr(jnp, cdtype)
    int4 = isinstance(h, QuantTable) and h.bits == 4
    if approx and mode == "inner" and not int4:
        # int4 tables skip the single-pass path: int8_dot_scores would
        # unpack the WHOLE table to (N, H) int8 for its one matmul,
        # forfeiting the packed format's memory/bandwidth edge; the blocked
        # scan below unpacks one candidate block at a time instead.
        q = int(query_ids.shape[0])
        npad = -(-n // 512) * 512
        if q * npad * 4 <= _SINGLE_PASS_SCORE_BYTES:
            return _topk_inner_single_pass(
                predictor_params, h, query_ids, k=k,
                exclude_self=exclude_self, cdtype=cdtype,
            )
    return _topk_blocked(predictor_params, h, query_ids, mode=mode, k=k,
                         block=block, exclude_self=exclude_self, cdtype=cdtype,
                         approx=approx, mlp_fused=bool(mlp_fused))


def candidate_scores_numpy(params, h, qi, mode):  # pragma: no cover - test aid
    """Host brute-force reference used by the serving tests."""
    hi = jnp.asarray(h)[qi][:, None, :]
    return np.asarray(
        apply_link_predictor(params, hi, jnp.asarray(h)[None, :, :],
                             mode=mode, train=False)
    )
