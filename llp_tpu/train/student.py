"""Student (MLP) training with relational distillation — jit'd epochs.

Reproduces the reference student loops (``src/main.py:147-236`` full-batch,
``:52-144`` minibatch) as one lax.scan-per-epoch device program:

per link-batch step:
  * anchors = next node-batch (the node/link loader coupling of main.py:335)
  * student embeddings: full-node MLP forward (full-batch mode) or a single
    gathered forward over [contexts | src | dst] (minibatch mode — the
    reference's CPU-feature gather at main.py:96 becomes an on-device HBM
    gather, removing the host round-trip entirely)
  * LLP_D: KL between softmaxed student/teacher context-score rows
  * LLP_R: margin-rank over the static C(C,2) pair table
  * label loss: BCE over [positives ; fresh negatives]
  * optional KD_RM (cosine) / KD_LM (MSE) baselines (full-batch path only,
    like the reference)
  * weighted sum -> per-group clip(1.0) -> Adam

The C(C,2) pair index table is a compile-time constant (the reference rebuilds
it with itertools every batch, main.py:112,193).
"""

from __future__ import annotations

import functools
import itertools

import jax
import jax.numpy as jnp
import numpy as np

from llp_tpu.models.mlp import apply_mlp
from llp_tpu.models.predictor import apply_link_predictor
from llp_tpu.ops.losses import (
    bce_loss,
    cosine_loss,
    kl_div_loss,
    margin_rank_loss,
    mse_loss,
)
from llp_tpu.sample.negative import sample_negative_edges, sample_uniform_edges
from llp_tpu.sample.walk import sample_contexts
from llp_tpu.train.optim import adam_init, adam_update, clip_by_group_norm
from llp_tpu.utils.precision import cast_params, resolve_dtype


def init_student_params(key, *, in_channels, hidden_channels, num_layers,
                        predictor_mode, norm_type="none"):
    """Student = MLP(num_layers, D, H, H) + LinkPredictor(H, H, 1, num_layers)
    (reference main.py:351-354)."""
    from llp_tpu.models.mlp import init_mlp
    from llp_tpu.models.predictor import init_link_predictor

    k1, k2 = jax.random.split(key)
    return {
        "encoder": init_mlp(
            k1, num_layers, in_channels, hidden_channels, hidden_channels,
            norm_type=norm_type,
        ),
        "predictor": init_link_predictor(
            k2, predictor_mode, hidden_channels, hidden_channels, 1, num_layers
        ),
    }


def pair_table(num_contexts: int) -> jnp.ndarray:
    """(2, C*(C-1)/2) static index table of all context pairs (main.py:112)."""
    pairs = np.array(list(itertools.combinations(range(num_contexts), 2))).T
    return jnp.asarray(pairs, jnp.int32)


def build_pair_chunks(pairs: jnp.ndarray, chunk: int):
    """Split the C(C,2) pair table into fixed-size chunks for the
    rematerialized LLP_R scan.  Returns ``(p0_chunks, p1_chunks, valid)``
    each (num_chunks, chunk), or ``None`` when chunking is off / pointless."""
    if pairs is None or not (0 < chunk < pairs.shape[1]):
        return None
    p_total = pairs.shape[1]
    nchunks = -(-p_total // chunk)
    pnp = np.asarray(pairs)
    pad = nchunks * chunk - p_total
    padded = np.pad(pnp, ((0, 0), (0, pad)))
    pvalid = (np.arange(nchunks * chunk) < p_total).reshape(nchunks, chunk)
    return (
        jnp.asarray(padded[0].reshape(nchunks, chunk)),
        jnp.asarray(padded[1].reshape(nchunks, chunk)),
        jnp.asarray(pvalid),
    )


def make_student_epoch_fn(
    *,
    num_nodes: int,
    num_pos_edges: int,
    link_batch_size: int,
    node_batch_size: int,
    predictor_mode: str = "mlp",
    dropout: float = 0.5,
    lr: float = 0.005,
    true_label: float = 0.1,
    kd_rm: float = 0.0,
    kd_lm: float = 0.0,
    llp_d: float = 1.0,
    llp_r: float = 1.0,
    margin: float = 0.1,
    rw_step: int = 3,
    hops: int = 2,
    ns_rate: int = 1,
    ps_method: str = "nb",
    neg_mode: str = "dense",
    minibatch: bool = False,
    norm_type: str = "none",
    compute_dtype="float32",
    epochs_per_call: int = 1,
    llp_r_chunk: int = 0,
):
    """Build the jitted student epoch.

    Returns ``(epoch_fn, tx)`` with
    ``epoch_fn(params, opt_state, key, graph, x, t_h, teacher_pred_params,
    pos_edges, neg_keys) -> (params, opt_state, mean_loss)``.

    ``epochs_per_call > 1`` fuses that many epochs into one device program
    (see :func:`llp_tpu.train.teacher.make_teacher_epoch_fn`): ``key`` is
    then a stacked (epochs_per_call, ...) per-epoch key array and the loss
    comes back as a per-epoch vector.

    ``t_h``: frozen teacher node features ((N, Ht), reference ../saved-features
    contract); ``teacher_pred_params``: frozen teacher LinkPredictor pytree.
    """
    e = num_pos_edges
    bl = min(link_batch_size, e)
    steps = -(-e // bl)
    bn = min(node_batch_size, num_nodes)
    c = rw_step * hops * (1 + ns_rate)
    use_kd = (llp_d != 0.0) or (llp_r != 0.0)
    if llp_r != 0.0 and c < 2:
        # C(1,2) is empty — the reference would crash on an empty rank list
        # (torch.cat([]) at main.py:201-203); fail with the actual knobs.
        raise ValueError(
            f"LLP_R needs at least 2 contexts per anchor to form rank pairs; "
            f"got rw_step*hops*(1+ns_rate) = {rw_step}*{hops}*(1+{ns_rate}) "
            f"= {c}. Increase rw_step/hops/ns_rate or set LLP_R=0."
        )
    pairs = pair_table(c) if (llp_r != 0.0 and use_kd) else None

    # Memory-bounded LLP_R: with llp_r_chunk > 0 the C(C,2) pair sweep runs
    # as a rematerialized lax.scan over fixed-size pair chunks — the same
    # terms and masked mean (summation merely reassociated) at O(B·chunk)
    # live memory instead of O(B·C²).  The reference materializes every pair
    # each batch
    # (main.py:112,193); large-C sweeps (collab configs reach C≈60, ~1.8k
    # pairs/anchor) are exactly where this matters.
    pair_chunks = build_pair_chunks(pairs, llp_r_chunk) if pairs is not None else None

    tx, _ = adam_init({}, lr)
    stateful = norm_type == "batch"
    cdtype = resolve_dtype(compute_dtype)

    def batch_loss(params, rng, graph, x, t_h, tpred, edges, emask, anchors, amask, neg_keys):
        params = cast_params(params, cdtype)  # fwd/bwd in compute dtype
        k_drop, k_pred, k_neg, k_ctx = jax.random.split(rng, 4)

        if neg_mode == "dense":
            neg = sample_negative_edges(k_neg, neg_keys, bl, num_nodes)
        else:
            neg = sample_uniform_edges(k_neg, bl, num_nodes)
        src = jnp.concatenate([edges[:, 0], neg[0]])
        dst = jnp.concatenate([edges[:, 1], neg[1]])

        if use_kd:
            samples = sample_contexts(
                k_ctx, graph, anchors, ps_method=ps_method,
                step=rw_step, hops=hops, ns_rate=ns_rate,
            )  # (bn, 1 + c)

        if minibatch:
            # One gathered forward over [contexts | src | dst] (main.py:95-96).
            if use_kd:
                targets = jnp.concatenate([samples.reshape(-1), src, dst])
            else:
                targets = jnp.concatenate([src, dst])
            hrows = apply_mlp(
                params["encoder"], jnp.take(x, targets, axis=0),
                dropout=dropout, train=True, rng=k_drop, norm_type=norm_type,
            )
            new_norm_state = None
            if stateful:
                hrows, new_norm_state = hrows
            if use_kd:
                nctx = bn * (1 + c)
                ctx_h = hrows[:nctx].reshape(bn, 1 + c, -1)
                anchor_h = ctx_h[:, 0, :]
                ctx_rest_h = ctx_h[:, 1:, :]
                src_h = hrows[nctx : nctx + src.shape[0]]
                dst_h = hrows[nctx + src.shape[0] :]
            else:
                src_h = hrows[: src.shape[0]]
                dst_h = hrows[src.shape[0] :]
        else:
            h = apply_mlp(
                params["encoder"], x, dropout=dropout, train=True, rng=k_drop,
                norm_type=norm_type,
            )
            new_norm_state = None
            if stateful:
                h, new_norm_state = h
            if use_kd:
                anchor_h = jnp.take(h, samples[:, 0], axis=0)
                ctx_rest_h = jnp.take(h, samples[:, 1:].reshape(-1), axis=0).reshape(
                    bn, c, -1
                )
            src_h = jnp.take(h, src, axis=0)
            dst_h = jnp.take(h, dst, axis=0)

        loss = jnp.float32(0.0)

        if use_kd:
            # Student context scores s_r (bn, c) and teacher t_r (main.py:184-187).
            s_r = apply_link_predictor(
                params["predictor"], anchor_h[:, None, :], ctx_rest_h,
                mode=predictor_mode, dropout=dropout, train=True,
                rng=jax.random.fold_in(k_pred, 1),
            )
            t_anchor = jnp.take(t_h, samples[:, 0], axis=0)
            t_ctx = jnp.take(t_h, samples[:, 1:].reshape(-1), axis=0).reshape(bn, c, -1)
            t_r = apply_link_predictor(
                tpred, t_anchor[:, None, :], t_ctx, mode=predictor_mode, train=False
            )
            t_r = jax.lax.stop_gradient(t_r)

            if llp_d != 0.0:
                loss = loss + llp_d * kl_div_loss(s_r, t_r, 1.0, row_mask=amask)
            if llp_r != 0.0 and pair_chunks is not None:
                p0c, p1c, pvc = pair_chunks

                @jax.checkpoint
                def pair_chunk_sums(s_r, t_r, amask, p0, p1, pv):
                    t0 = jnp.take(t_r, p0, axis=1)
                    t1 = jnp.take(t_r, p1, axis=1)
                    target = jnp.where(
                        t0 > t1 + margin, 1.0, jnp.where(t0 < t1 - margin, -1.0, 0.0)
                    )
                    s0 = jnp.take(s_r, p0, axis=1).astype(jnp.float32)
                    s1 = jnp.take(s_r, p1, axis=1).astype(jnp.float32)
                    elt = jnp.maximum(0.0, -target * (s0 - s1) + margin)
                    m = (amask[:, None] & pv[None, :]).astype(jnp.float32)
                    return jnp.sum(elt * m), jnp.sum(m)

                def pair_chunk(carry, inp):
                    num, den = carry
                    cn, cd = pair_chunk_sums(s_r, t_r, amask, *inp)
                    return (num + cn, den + cd), None

                (pnum, pden), _ = jax.lax.scan(
                    pair_chunk,
                    (jnp.float32(0.0), jnp.float32(0.0)),
                    (p0c, p1c, pvc),
                )
                loss = loss + llp_r * pnum / jnp.maximum(pden, 1.0)
            elif llp_r != 0.0:
                p0, p1 = pairs[0], pairs[1]
                t0 = jnp.take(t_r, p0, axis=1)
                t1 = jnp.take(t_r, p1, axis=1)
                target = jnp.where(
                    t0 > t1 + margin, 1.0, jnp.where(t0 < t1 - margin, -1.0, 0.0)
                )
                s0 = jnp.take(s_r, p0, axis=1)
                s1 = jnp.take(s_r, p1, axis=1)
                pmask = jnp.broadcast_to(amask[:, None], target.shape)
                loss = loss + llp_r * margin_rank_loss(s0, s1, target, margin, pmask)

        # True-label BCE over [pos ; neg] (main.py:211-215).
        out = apply_link_predictor(
            params["predictor"], src_h, dst_h, mode=predictor_mode,
            dropout=dropout, train=True, rng=jax.random.fold_in(k_pred, 0),
        )
        labels = jnp.concatenate([jnp.ones((bl,)), jnp.zeros((bl,))])
        fmask = jnp.concatenate([emask, emask])
        loss = loss + true_label * bce_loss(out, labels, fmask)

        if not minibatch:
            if kd_rm != 0.0:
                h_anchor = jnp.take(h, anchors, axis=0)
                t_a = jnp.take(t_h, anchors, axis=0)
                loss = loss + kd_rm * cosine_loss(h_anchor, t_a, amask)
            if kd_lm != 0.0:
                t_out = apply_link_predictor(
                    tpred,
                    jnp.take(t_h, src, axis=0),
                    jnp.take(t_h, dst, axis=0),
                    mode=predictor_mode,
                    train=False,
                )
                loss = loss + kd_lm * mse_loss(out, t_out, fmask)
        return loss, new_norm_state

    # Donate the consumed training state (see teacher.py).
    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def epoch_fn(params, opt_state, key, graph, x, t_h, tpred, pos_edges, neg_keys):
        # Cast the big read-only tensors once, outside the batch scan; the
        # frozen teacher artifacts join the student in the compute dtype.
        if x.dtype == jnp.float32:
            x = x.astype(cdtype)
        if t_h.dtype == jnp.float32:
            t_h = t_h.astype(cdtype)
        tpred = cast_params(tpred, cdtype)

        def one_epoch(carry, ekey):
            params, opt_state = carry
            k_lperm, k_nperm, k_steps = jax.random.split(ekey, 3)
            lperm = jax.random.permutation(k_lperm, e)
            lpad = steps * bl - e
            lperm = jnp.concatenate(
                [lperm, jnp.full((lpad,), e, lperm.dtype)]
            ).reshape(steps, bl)
            nperm = jax.random.permutation(k_nperm, num_nodes)
            npad = max(steps * bn - num_nodes, 0)
            nperm = jnp.concatenate(
                [nperm, jnp.full((npad,), num_nodes, nperm.dtype)]
            )[: steps * bn].reshape(steps, bn)

            def step(carry, inp):
                params, opt_state, tl, tn = carry
                lidx, nidx, i = inp
                emask = lidx < e
                edges = pos_edges[jnp.clip(lidx, 0, e - 1)]
                amask = nidx < num_nodes
                anchors = jnp.clip(nidx, 0, num_nodes - 1).astype(jnp.int32)
                rng = jax.random.fold_in(k_steps, i)
                (loss, new_norm_state), grads = jax.value_and_grad(
                    batch_loss, has_aux=True
                )(params, rng, graph, x, t_h, tpred, edges, emask, anchors,
                  amask, neg_keys)
                grads = clip_by_group_norm(grads, 1.0)
                params, opt_state = adam_update(tx, grads, opt_state, params)
                if stateful:
                    # Running batch-norm buffers: zero-grad under Adam;
                    # replace them with the forward's momentum-updated values.
                    params = dict(
                        params,
                        encoder=dict(params["encoder"], norm_state=new_norm_state),
                    )
                n = jnp.sum(emask.astype(jnp.float32))
                return (params, opt_state, tl + loss * n, tn + n), None

            (params, opt_state, tl, tn), _ = jax.lax.scan(
                step,
                (params, opt_state, jnp.float32(0.0), jnp.float32(0.0)),
                (lperm, nperm, jnp.arange(steps)),
            )
            return (params, opt_state), tl / jnp.maximum(tn, 1.0)

        keys = key[None] if epochs_per_call == 1 else key
        (params, opt_state), losses = jax.lax.scan(
            one_epoch, (params, opt_state), keys
        )
        return params, opt_state, losses[0] if epochs_per_call == 1 else losses

    return epoch_fn, tx
