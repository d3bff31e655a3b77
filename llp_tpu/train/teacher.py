"""Teacher (supervised GNN) training — whole epochs jit-compiled on device.

Reproduces the reference teacher loop (reference ``src/train_teacher_gnn.py:
21-73``): per link-batch, a FULL-GRAPH encoder forward, fresh negatives, BCE
on sigmoid pair scores over [positives; negatives], per-group grad-clip 1.0,
Adam.  The epoch's batch loop is a ``lax.scan`` inside one jit, so the host
never intervenes between batches — on cora-scale graphs the whole epoch is a
single device program (vs. the reference's one Python round-trip per batch).

Batches have static shape: the epoch permutation is padded to steps×B with a
sentinel and masked, so the last (smaller) reference batch is reproduced by
masking, not by a recompile.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from llp_tpu.core.graph import Graph
from llp_tpu.models.encoder import apply_encoder, precompute_first_aggregation
from llp_tpu.models.predictor import apply_link_predictor
from llp_tpu.ops.losses import bce_loss
from llp_tpu.sample.negative import sample_negative_edges, sample_uniform_edges
from llp_tpu.train.optim import adam_init, adam_update, clip_by_group_norm
from llp_tpu.utils.precision import cast_params, resolve_dtype


def should_hoist_first_agg(
    encoder: str, conv: str, d_in: int, h_out: int, e_pad: int, total_steps: int
) -> bool:
    """Gate for hoisting the weight-free layer-1 aggregation out of the batch
    loop.  Hoisting trades ``total_steps`` layer-1 SpMMs for ONE per program —
    but at the INPUT width.  For agg-then-linear SAGE the unhoisted SpMM
    already runs at width d_in, so hoisting is a pure win; for linear-then-
    aggregate SAGE and GCN the unhoisted SpMM runs at width h_out (that order
    exists exactly because D >> H on coauthor-physics, reference
    train_teacher_gnn.py:375-383), so hoist only when (a) one wide pass costs
    less than ``total_steps`` narrow ones AND (b) the (E_pad, D) message
    tensor the wide SpMM materializes actually fits — at physics scale (560k
    edges × 8415 features) it would alone be ~19 GB."""
    if encoder == "mlp":
        return False
    if encoder == "sage" and conv == "sage":
        return True  # the unhoisted SpMM runs at width d_in anyway
    flop_ok = d_in <= total_steps * h_out
    mem_ok = e_pad * d_in * 4 <= 2 * 1024**3
    return flop_ok and mem_ok


def init_teacher_params(key, *, encoder, in_channels, hidden_channels, num_layers,
                        predictor_mode, predictor_layers=2, norm_type="none"):
    """Teacher = encoder + LinkPredictor(hidden, hidden, 1, 2) — predictor
    depth hardcoded to 2 in the reference (train_teacher_gnn.py:391-392)."""
    from llp_tpu.models.encoder import init_encoder
    from llp_tpu.models.predictor import init_link_predictor

    k1, k2 = jax.random.split(key)
    return {
        "encoder": init_encoder(
            k1, encoder, in_channels, hidden_channels, hidden_channels,
            num_layers, norm_type=norm_type,
        ),
        "predictor": init_link_predictor(
            k2, predictor_mode, hidden_channels, hidden_channels, 1, predictor_layers
        ),
    }


def make_teacher_epoch_fn(
    *,
    encoder: str,
    conv: str = "sage",
    predictor_mode: str = "mlp",
    dropout: float = 0.5,
    num_nodes: int,
    num_pos_edges: int,
    link_batch_size: int,
    neg_mode: str = "dense",
    lr: float = 0.005,
    spmm_impl: str = "xla",
    norm_type: str = "none",
    compute_dtype="float32",
    epochs_per_call: int = 1,
    gather_last: bool = False,
    remat: bool = False,
    hoist: bool | None = None,
    donate_x: bool = False,
    packed_x: bool = False,
):
    """Build a jitted epoch function.

    ``remat=True`` wraps the encoder call in ``jax.checkpoint``: hidden-
    layer pre-activations are recomputed in the backward instead of saved.
    With ``gather_last`` the recompute DCEs the final-layer aggregation
    (its output feeds only gathered rows), so the time cost is one cheap
    linear+relu replay while ~2 (N, H)-sized residuals leave the step's
    peak — the knob that fits a 10M-node teacher on a 16 GB chip
    (measured: one-step program 17.0 GB -> fits after remat).

    Returns ``(epoch_fn, tx)`` where
    ``epoch_fn(params, opt_state, key, graph, x, pos_edges, neg_keys)
      -> (params, opt_state, mean_loss)``
    and ``pos_edges`` is the full (E, 2) positive edge array, ``neg_keys`` the
    sorted int32 exclusion keys for dense negative sampling (ignored for
    neg_mode='uniform', the collab path).

    ``epochs_per_call > 1`` fuses that many epochs into ONE device program
    (epoch-level ``lax.scan``): the per-dispatch tunnel latency and the
    layer-1 aggregation hoist amortize across the block.  ``key`` must then
    be a stacked (epochs_per_call, ...) array of per-epoch keys, and the
    returned loss is the (epochs_per_call,) per-epoch mean-loss vector.

    ``packed_x=True`` (sage family): the ``x`` argument is the packed
    (N, 2D) pair from
    :func:`llp_tpu.models.encoder.pack_first_layer_input`, computed ONCE
    per run outside the program; no in-program hoist runs and layer 1 is a
    single stacked-weight matmul.  At huge N this removes two program-
    lifetime (N, D) buffers (lane padding + the loop-invariant-x copy —
    see pack_first_layer_input's docstring).
    """
    if packed_x and encoder != "sage":
        raise ValueError("packed_x requires the sage encoder family")
    e = num_pos_edges
    b = min(link_batch_size, e)
    steps = -(-e // b)

    tx, _ = adam_init({}, lr)  # template; real state made by caller via tx.init

    stateful = norm_type == "batch"
    cdtype = resolve_dtype(compute_dtype)

    def _should_hoist(d_in: int, h_out: int, e_pad: int) -> bool:
        if hoist is not None:
            # Explicit override: at extreme scale the hoisted (N, D) x_agg
            # is program-lifetime residency; hoist=False + remat trades two
            # recomputed layer-1 SpMMs per step for that memory (the knob
            # the 10M-node single-chip run needs).
            return hoist and encoder != "mlp"
        return should_hoist_first_agg(
            encoder, conv, d_in, h_out, e_pad, steps * epochs_per_call
        )

    def batch_loss(params, rng, graph, x, x_agg, edges, mask, neg_keys):
        params = cast_params(params, cdtype)  # fwd/bwd in compute dtype
        k_drop, k_pred, k_neg = jax.random.split(rng, 3)
        if neg_mode == "dense":
            neg = sample_negative_edges(k_neg, neg_keys, b, num_nodes)
        else:
            neg = sample_uniform_edges(k_neg, b, num_nodes)
        src = jnp.concatenate([edges[:, 0], neg[0]])
        dst = jnp.concatenate([edges[:, 1], neg[1]])
        enc_kwargs = dict(
            dropout=dropout, train=True, conv=conv,
            norm_type=norm_type, impl=spmm_impl, packed_first=packed_x,
        )
        new_norm_state = None

        def enc(p_enc, graph, x, x_agg, rng, last_rows):
            return apply_encoder(
                encoder, p_enc, graph, x, rng=rng, x_agg=x_agg,
                last_rows=last_rows, **enc_kwargs,
            )

        if remat:
            enc = jax.checkpoint(enc)
        if gather_last:
            # Final-layer projection of the 4b gathered endpoint rows only:
            # the (N, H) last embedding and its cotangent never materialize
            # (exact up to float reassociation — see apply_encoder).
            rows = enc(
                params["encoder"], graph, x, x_agg, k_drop,
                jnp.concatenate([src, dst]),
            )
            if stateful:
                rows, new_norm_state = rows
            hi, hj = rows[: 2 * b], rows[2 * b:]
        else:
            h = enc(params["encoder"], graph, x, x_agg, k_drop, None)
            if stateful:
                h, new_norm_state = h
            hi = jnp.take(h, src, axis=0)
            hj = jnp.take(h, dst, axis=0)
        out = apply_link_predictor(
            params["predictor"], hi, hj, mode=predictor_mode,
            dropout=dropout, train=True, rng=k_pred,
        )
        labels = jnp.concatenate([jnp.ones((b,)), jnp.zeros((b,))])
        full_mask = jnp.concatenate([mask, mask])
        return bce_loss(out, labels, full_mask), new_norm_state

    # params/opt_state are consumed and re-emitted every call: donate their
    # buffers so XLA updates in place instead of double-buffering HBM.
    # donate_x additionally donates the feature matrix AND re-emits it as a
    # 4th output: x is read-only, but a non-donated input used inside the
    # nested epoch/chunk loops forced XLA to keep a full internal COPY
    # (2.4 GB measured at N=10M) — donation lets the program alias it.
    donate = (0, 1, 4) if donate_x else (0, 1)

    @functools.partial(jax.jit, donate_argnums=donate)
    def epoch_fn(params, opt_state, key, graph: Graph, x, pos_edges, neg_keys):
        if x.dtype == jnp.float32:
            x = x.astype(cdtype)  # cast once, outside the scan
        # Layer-1 aggregation is weight-free: one full-graph SpMM per PROGRAM
        # instead of per batch (exact — aggregation commutes with weights),
        # gated on profitability (see _should_hoist).
        x_agg = None
        if encoder != "mlp" and not packed_x:
            conv0 = params["encoder"]["convs"][0]
            h_out = (conv0["lin_l"] if "lin_l" in conv0 else conv0["lin"])["w"].shape[1]
            if _should_hoist(int(x.shape[1]), int(h_out), graph.num_padded_edges):
                x_agg = precompute_first_aggregation(
                    encoder, graph, x, conv=conv, impl=spmm_impl
                )

        def one_epoch(carry, ekey):
            params, opt_state = carry
            k_perm, k_steps = jax.random.split(ekey)
            perm = jax.random.permutation(k_perm, e)
            pad = steps * b - e
            perm = jnp.concatenate([perm, jnp.full((pad,), e, perm.dtype)])
            perm = perm.reshape(steps, b)

            def step(carry, inp):
                params, opt_state, total_loss, total_n = carry
                idx, i = inp
                mask = idx < e
                edges = pos_edges[jnp.clip(idx, 0, e - 1)]
                rng = jax.random.fold_in(k_steps, i)
                (loss, new_norm_state), grads = jax.value_and_grad(
                    batch_loss, has_aux=True
                )(params, rng, graph, x, x_agg, edges, mask, neg_keys)
                grads = clip_by_group_norm(grads, 1.0)
                params, opt_state = adam_update(tx, grads, opt_state, params)
                if stateful:
                    # Running batch-norm buffers: zero-grad under Adam;
                    # replace them with the forward's momentum-updated values.
                    params = dict(
                        params,
                        encoder=dict(params["encoder"], norm_state=new_norm_state),
                    )
                n = jnp.sum(mask.astype(jnp.float32))
                return (params, opt_state, total_loss + loss * n, total_n + n), None

            (params, opt_state, tl, tn), _ = jax.lax.scan(
                step,
                (params, opt_state, jnp.float32(0.0), jnp.float32(0.0)),
                (perm, jnp.arange(steps)),
            )
            return (params, opt_state), tl / jnp.maximum(tn, 1.0)

        keys = key[None] if epochs_per_call == 1 else key
        (params, opt_state), losses = jax.lax.scan(
            one_epoch, (params, opt_state), keys
        )
        loss_out = losses[0] if epochs_per_call == 1 else losses
        if donate_x:
            return params, opt_state, loss_out, x
        return params, opt_state, loss_out

    return epoch_fn, tx
