"""Edge-partitioned + data-parallel training steps under ``shard_map``.

The multi-chip execution model (SURVEY.md §2.3, BASELINE north star):

* **edges sharded** over the 1-D ``data`` mesh axis — each device aggregates
  only its own edge shard (gather + segment-sum over the full node range) and
  a single ``psum`` merges partial node aggregates.  XLA compiles the psum to
  an ICI all-reduce; this is the TPU-native form of the reference's (absent)
  distributed backend, replacing torch_sparse SpMM + NCCL with one collective.
* **node features + params replicated** (models are ≤3-layer stacks; DP).
* **link/anchor batches sharded** along the same axis; losses are computed as
  per-device masked sums, psum'd, and normalized globally — bitwise the same
  reduction as the single-device path.
* gradients come out of ``jax.grad`` *inside* the shard_map and are then
  explicitly ``psum``'d: each device's backward covers only ITS edge/batch
  shard's contribution (the psum'd loss transposes to per-shard cotangents),
  and the total gradient is their sum — after which every device holds the
  identical global gradient and one Adam update runs replicated.

These step functions are the ``dryrun_multichip`` surface and compile/run on
an N-virtual-device CPU mesh as well as a real slice.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from llp_tpu.models.init import apply_linear
from llp_tpu.models.predictor import apply_link_predictor
from llp_tpu.ops.losses import bce_loss
from llp_tpu.sample.walk import sample_contexts
from llp_tpu.train.optim import adam_update, clip_by_group_norm


def make_sharded_spmm(mesh: Mesh, num_nodes: int, axis: str = "data") -> Callable:
    """spmm(senders, receivers, edge_mask, in_degree, x, reduce) with edge
    arrays sharded on ``axis`` and x/out replicated."""

    def local_agg(senders, receivers, emask, in_degree, x, reduce):
        acc = jnp.float32
        msgs = jnp.take(x, senders, axis=0).astype(acc)
        msgs = jnp.where(emask[:, None], msgs, 0.0)
        # Contiguous shards of the receiver-sorted canonical COO stay sorted.
        out = jax.ops.segment_sum(
            msgs, receivers, num_segments=num_nodes, indices_are_sorted=True
        )
        out = jax.lax.psum(out, axis)
        if reduce == "mean":
            out = out / jnp.maximum(in_degree.astype(acc), 1.0)[:, None]
        return out.astype(x.dtype)

    def spmm_fn(senders, receivers, edge_mask, in_degree, x, reduce="mean"):
        f = partial(local_agg, reduce=reduce)
        return shard_map(
            f,
            mesh=mesh,
            in_specs=(P(axis), P(axis), P(axis), P(), P()),
            out_specs=P(),
        )(senders, receivers, edge_mask, in_degree, x)

    return spmm_fn


def make_sharded_segsum_spmm(mesh: Mesh, layouts, num_nodes: int, axis: str = "data"):
    """Edge-partitioned SpMM where each device's local aggregation (fwd and
    bwd) runs through the windowed Pallas segsum kernel; a single psum merges
    the partial node sums.  ``layouts`` from ``build_shard_layouts(graph,
    mesh.size)``.  Returns ``spmm_fn(x, in_degree, reduce)``; differentiable.
    """
    from llp_tpu.ops.pallas.segsum_kernel import make_local_blocked_sum

    local = make_local_blocked_sum(layouts, num_nodes)
    lay_args = (
        layouts.fwd_senders, layouts.fwd_local, layouts.fwd_r0,
        layouts.bwd_senders, layouts.bwd_local, layouts.bwd_r0,
    )

    @partial(jax.jit, static_argnames=("reduce",))
    def spmm_fn(x, in_degree, reduce="mean"):
        def body(x, in_deg, *lay_stacked):
            lay = tuple(a[0] for a in lay_stacked)
            out = jax.lax.psum(local(x, *lay), axis)
            if reduce == "mean":
                out = out / jnp.maximum(in_deg.astype(jnp.float32), 1.0)[:, None]
            return out.astype(x.dtype)

        return shard_map(
            body,
            mesh=mesh,
            in_specs=(P(), P()) + (P(axis),) * len(lay_args),
            out_specs=P(),
            check_vma=False,
        )(x, in_degree, *lay_args)

    return spmm_fn


def _sage_forward(params, x, spmm_local, *, dropout, rng, conv="sage"):
    """SAGE stack using a caller-supplied (already device-local) spmm."""
    convs = params["convs"]
    h = x
    for i, cp in enumerate(convs):
        if conv == "sage_updated":
            out = apply_linear(cp["lin_l"], h)
            out = spmm_local(out) + apply_linear(cp["lin_r"], h)
        else:
            out = apply_linear(cp["lin_l"], spmm_local(h)) + apply_linear(
                cp["lin_r"], h
            )
        if i != len(convs) - 1:
            out = jax.nn.relu(out)
            if rng is not None and dropout > 0.0:
                keep = 1.0 - dropout
                m = jax.random.bernoulli(jax.random.fold_in(rng, i), keep, out.shape)
                out = jnp.where(m, out / keep, 0.0)
        h = out
    return h


def make_sharded_teacher_step(
    mesh: Mesh,
    *,
    num_nodes: int,
    predictor_mode: str = "mlp",
    conv: str = "sage",
    dropout: float = 0.5,
    lr: float = 0.005,
    axis: str = "data",
    segsum_layouts=None,
):
    """One DP+edge-partitioned teacher train step.

    Returns ``(step_fn, tx)``;
    ``step_fn(params, opt_state, rng, senders, receivers, edge_mask,
    in_degree, x, pos_batch, neg_batch, batch_mask)``
    with edge arrays and batches sharded on ``axis``, everything else
    replicated.  ``pos_batch``/``neg_batch``: (B, 2) int32; ``batch_mask``:
    (B,) bool.  Negatives are pre-sampled on the host/driver (sharded
    rejection sampling arrives with the sharded sampler).

    ``segsum_layouts``: optional
    :class:`llp_tpu.ops.pallas.segsum_kernel.ShardedSegsumLayouts` (from
    ``build_shard_layouts(graph, mesh.size)``) — routes each device's local
    aggregation (both directions) through the windowed Pallas kernel instead
    of the XLA scatter.
    """
    import optax

    tx = optax.adam(lr)
    local_sum = None
    if segsum_layouts is not None:
        from llp_tpu.ops.pallas.segsum_kernel import make_local_blocked_sum

        local_sum = make_local_blocked_sum(segsum_layouts, num_nodes)

    def device_loss(params, rng, senders, receivers, emask, in_deg, x,
                    pos, neg, bmask, lay):
        def spmm_local(feats):
            acc = jnp.float32
            if local_sum is not None:
                out = local_sum(feats, *lay)
            else:
                msgs = jnp.take(feats, senders, axis=0).astype(acc)
                msgs = jnp.where(emask[:, None], msgs, 0.0)
                # Contiguous shards of the receiver-sorted canonical COO stay
                # sorted.
                out = jax.ops.segment_sum(
                    msgs, receivers, num_segments=num_nodes, indices_are_sorted=True
                )
            out = jax.lax.psum(out, axis)
            out = out / jnp.maximum(in_deg.astype(acc), 1.0)[:, None]
            return out.astype(feats.dtype)

        # Encoder dropout uses the DEVICE-INVARIANT key: h is replicated
        # (psum'd aggregation), all devices must draw the same mask. The
        # predictor acts on this device's batch shard — fold the device
        # index so shards don't share mask bits across examples.
        h = _sage_forward(
            params["encoder"], x, spmm_local, dropout=dropout,
            rng=jax.random.fold_in(rng, 0), conv=conv,
        )
        src = jnp.concatenate([pos[:, 0], neg[:, 0]])
        dst = jnp.concatenate([pos[:, 1], neg[:, 1]])
        out = apply_link_predictor(
            params["predictor"],
            jnp.take(h, src, axis=0),
            jnp.take(h, dst, axis=0),
            mode=predictor_mode,
            dropout=dropout,
            train=True,
            rng=jax.random.fold_in(
                jax.random.fold_in(rng, 1), jax.lax.axis_index(axis)
            ),
        )
        labels = jnp.concatenate(
            [jnp.ones((pos.shape[0],)), jnp.zeros((neg.shape[0],))]
        )
        fmask = jnp.concatenate([bmask, bmask]).astype(jnp.float32)
        # global mean via psum'd sums — identical to the single-device BCE.
        p = jnp.clip(out.astype(jnp.float32), 1e-12, 1.0 - 1e-12)
        elt = -(labels * jnp.log(p) + (1 - labels) * jnp.log(1 - p)) * fmask
        num = jax.lax.psum(jnp.sum(elt), axis)
        den = jax.lax.psum(jnp.sum(fmask), axis)
        return num / jnp.maximum(den, 1.0)

    def sharded_grad(params, rng, senders, receivers, emask, in_deg, x, pos,
                     neg, bmask, *lay_stacked):
        # Layout slices arrive with a leading shard dim of 1 — drop it.
        lay = tuple(a[0] for a in lay_stacked)
        loss, grads = jax.value_and_grad(device_loss)(
            params, rng, senders, receivers, emask, in_deg, x, pos, neg, bmask,
            lay,
        )
        # pmean, NOT psum: device_loss returns the REPLICATED (fully psum'd)
        # scalar, so each of the ndev loss copies injects a unit cotangent
        # and the raw psum of the per-device grad pieces is ndev times the
        # true gradient (masked in training by the norm clip whenever grad
        # norms exceed the threshold). pmean (= psum / ndev) is exact.
        grads = jax.tree_util.tree_map(lambda g: jax.lax.pmean(g, axis), grads)
        return loss, grads

    lay_args = ()
    if segsum_layouts is not None:
        lay_args = (
            segsum_layouts.fwd_senders, segsum_layouts.fwd_local,
            segsum_layouts.fwd_r0, segsum_layouts.bwd_senders,
            segsum_layouts.bwd_local, segsum_layouts.bwd_r0,
        )

    @jax.jit
    def step_fn(params, opt_state, rng, senders, receivers, edge_mask,
                in_degree, x, pos_batch, neg_batch, batch_mask):
        loss, grads = shard_map(
            sharded_grad,
            mesh=mesh,
            in_specs=(
                P(),        # params (replicated)
                P(),        # rng
                P(axis),    # senders
                P(axis),    # receivers
                P(axis),    # edge_mask
                P(),        # in_degree
                P(),        # x
                P(axis),    # pos_batch
                P(axis),    # neg_batch
                P(axis),    # batch_mask
            ) + (P(axis),) * len(lay_args),  # per-shard kernel layouts
            out_specs=(P(), P()),
            check_vma=False,
        )(params, rng, senders, receivers, edge_mask, in_degree, x,
          pos_batch, neg_batch, batch_mask, *lay_args)
        grads = clip_by_group_norm(grads, 1.0)
        params, opt_state = adam_update(tx, grads, opt_state, params)
        return params, opt_state, loss

    return step_fn, tx


def make_sharded_student_step(
    mesh: Mesh,
    *,
    num_nodes: int,
    predictor_mode: str = "mlp",
    dropout: float = 0.5,
    lr: float = 0.005,
    true_label: float = 0.1,
    llp_d: float = 1.0,
    llp_r: float = 1.0,
    margin: float = 0.1,
    rw_step: int = 3,
    hops: int = 2,
    ns_rate: int = 1,
    ps_method: str = "nb",
    axis: str = "data",
):
    """One DP student KD step: anchors + link batch sharded, features/teacher
    replicated.  Context walks run per-device on the replicated CSR over the
    local anchor shard (walk gathers are embarrassingly parallel)."""
    import optax

    from llp_tpu.models.mlp import apply_mlp
    from llp_tpu.ops.losses import kl_div_loss, margin_rank_loss
    from llp_tpu.train.student import pair_table

    tx = optax.adam(lr)
    c = rw_step * hops * (1 + ns_rate)
    pairs = pair_table(c)

    def device_loss(params, rng, graph, x, t_h, tpred, anchors, amask,
                    pos, neg, bmask):
        k_ctx, k_drop, k_pred = jax.random.split(rng, 3)
        # Anchors and link batches are sharded: walk and predictor-mask draws
        # are positionally keyed, so a device-invariant key would give every
        # shard the same bit stream for different rows — fold the device in.
        # k_drop stays shared: h is the full replicated node table.
        me = jax.lax.axis_index(axis)
        k_ctx = jax.random.fold_in(k_ctx, me)
        k_pred = jax.random.fold_in(k_pred, me)
        samples = sample_contexts(
            k_ctx, graph, anchors, ps_method=ps_method,
            step=rw_step, hops=hops, ns_rate=ns_rate,
        )

        h = apply_mlp(params["encoder"], x, dropout=dropout, train=True, rng=k_drop)
        anchor_h = jnp.take(h, samples[:, 0], axis=0)
        ctx_h = jnp.take(h, samples[:, 1:].reshape(-1), axis=0).reshape(
            anchors.shape[0], c, -1
        )
        s_r = apply_link_predictor(
            params["predictor"], anchor_h[:, None, :], ctx_h,
            mode=predictor_mode, dropout=dropout, train=True, rng=k_pred,
        )
        t_anchor = jnp.take(t_h, samples[:, 0], axis=0)
        t_ctx = jnp.take(t_h, samples[:, 1:].reshape(-1), axis=0).reshape(
            anchors.shape[0], c, -1
        )
        t_r = jax.lax.stop_gradient(
            apply_link_predictor(
                tpred, t_anchor[:, None, :], t_ctx, mode=predictor_mode, train=False
            )
        )

        # Per-device sums, psum-normalized — same math as the global means.
        af = amask.astype(jnp.float32)
        nrow = jnp.maximum(jax.lax.psum(jnp.sum(af), axis), 1.0)

        loss = jnp.float32(0.0)
        if llp_d != 0.0:
            y_s = jax.nn.log_softmax(s_r.astype(jnp.float32), axis=-1)
            p_t = jax.nn.softmax(t_r.astype(jnp.float32), axis=-1)
            elt = p_t * (jnp.log(jnp.maximum(p_t, 1e-12)) - y_s)
            loss = loss + llp_d * jax.lax.psum(jnp.sum(elt * af[:, None]), axis) / nrow
        if llp_r != 0.0:
            t0 = jnp.take(t_r, pairs[0], axis=1)
            t1 = jnp.take(t_r, pairs[1], axis=1)
            tgt = jnp.where(t0 > t1 + margin, 1.0, jnp.where(t0 < t1 - margin, -1.0, 0.0))
            s0 = jnp.take(s_r, pairs[0], axis=1).astype(jnp.float32)
            s1 = jnp.take(s_r, pairs[1], axis=1).astype(jnp.float32)
            elt = jnp.maximum(0.0, -tgt * (s0 - s1) + margin) * af[:, None]
            npair = jnp.maximum(jax.lax.psum(jnp.sum(af), axis) * pairs.shape[1], 1.0)
            loss = loss + llp_r * jax.lax.psum(jnp.sum(elt), axis) / npair

        src = jnp.concatenate([pos[:, 0], neg[:, 0]])
        dst = jnp.concatenate([pos[:, 1], neg[:, 1]])
        out = apply_link_predictor(
            params["predictor"], jnp.take(h, src, axis=0), jnp.take(h, dst, axis=0),
            mode=predictor_mode, dropout=dropout, train=True,
            rng=jax.random.fold_in(k_pred, 1),
        )
        labels = jnp.concatenate([jnp.ones((pos.shape[0],)), jnp.zeros((neg.shape[0],))])
        fmask = jnp.concatenate([bmask, bmask]).astype(jnp.float32)
        p = jnp.clip(out.astype(jnp.float32), 1e-12, 1.0 - 1e-12)
        elt = -(labels * jnp.log(p) + (1 - labels) * jnp.log(1 - p)) * fmask
        bnum = jax.lax.psum(jnp.sum(elt), axis)
        bden = jnp.maximum(jax.lax.psum(jnp.sum(fmask), axis), 1.0)
        loss = loss + true_label * bnum / bden
        return loss

    def sharded_grad(params, rng, graph, x, t_h, tpred, anchors, amask, pos, neg, bmask):
        loss, grads = jax.value_and_grad(device_loss)(
            params, rng, graph, x, t_h, tpred, anchors, amask, pos, neg, bmask
        )
        # pmean, not psum — the replicated loss makes psum ndev-times the
        # true gradient (see the teacher step).
        grads = jax.tree_util.tree_map(lambda g: jax.lax.pmean(g, axis), grads)
        return loss, grads

    @jax.jit
    def step_fn(params, opt_state, rng, graph, x, t_h, tpred,
                anchors, amask, pos_batch, neg_batch, batch_mask):
        loss, grads = shard_map(
            sharded_grad,
            mesh=mesh,
            in_specs=(
                P(), P(), P(), P(), P(), P(),
                P(axis), P(axis), P(axis), P(axis), P(axis),
            ),
            out_specs=(P(), P()),
            check_vma=False,
        )(params, rng, graph, x, t_h, tpred, anchors, amask,
          pos_batch, neg_batch, batch_mask)
        grads = clip_by_group_norm(grads, 1.0)
        params, opt_state = adam_update(tx, grads, opt_state, params)
        return params, opt_state, loss

    return step_fn, tx
