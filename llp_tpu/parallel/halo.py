"""Feature-sharded SpMM with halo (boundary) exchange over ICI.

The second multi-chip execution model (SURVEY.md §2.3 "Boundary exchange"):
instead of replicating node features and psum-ing partial aggregates
(:mod:`llp_tpu.parallel.sharded` — right for feature matrices that fit every
chip), NODE FEATURES ARE SHARDED BY OWNER:

* nodes are 1-D range-partitioned: device ``p`` owns rows
  ``[p·n_per, (p+1)·n_per)`` of the padded feature matrix;
* edges live with their RECEIVER's owner (the canonical receiver-sorted COO
  makes that a contiguous slice per device);
* each device's edges are split into LOCAL-sender and REMOTE-sender classes
  (both still receiver-sorted). The remote rows each device needs — its halo
  — are statically known per (owner, requester) pair, so the exchange is one
  ``jax.lax.all_to_all`` of padded index-gathered buffers over the mesh
  axis. The local-edge aggregation has no data dependence on the exchange,
  so XLA is FREE to overlap the all_to_all with it — by construction,
  UNMEASURED on real multi-chip hardware (this environment has one chip;
  ``scripts/measure_scaling_multiproc.py`` is the one command to run when
  a real mesh appears — the recorded 0.53 there is a 2-core Gloo number,
  not TPU-predictive).
* aggregation is a sorted per-device segment-sum over
  ``[local rows ; received halo rows]``; the output stays node-sharded, so
  per-row ops (the encoder linears, ReLU, dropout) stay embarrassingly
  row-parallel — a fully feature-sharded GNN layer.

The whole forward is pure JAX inside ``shard_map``; autodiff produces the
reverse exchange (transpose of all_to_all) and owner scatter automatically.

Replaces what a DGL/PyG-distributed deployment gets from its C++
KVStore/sampler halo machinery (the reference itself is single-device; this
subsystem comes from the north-star spec, SURVEY.md §2.3).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map


class HaloPartition(NamedTuple):
    """Static, host-built partition + exchange plan (leading axis = shard)."""

    send_idx: jnp.ndarray      # (P, P, M) int32 — on device q, rows (q-local
    #                            coords) that requester p needs; [q, p, :]
    loc_send: jnp.ndarray      # (P, EL) int32 — local-coord senders
    loc_recv: jnp.ndarray      # (P, EL) int32 — local-coord receivers (pad=n_per)
    rem_send: jnp.ndarray      # (P, ER) int32 — halo-coord senders (see x_ext)
    rem_recv: jnp.ndarray      # (P, ER) int32 — local-coord receivers (pad=n_per)
    n_per: int                 # rows owned per device
    m: int                     # halo rows exchanged per (owner, requester)
    num_shards: int
    num_nodes: int
    # Per-slot edge weights for WEIGHTED graphs (None otherwise): the slot
    # order is a static permutation of the canonical edges, so the weights
    # bake into the plan at build time (pad slots carry 0).  The aggregation
    # then runs weighted with no model-side plumbing: callers additionally
    # pass the WEIGHTED degree as the partition's degree vector (weighted
    # mean = Σ w·x / Σ w).
    loc_w: jnp.ndarray | None = None   # (P, EL) float32
    rem_w: jnp.ndarray | None = None   # (P, ER) float32


def build_halo_partition(graph, num_shards: int) -> HaloPartition:
    """Range-partition a graph for the halo-exchange SpMM (call outside jit).

    Fully vectorized (numpy sort/unique/searchsorted — no per-edge Python):
    planning a 2M-edge collab-scale graph takes milliseconds, not the tens
    of seconds the dict-based remap would.
    """
    if not graph.receiver_sorted:
        raise ValueError(
            "build_halo_partition requires the canonical receiver-sorted "
            "edge order (build_graph produces it); an unsorted Graph would "
            "silently corrupt the per-owner plans"
        )
    n = graph.num_nodes
    p_ = num_shards
    n_per = -(-n // p_)
    e = graph.num_edges
    send = np.asarray(jax.device_get(graph.senders))[:e].astype(np.int64)
    recv = np.asarray(jax.device_get(graph.receivers))[:e].astype(np.int64)
    weighted = graph.edge_weight is not None
    w_all = (
        np.asarray(jax.device_get(graph.edge_weight))[:e].astype(np.float32)
        if weighted
        else None
    )

    # Per requester p: local/remote edge split + the sorted unique remote
    # sender rows (= the halo request list, grouped by owner since global
    # row ids sort by owner under the range partition).
    loc, rem = [], []
    loc_ws, rem_ws = [], []  # per-slot weights, same masks/order as loc/rem
    uniq = []  # per p: (rows_unique, inverse) over remote senders
    for p in range(p_):
        mask_p = (recv // n_per) == p
        es, er = send[mask_p], recv[mask_p]  # still receiver-sorted
        is_local = (es // n_per) == p
        loc.append((es[is_local] - p * n_per, er[is_local] - p * n_per))
        es_r, er_r = es[~is_local], er[~is_local]
        rows_unique, inv = np.unique(es_r, return_inverse=True)
        uniq.append((rows_unique, inv))
        rem.append((es_r, er_r - p * n_per))
        if weighted:
            w_p = w_all[mask_p]
            loc_ws.append(w_p[is_local])
            rem_ws.append(w_p[~is_local])

    # Halo rows exchanged per (owner, requester) = the largest per-owner
    # group among each requester's unique remote rows.
    m = 1
    for rows_unique, _ in uniq:
        if len(rows_unique):
            counts = np.bincount(rows_unique // n_per, minlength=p_)
            m = max(m, int(counts.max()))

    send_idx = np.zeros((p_, p_, m), np.int32)
    el = max(max((len(a) for a, _ in loc), default=0), 1)
    er_max = max(max((len(a) for a, _ in rem), default=0), 1)
    loc_send = np.zeros((p_, el), np.int32)
    loc_recv = np.full((p_, el), n_per, np.int32)
    rem_send = np.zeros((p_, er_max), np.int32)
    rem_recv = np.full((p_, er_max), n_per, np.int32)
    loc_w = np.zeros((p_, el), np.float32) if weighted else None
    rem_w = np.zeros((p_, er_max), np.float32) if weighted else None
    for p in range(p_):
        ls, lr = loc[p]
        loc_send[p, : len(ls)] = ls.astype(np.int32)
        loc_recv[p, : len(lr)] = lr.astype(np.int32)
        if weighted:
            loc_w[p, : len(ls)] = loc_ws[p]
            rem_w[p, : len(rem_ws[p])] = rem_ws[p]
        rows_unique, inv = uniq[p]
        es_r, er_r = rem[p]
        if len(rows_unique):
            owners_u = rows_unique // n_per
            # rows_unique is sorted, so owner groups are contiguous: the
            # rank within the group is the halo slot j; position in x_ext's
            # halo block = owner·m + j.
            starts = np.searchsorted(owners_u, np.arange(p_))
            rank = np.arange(len(rows_unique)) - starts[owners_u]
            for q in range(p_):
                sel = owners_u == q
                cnt = int(sel.sum())
                if cnt:
                    send_idx[q, p, :cnt] = (
                        rows_unique[sel] - q * n_per
                    ).astype(np.int32)
            pos = owners_u * m + rank
            rem_send[p, : len(es_r)] = (n_per + pos[inv]).astype(np.int32)
        rem_recv[p, : len(er_r)] = er_r.astype(np.int32)

    return HaloPartition(
        jnp.asarray(send_idx),
        jnp.asarray(loc_send),
        jnp.asarray(loc_recv),
        jnp.asarray(rem_send),
        jnp.asarray(rem_recv),
        n_per,
        m,
        p_,
        n,
        jnp.asarray(loc_w) if weighted else None,
        jnp.asarray(rem_w) if weighted else None,
    )


def pad_nodes(arr: np.ndarray | jnp.ndarray, part: HaloPartition):
    """Pad a (N, ...) node array to (P·n_per, ...) for sharding on axis 0."""
    total = part.num_shards * part.n_per
    pad = total - arr.shape[0]
    if pad == 0:
        return jnp.asarray(arr)
    widths = [(0, pad)] + [(0, 0)] * (arr.ndim - 1)
    return jnp.pad(jnp.asarray(arr), widths)


def plan_args(part: HaloPartition):
    """The stacked exchange-plan arrays, in ``halo_spmm_local`` order
    (weighted partitions append the per-slot weight planes)."""
    base = (part.send_idx, part.loc_send, part.loc_recv,
            part.rem_send, part.rem_recv)
    if part.loc_w is not None:
        return base + (part.loc_w, part.rem_w)
    return base


def halo_spmm_local(
    part: HaloPartition,
    axis: str,
    x, in_deg, send_idx, ls, lr, rs, rr, lw=None, rw=None,
    *,
    reduce: str = "mean",
):
    """Device-LOCAL halo SpMM body, for composition inside an outer
    ``shard_map`` (the halo train step runs it under the same map as the
    loss).  The plan slices arrive with a leading shard dim of 1 (P(axis)
    sharding of the stacked plan arrays).

    Weighted partitions (``lw``/``rw`` present) aggregate ``Σ w·x`` — for
    the weighted MEAN the caller passes the WEIGHTED degree as ``in_deg``
    (the drivers do: the partition's degree vector is ``w_in_degree`` on
    weighted graphs), for GCN's weighted sym-norm the raw weighted sum is
    exactly what the factored endpoint scalings expect."""
    n_per, m, p_ = part.n_per, part.m, part.num_shards
    send_idx, ls, lr, rs, rr = (
        send_idx[0], ls[0], lr[0], rs[0], rr[0],
    )
    acc = jnp.float32
    # Start the halo exchange: gather requested rows, all-to-all them.
    buf = jnp.take(x, send_idx.reshape(-1), axis=0).reshape(p_, m, -1)
    halo = jax.lax.all_to_all(buf, axis, 0, 0, tiled=True)
    halo = halo.reshape(p_ * m, -1)
    # Local-sender aggregation has no dependence on the exchange — XLA
    # may overlap them (by construction; unmeasured on real ICI).
    msgs_l = jnp.take(x, ls, axis=0).astype(acc)
    if lw is not None:
        msgs_l = msgs_l * lw[0][:, None]
    out = jax.ops.segment_sum(
        msgs_l, lr, num_segments=n_per, indices_are_sorted=True
    )
    # Remote-sender aggregation once the halo lands.
    x_ext = jnp.concatenate([x.astype(acc), halo.astype(acc)], axis=0)
    msgs_r = jnp.take(x_ext, rs, axis=0)
    if rw is not None:
        msgs_r = msgs_r * rw[0][:, None]
    out = out + jax.ops.segment_sum(
        msgs_r, rr, num_segments=n_per, indices_are_sorted=True
    )
    if reduce == "mean":
        out = out / jnp.maximum(in_deg.astype(acc), 1.0)[:, None]
    return out.astype(x.dtype)


def make_halo_spmm(mesh: Mesh, part: HaloPartition, axis: str = "data"):
    """Returns ``spmm_fn(x_sharded, in_degree_sharded, reduce) -> out_sharded``.

    ``x_sharded``: (P·n_per, D) node features sharded on rows; output is
    sharded the same way. Differentiable (autodiff reverses the exchange).
    """

    def spmm_fn(x_sharded, in_degree_sharded, reduce="mean"):
        from functools import partial

        return shard_map(
            partial(halo_spmm_local, part, axis, reduce=reduce),
            mesh=mesh,
            in_specs=(P(axis),) * (2 + len(plan_args(part))),
            out_specs=P(axis),
            check_vma=False,
        )(x_sharded, in_degree_sharded, *plan_args(part))

    return spmm_fn


def make_halo_teacher_step(
    mesh: Mesh,
    part: HaloPartition,
    *,
    predictor_mode: str = "mlp",
    conv: str = "sage",
    dropout: float = 0.5,
    lr: float = 0.005,
    axis: str = "data",
):
    """Feature-sharded teacher train step.

    The encoder runs fully node-sharded (halo-exchange aggregation +
    row-parallel linears/ReLU/dropout — the expensive width-D tensors never
    replicate); only the final H-dim embeddings are ``all_gather``'d for
    edge scoring (H << D is exactly the regime where feature sharding pays).
    Params replicated; link batches sharded; the loss is a psum'd masked
    sum — identical math to the single-device step. Grads come out of
    ``jax.grad`` inside the shard_map (all_gather transposes to
    reduce-scatter, the halo exchange to its reverse).

    Returns ``(step_fn, tx)``;
    ``step_fn(params, opt_state, rng, x_sharded, in_degree_sharded,
    pos_batch, neg_batch, batch_mask)``.
    """
    import optax

    from llp_tpu.models.init import apply_linear
    from llp_tpu.models.predictor import apply_link_predictor
    from llp_tpu.train.optim import adam_update, clip_by_group_norm

    if part.loc_w is not None:
        raise ValueError(
            "make_halo_teacher_step predates weighted partitions; the "
            "whole-epoch path (llp_tpu.parallel.epoch."
            "make_halo_teacher_epoch_fn) carries the weight planes"
        )
    tx = optax.adam(lr)

    def device_loss(params, rng, x, in_deg, send_idx, ls, lr_, rs, rr,
                    pos, neg, bmask):
        def spmm_local(feats):
            return halo_spmm_local(
                part, axis, feats, in_deg, send_idx, ls, lr_, rs, rr,
                reduce="mean",
            )

        dev = jax.lax.axis_index(axis)
        h = x
        convs = params["encoder"]["convs"]
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
                if dropout > 0.0:
                    # node-sharded rows: decorrelate masks across devices
                    k = jax.random.fold_in(jax.random.fold_in(rng, i), dev)
                    keep = 1.0 - dropout
                    msk = jax.random.bernoulli(k, keep, out.shape)
                    out = jnp.where(msk, out / keep, 0.0)
            h = out

        # Only the (narrow) embeddings replicate, for pairwise scoring.
        h_full = jax.lax.all_gather(h, axis, tiled=True)  # (P·n_per, H)
        src = jnp.concatenate([pos[:, 0], neg[:, 0]])
        dst = jnp.concatenate([pos[:, 1], neg[:, 1]])
        out = apply_link_predictor(
            params["predictor"],
            jnp.take(h_full, src, axis=0),
            jnp.take(h_full, dst, axis=0),
            mode=predictor_mode,
            dropout=dropout,
            train=True,
            # batch-sharded predictor rows: fold the device index so shards
            # don't share mask bits across examples
            rng=jax.random.fold_in(jax.random.fold_in(rng, 99), dev),
        )
        labels = jnp.concatenate(
            [jnp.ones((pos.shape[0],)), jnp.zeros((neg.shape[0],))]
        )
        fmask = jnp.concatenate([bmask, bmask]).astype(jnp.float32)
        p = jnp.clip(out.astype(jnp.float32), 1e-12, 1.0 - 1e-12)
        elt = -(labels * jnp.log(p) + (1 - labels) * jnp.log(1 - p)) * fmask
        num = jax.lax.psum(jnp.sum(elt), axis)
        den = jax.lax.psum(jnp.sum(fmask), axis)
        return num / jnp.maximum(den, 1.0)

    def sharded_grad(*args):
        loss, grads = jax.value_and_grad(device_loss)(*args)
        # pmean, not psum: device_loss returns the REPLICATED (fully psum'd)
        # scalar, so the ndev loss copies inject ndev cotangents and the raw
        # psum of per-device grad pieces is ndev times the true gradient
        # (see llp_tpu.parallel.sharded). pmean (= psum / ndev) is exact.
        grads = jax.tree_util.tree_map(lambda g: jax.lax.pmean(g, axis), grads)
        return loss, grads

    @jax.jit
    def step_fn(params, opt_state, rng, x_sharded, in_degree_sharded,
                pos_batch, neg_batch, batch_mask):
        loss, grads = shard_map(
            sharded_grad,
            mesh=mesh,
            in_specs=(
                P(),        # params (replicated)
                P(),        # rng
                P(axis),    # x rows (feature-sharded!)
                P(axis),    # in_degree rows
            ) + (P(axis),) * 5 + (  # exchange plan
                P(axis),    # pos_batch
                P(axis),    # neg_batch
                P(axis),    # batch_mask
            ),
            out_specs=(P(), P()),
            check_vma=False,
        )(params, rng, x_sharded, in_degree_sharded, *plan_args(part),
          pos_batch, neg_batch, batch_mask)
        grads = clip_by_group_norm(grads, 1.0)
        params, opt_state = adam_update(tx, grads, opt_state, params)
        return params, opt_state, loss

    return step_fn, tx


def make_halo_sage_forward(mesh: Mesh, part: HaloPartition, axis: str = "data"):
    """Fully feature-sharded SAGE forward: every tensor stays node-sharded.

    ``forward(params, x_sharded, in_degree_sharded, conv) -> h_sharded`` —
    halo-exchange aggregation + row-parallel linears/ReLU per layer.
    """
    spmm_fn = make_halo_spmm(mesh, part, axis)

    def forward(params, x_sharded, in_degree_sharded, conv: str = "sage"):
        from llp_tpu.models.init import apply_linear

        h = x_sharded
        convs = params["convs"]
        for i, cp in enumerate(convs):
            if conv == "sage_updated":
                out = apply_linear(cp["lin_l"], h)
                out = spmm_fn(out, in_degree_sharded, "mean")
                out = out + apply_linear(cp["lin_r"], h)
            else:
                agg = spmm_fn(h, in_degree_sharded, "mean")
                out = apply_linear(cp["lin_l"], agg) + apply_linear(cp["lin_r"], h)
            if i != len(convs) - 1:
                out = jax.nn.relu(out)
            h = out
        return h

    return forward
