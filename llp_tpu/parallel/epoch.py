"""Whole training epochs as ONE multi-chip device program.

The single-device train loops compile an entire epoch (a ``lax.scan`` over
link batches) into one program (``llp_tpu.train.teacher`` / ``.student``).
This module is the multi-chip counterpart: the SAME epoch structure wrapped
in ``shard_map`` over a 1-D ``data`` mesh, so the drivers (``train/loop.py``)
can swap in a distributed epoch function with an identical call signature
and leave everything else (eval, loggers, checkpointing, early stop)
untouched.

Sharding model (SURVEY.md §2.3; the reference is single-device,
``src/main.py:285-287`` — all distribution is new, TPU-native capability):

* **edges sharded**: each device aggregates only its contiguous slice of the
  receiver-sorted canonical COO (still sorted → sorted segment-sum), and one
  ``psum`` merges partial node sums.  The device-local aggregation is
  injected into the unmodified model code (``apply_encoder`` and the layer-1
  aggregation hoist) as a callable ``impl`` — so SAGE (both conv variants),
  GCN's factored sym-norm, and the hoist all run inside ``shard_map``
  unchanged.  With ``segsum_layouts`` the local aggregation (both
  directions) rides the windowed Pallas segsum kernel.
* **link/anchor batches sharded** on the same axis: each device scores and
  differentiates its slice of every batch; losses are per-device masked
  sums merged by ``psum`` — numerically the single-device masked means.
* **params replicated**: per-shard gradient contributions are ``pmean``'d —
  the loss every device returns is the REPLICATED (fully psum'd) scalar, so
  the ndev loss copies inject ndev cotangents and the raw psum of per-device
  grad pieces is ndev times the true gradient; pmean is exact.  The
  identical clip + Adam update then runs on every device.

RNG discipline: the batch permutation, negative sampling, context walks and
encoder dropout use the SAME keys and draw shapes as the single-device epoch
(full-batch draws, sliced locally) — with ``dropout=0`` a sharded epoch
reproduces the single-device epoch to float tolerance (test-gated).  Only
the per-device predictor dropout masks draw at local shapes.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from llp_tpu.models.encoder import apply_encoder, precompute_first_aggregation
from llp_tpu.models.mlp import apply_mlp
from llp_tpu.models.predictor import apply_link_predictor
from llp_tpu.sample.negative import sample_negative_edges, sample_uniform_edges
from llp_tpu.sample.walk import sample_contexts
from llp_tpu.train.optim import adam_init, adam_update, clip_by_group_norm
from llp_tpu.train.student import build_pair_chunks, pair_table
from llp_tpu.train.teacher import should_hoist_first_agg
from llp_tpu.utils.precision import cast_params, resolve_dtype

_EPS = 1e-12


def _graph_specs(graph, axis: str):
    """PartitionSpec pytree for a Graph: COO edge arrays sharded, rest
    replicated (CSR + degrees feed walks / mean-normalization globally;
    w_in_degree stays replicated — that's exactly why build_graph
    precomputes it)."""
    spec = jax.tree_util.tree_map(lambda _: P(), graph)
    spec = spec.replace(senders=P(axis), receivers=P(axis), edge_mask=P(axis))
    if graph.edge_weight is not None:
        spec = spec.replace(edge_weight=P(axis))
    return spec


def _check_divisible(graph, ndev: int):
    if graph.num_padded_edges % ndev:
        raise ValueError(
            f"padded edge count {graph.num_padded_edges} not divisible by "
            f"{ndev} devices — build the graph with pad_to_multiple covering "
            f"the mesh size (the drivers do this when num_devices > 1)"
        )


def _make_local_spmm(axis: str, local_sum=None, lay=()):
    """Device-local aggregation closure, injectable as ``spmm(..., impl=fn)``.

    Semantics match :func:`llp_tpu.ops.spmm.spmm` for sum/mean over the
    binary adjacency: local gather + sorted segment-sum over this device's
    edge shard, psum-merged, mean-normalized by the replicated global
    in-degree (isolated nodes → 0 rows, torch_sparse convention).
    """

    def impl_fn(g, x, reduce, edge_weight):
        if reduce not in ("sum", "mean"):
            raise ValueError(f"sharded spmm supports sum/mean, got {reduce!r}")
        acc = jnp.float32
        if local_sum is not None and edge_weight is None:
            out = local_sum(x, *lay)
        else:
            # edge_weight (when set) is the caller's per-edge scalar over the
            # SAME local edge slice as g.senders — the weighted-mean /
            # weighted-sym-norm paths derive it from the sharded
            # graph.edge_weight and the replicated precomputed w_in_degree,
            # so the local product + psum is the exact global aggregation.
            msgs = jnp.take(x, g.senders, axis=0).astype(acc)
            if edge_weight is not None:
                msgs = msgs * edge_weight.astype(acc)[:, None]
            msgs = jnp.where(g.edge_mask[:, None], msgs, 0.0)
            out = jax.ops.segment_sum(
                msgs, g.receivers, num_segments=g.num_nodes, indices_are_sorted=True
            )
        out = jax.lax.psum(out, axis)
        if reduce == "mean":
            out = out / jnp.maximum(g.in_degree.astype(acc), 1.0)[:, None]
        return out.astype(x.dtype)

    return impl_fn


def table_gather(shard, idx, n_per: int, axis: str):
    """Distributed embedding-table lookup: each device gathers ITS OWN (B,)
    row indices from an owner-sharded (P·n_per, D) table.

    The classic TPU sharded-table pattern: ``all_gather`` the (per-device,
    generally different) index vectors, every device gathers the rows it
    owns for ALL requesters (clipped local coords, masked elsewhere), and a
    ``psum_scatter`` sums the owner contributions while handing each device
    only its own (B, D) block.  This is the multi-chip analogue of the
    reference's CPU-feature minibatch gather (``src/main.py:96``): the
    feature matrix no chip can hold alone lives row-partitioned across the
    mesh instead of on the host, and rows move over ICI.

    ``idx`` is 1-D int32, values in [0, num_nodes); call inside
    ``shard_map``.  Works for replicated indices too (every device then
    receives the same gather).
    """
    all_idx = jax.lax.all_gather(idx.astype(jnp.int32), axis, tiled=True)
    me = jax.lax.axis_index(axis)
    loc = all_idx - me.astype(jnp.int32) * n_per
    valid = (loc >= 0) & (loc < n_per)
    rows = jnp.take(shard, jnp.clip(loc, 0, n_per - 1), axis=0)
    rows = jnp.where(valid[:, None], rows, jnp.zeros_like(rows))
    return jax.lax.psum_scatter(rows, axis, scatter_dimension=0, tiled=True)


def _psum_masked_mean(elt, fmask, axis):
    """Global masked mean from per-device pieces — identical to the
    single-device ``_masked_mean`` (denominator floored at 1)."""
    num = jax.lax.psum(jnp.sum(elt * fmask), axis)
    den = jax.lax.psum(jnp.sum(fmask), axis)
    return num / jnp.maximum(den, 1.0)


def _bce_elements(probs, labels):
    """Per-element BCE with the torch-matched clamps of ops.losses.bce_loss."""
    p = probs.astype(jnp.float32)
    y = labels.astype(jnp.float32)
    log_p = jnp.maximum(jnp.log(jnp.maximum(p, _EPS)), -100.0)
    log_1p = jnp.maximum(jnp.log(jnp.maximum(1.0 - p, _EPS)), -100.0)
    return -(y * log_p + (1.0 - y) * log_1p)


def _segsum_lay_args(segsum_layouts):
    if segsum_layouts is None:
        return None, ()
    from llp_tpu.ops.pallas.segsum_kernel import make_local_blocked_sum

    return make_local_blocked_sum, (
        segsum_layouts.fwd_senders, segsum_layouts.fwd_local,
        segsum_layouts.fwd_r0, segsum_layouts.bwd_senders,
        segsum_layouts.bwd_local, segsum_layouts.bwd_r0,
    )


def make_sharded_teacher_epoch_fn(
    mesh: Mesh,
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
    norm_type: str = "none",
    compute_dtype="float32",
    epochs_per_call: int = 1,
    axis: str = "data",
    segsum_layouts=None,
):
    """Multi-chip version of :func:`llp_tpu.train.teacher.make_teacher_epoch_fn`.

    Same returned signature —
    ``epoch_fn(params, opt_state, key, graph, x, pos_edges, neg_keys)`` —
    so the driver's epoch loop is oblivious to the mesh.  The graph's padded
    edge count must divide the mesh size (the drivers re-pad accordingly);
    ``segsum_layouts`` from ``build_shard_layouts(graph, mesh size)`` routes
    each device's local aggregation through the windowed Pallas kernel.
    """

    ndev = int(mesh.shape[axis])
    e = num_pos_edges
    b = min(link_batch_size, e)
    steps = -(-e // b)
    b_loc = -(-b // ndev)
    b_pad = b_loc * ndev

    tx, _ = adam_init({}, lr)
    stateful = norm_type == "batch"
    cdtype = resolve_dtype(compute_dtype)
    make_local, lay_args = _segsum_lay_args(segsum_layouts)
    local_sum = make_local(segsum_layouts, num_nodes) if make_local else None

    def epoch_body(params, opt_state, key, graph, x, pos_edges, neg_keys,
                   *lay_stacked):
        me = jax.lax.axis_index(axis)
        lay = tuple(a[0] for a in lay_stacked)  # drop the leading shard dim
        impl = _make_local_spmm(axis, local_sum=local_sum, lay=lay)

        if x.dtype == jnp.float32:
            x = x.astype(cdtype)
        x_agg = None
        if encoder != "mlp":
            conv0 = params["encoder"]["convs"][0]
            h_out = (conv0["lin_l"] if "lin_l" in conv0 else conv0["lin"])["w"].shape[1]
            # Memory gate on the LOCAL edge shard (each device materializes
            # only its own (E_loc, D) message block).
            if should_hoist_first_agg(
                encoder, conv, int(x.shape[1]), int(h_out),
                int(graph.senders.shape[0]), steps * epochs_per_call,
            ):
                x_agg = precompute_first_aggregation(
                    encoder, graph, x, conv=conv, impl=impl
                )

        def batch_loss(params, rng, edges_loc, mask_loc):
            params = cast_params(params, cdtype)
            k_drop, k_pred, k_neg = jax.random.split(rng, 3)
            # Encoder dropout keeps the DEVICE-INVARIANT key: h is replicated
            # (psum'd aggregations), so all devices must draw the same mask.
            # The predictor acts on this device's batch shard — fold the
            # device index so shards don't share mask bits across examples.
            k_pred = jax.random.fold_in(k_pred, me)
            h = apply_encoder(
                encoder, params["encoder"], graph, x,
                dropout=dropout, train=True, rng=k_drop, conv=conv,
                norm_type=norm_type, impl=impl, x_agg=x_agg,
            )
            new_norm_state = None
            if stateful:
                h, new_norm_state = h
            # Full-batch negative draw with the single-device key (cheap),
            # sliced locally — keeps the batch composition identical to the
            # single-device epoch.
            if neg_mode == "dense":
                neg = sample_negative_edges(k_neg, neg_keys, b_pad, num_nodes)
            else:
                neg = sample_uniform_edges(k_neg, b_pad, num_nodes)
            neg_src = jax.lax.dynamic_slice_in_dim(neg[0], me * b_loc, b_loc)
            neg_dst = jax.lax.dynamic_slice_in_dim(neg[1], me * b_loc, b_loc)
            src = jnp.concatenate([edges_loc[:, 0], neg_src])
            dst = jnp.concatenate([edges_loc[:, 1], neg_dst])
            out = apply_link_predictor(
                params["predictor"],
                jnp.take(h, src, axis=0),
                jnp.take(h, dst, axis=0),
                mode=predictor_mode, dropout=dropout, train=True, rng=k_pred,
            )
            labels = jnp.concatenate([jnp.ones((b_loc,)), jnp.zeros((b_loc,))])
            fmask = jnp.concatenate([mask_loc, mask_loc]).astype(jnp.float32)
            loss = _psum_masked_mean(_bce_elements(out, labels), fmask, axis)
            return loss, new_norm_state

        def one_epoch(carry, ekey):
            params, opt_state = carry
            k_perm, k_steps = jax.random.split(ekey)
            perm = jax.random.permutation(k_perm, e)
            pad = steps * b - e
            perm = jnp.concatenate([perm, jnp.full((pad,), e, perm.dtype)])
            perm = perm.reshape(steps, b)
            if b_pad > b:  # round the batch up to the mesh size (masked)
                perm = jnp.concatenate(
                    [perm, jnp.full((steps, b_pad - b), e, perm.dtype)], axis=1
                )

            def step(carry, inp):
                params, opt_state, tl, tn = carry
                idx, i = inp
                idx_loc = jax.lax.dynamic_slice_in_dim(idx, me * b_loc, b_loc)
                mask_loc = idx_loc < e
                edges_loc = pos_edges[jnp.clip(idx_loc, 0, e - 1)]
                rng = jax.random.fold_in(k_steps, i)
                (loss, new_ns), grads = jax.value_and_grad(
                    batch_loss, has_aux=True
                )(params, rng, edges_loc, mask_loc)
                # The loss is replicated (every term ends in a psum), so the
                # per-device loss copies inject ndev cotangents: the psum of
                # the per-device grad pieces is ndev * the true gradient.
                # pmean (= psum / ndev) is therefore the EXACT global
                # gradient — under check_vma=False (garbage-looking partials
                # that sum to ndev*g) and check_vma=True (full replicated
                # grads) alike. Gated by the vs-single-device parity tests
                # in tests/test_parallel_epoch.py.
                grads = jax.tree_util.tree_map(
                    lambda g: jax.lax.pmean(g, axis), grads
                )
                grads = clip_by_group_norm(grads, 1.0)
                params, opt_state = adam_update(tx, grads, opt_state, params)
                if stateful:
                    params = dict(
                        params, encoder=dict(params["encoder"], norm_state=new_ns)
                    )
                n = jax.lax.psum(jnp.sum(mask_loc.astype(jnp.float32)), axis)
                return (params, opt_state, tl + loss * n, tn + n), None

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
        return params, opt_state, losses[0] if epochs_per_call == 1 else losses

    def _run(params, opt_state, key, graph, x, pos_edges, neg_keys):
        _check_divisible(graph, ndev)
        mapped = shard_map(
            epoch_body,
            mesh=mesh,
            in_specs=(P(), P(), P(), _graph_specs(graph, axis), P(), P(), P())
            + (P(axis),) * len(lay_args),
            out_specs=(P(), P(), P()),
            check_vma=False,
        )
        return mapped(params, opt_state, key, graph, x, pos_edges, neg_keys,
                      *lay_args)

    epoch_fn = jax.jit(_run, donate_argnums=(0, 1))
    return epoch_fn, tx


def make_halo_teacher_epoch_fn(
    mesh: Mesh,
    part,
    *,
    encoder: str = "sage",
    conv: str = "sage",
    predictor_mode: str = "mlp",
    dropout: float = 0.5,
    num_nodes: int,
    num_pos_edges: int,
    link_batch_size: int,
    neg_mode: str = "dense",
    lr: float = 0.005,
    norm_type: str = "none",
    compute_dtype="float32",
    epochs_per_call: int = 1,
    axis: str = "data",
):
    """FEATURE-SHARDED whole-epoch teacher training (halo exchange).

    The third multi-chip execution model: where
    :func:`make_sharded_teacher_epoch_fn` replicates node features and
    partitions edges (right when ``x`` fits every chip), this one shards the
    feature matrix itself by node owner (``llp_tpu.parallel.halo`` 1-D range
    partition) — the regime where N·D no longer fits one chip.  Per layer the
    encoder runs fully node-sharded (one ``all_to_all`` halo exchange per
    aggregation — overlappable with the local-edge segment-sum by
    construction, unmeasured on real multi-chip hardware); edge scoring
    pulls only the batch's embedding rows from the node-sharded h via
    :func:`table_gather` (O(B·H) over ICI per step — the full (N, H) table
    never replicates).

    Driver-facing contract mirrors the other epoch functions:
    ``epoch_fn(params, opt_state, key, x_sharded, in_degree_sharded,
    pos_edges, neg_keys)`` with ``x_sharded``/``in_degree_sharded`` padded by
    :func:`llp_tpu.parallel.halo.pad_nodes`.  RNG discipline matches the
    single-device epoch (same keys/draw shapes; negatives drawn full-batch
    and sliced locally), so with ``dropout=0`` and a mesh-divisible batch a
    halo epoch reproduces the single-device trajectory to float tolerance
    (test-gated).  Encoder dropout masks are decorrelated across devices by
    folding in the device index (node rows differ per device).

    Encoders: SAGE (both conv variants) and GCN.  GCN's symmetric
    normalization ``1/sqrt(d̂_u d̂_v)`` factors into per-ENDPOINT scalings
    (``llp_tpu.models.gcn.gcn_norm_coeffs``), all of which are per-node row
    ops: the sender factor is applied by the owner BEFORE the halo exchange
    (so exchanged rows arrive pre-scaled), the receiver factor and the
    analytic self-loop term after — no global degree products ever
    materialize.  MLP has no aggregation to shard (use the DP epoch).
    ``norm_type='batch'`` psums the batch statistics across the mesh with the
    partition's padding rows masked out — numerically the single-device batch
    norm over all N real nodes (reference surface ``src/models.py:17-20``;
    test-gated trajectory parity).
    """
    from types import SimpleNamespace

    from llp_tpu.parallel.halo import halo_spmm_local, plan_args

    if encoder not in ("sage", "gcn"):
        raise ValueError(
            "halo-sharded training supports the sage/gcn teacher encoders "
            f"(got {encoder!r}; the MLP has no aggregation to shard — use "
            "the DP epoch)"
        )
    if encoder == "gcn" and norm_type != "none":
        raise ValueError("the GCN encoder has no inter-layer norms")
    ndev = int(mesh.shape[axis])
    e = num_pos_edges
    b = min(link_batch_size, e)
    steps = -(-e // b)
    b_loc = -(-b // ndev)
    b_pad = b_loc * ndev

    tx, _ = adam_init({}, lr)
    stateful = norm_type == "batch"
    cdtype = resolve_dtype(compute_dtype)
    n_plan = len(plan_args(part))
    # Per-device message-tensor rows the halo SpMM materializes (local +
    # remote-sender edge slots) — the memory side of the hoist gate.
    e_loc = int(part.loc_send.shape[1] + part.rem_send.shape[1])

    def epoch_body(params, opt_state, key, x, in_deg, pos_edges, neg_keys,
                   *plan):
        me = jax.lax.axis_index(axis)
        # plan slices keep their leading shard dim of 1 (halo_spmm_local
        # drops it itself).  The model code only touches the graph through
        # spmm(graph, ...) — routed to the injected impl — and (for the
        # hoisted sage_updated bias term) graph.in_degree, which must be the
        # device's own node rows: a shim carrying the sharded degree suffices.
        graph_shim = SimpleNamespace(in_degree=in_deg)

        def impl(g, feats, reduce, edge_weight):
            if edge_weight is not None:
                raise ValueError("edge_weight is not supported in the halo epoch")
            return halo_spmm_local(
                part, axis, feats, in_deg, *plan, reduce=reduce
            )

        if x.dtype == jnp.float32:
            x = x.astype(cdtype)
        conv0 = params["encoder"]["convs"][0]
        h_out = (conv0["lin_l"] if "lin_l" in conv0 else conv0["lin"])["w"].shape[1]
        x_agg = None
        if should_hoist_first_agg(
            encoder, conv, int(x.shape[1]), int(h_out), e_loc,
            steps * epochs_per_call,
        ):
            x_agg = precompute_first_aggregation(
                encoder, graph_shim, x, conv=conv, impl=impl
            )

        # Batch-norm statistics must span the REAL rows only: the halo
        # partition pads N up to P*n_per with zero rows owned by the tail
        # devices.
        node_row_mask = (
            me * part.n_per + jnp.arange(part.n_per, dtype=jnp.int32)
        ) < num_nodes

        def batch_loss(params, rng, edges_loc, mask_loc):
            params = cast_params(params, cdtype)
            k_drop, k_pred, k_neg = jax.random.split(rng, 3)
            # Both tensors here are per-device (node-sharded h, batch-sharded
            # predictor rows) — fold the device index into both mask keys.
            k_pred = jax.random.fold_in(k_pred, me)
            h = apply_encoder(
                encoder, params["encoder"], graph_shim, x,
                dropout=dropout, train=True,
                rng=jax.random.fold_in(k_drop, me), conv=conv,
                norm_type=norm_type, impl=impl, x_agg=x_agg,
                norm_axis=axis, norm_row_mask=node_row_mask,
            )
            new_norm_state = None
            if stateful:
                h, new_norm_state = h
            if neg_mode == "dense":
                neg = sample_negative_edges(k_neg, neg_keys, b_pad, num_nodes)
            else:
                neg = sample_uniform_edges(k_neg, b_pad, num_nodes)
            neg_src = jax.lax.dynamic_slice_in_dim(neg[0], me * b_loc, b_loc)
            neg_dst = jax.lax.dynamic_slice_in_dim(neg[1], me * b_loc, b_loc)
            src = jnp.concatenate([edges_loc[:, 0], neg_src])
            dst = jnp.concatenate([edges_loc[:, 1], neg_dst])
            # Gather only the batch's embedding rows from the node-sharded h
            # (table_gather, O(B·H) over ICI) instead of all_gather-ing the
            # whole (N, H) table per step; autodiff scatters the row
            # cotangents back to their owners.
            rows = table_gather(
                h, jnp.concatenate([src, dst]), part.n_per, axis
            )
            out = apply_link_predictor(
                params["predictor"],
                rows[: src.shape[0]],
                rows[src.shape[0]:],
                mode=predictor_mode, dropout=dropout, train=True, rng=k_pred,
            )
            labels = jnp.concatenate([jnp.ones((b_loc,)), jnp.zeros((b_loc,))])
            fmask = jnp.concatenate([mask_loc, mask_loc]).astype(jnp.float32)
            loss = _psum_masked_mean(_bce_elements(out, labels), fmask, axis)
            return loss, new_norm_state

        def one_epoch(carry, ekey):
            params, opt_state = carry
            k_perm, k_steps = jax.random.split(ekey)
            perm = jax.random.permutation(k_perm, e)
            pad = steps * b - e
            perm = jnp.concatenate([perm, jnp.full((pad,), e, perm.dtype)])
            perm = perm.reshape(steps, b)
            if b_pad > b:
                perm = jnp.concatenate(
                    [perm, jnp.full((steps, b_pad - b), e, perm.dtype)], axis=1
                )

            def step(carry, inp):
                params, opt_state, tl, tn = carry
                idx, i = inp
                idx_loc = jax.lax.dynamic_slice_in_dim(idx, me * b_loc, b_loc)
                mask_loc = idx_loc < e
                edges_loc = pos_edges[jnp.clip(idx_loc, 0, e - 1)]
                rng = jax.random.fold_in(k_steps, i)
                (loss, new_ns), grads = jax.value_and_grad(
                    batch_loss, has_aux=True
                )(params, rng, edges_loc, mask_loc)
                # pmean, not psum — the replicated loss makes psum ndev×
                # the true gradient (see the DP teacher epoch above).
                grads = jax.tree_util.tree_map(
                    lambda g: jax.lax.pmean(g, axis), grads
                )
                grads = clip_by_group_norm(grads, 1.0)
                params, opt_state = adam_update(tx, grads, opt_state, params)
                if stateful:
                    params = dict(
                        params, encoder=dict(params["encoder"], norm_state=new_ns)
                    )
                n = jax.lax.psum(jnp.sum(mask_loc.astype(jnp.float32)), axis)
                return (params, opt_state, tl + loss * n, tn + n), None

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
        return params, opt_state, losses[0] if epochs_per_call == 1 else losses

    def _run(params, opt_state, key, x_sharded, in_deg_sharded, pos_edges,
             neg_keys):
        mapped = shard_map(
            epoch_body,
            mesh=mesh,
            in_specs=(P(), P(), P(), P(axis), P(axis), P(), P())
            + (P(axis),) * n_plan,
            out_specs=(P(), P(), P()),
            check_vma=False,
        )
        return mapped(params, opt_state, key, x_sharded, in_deg_sharded,
                      pos_edges, neg_keys, *plan_args(part))

    epoch_fn = jax.jit(_run, donate_argnums=(0, 1))
    return epoch_fn, tx


def make_sharded_student_epoch_fn(
    mesh: Mesh,
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
    feature_sharding: str = "replicated",
    axis: str = "data",
):
    """Multi-chip version of :func:`llp_tpu.train.student.make_student_epoch_fn`
    (same returned signature).  Anchor and link batches are sharded: each
    device scores its slice of the LLP_D/LLP_R context rows and the label
    batch (in minibatch mode the gathered MLP forward shards with them —
    the scalable path); losses reduce by psum to the single-device values.
    Context walks and negatives draw with the single-device keys (full
    batch, replicated) and are sliced locally.

    ``feature_sharding='table'`` (requires ``minibatch=True``): the student
    feature matrix ``x`` and the teacher embedding table ``t_h`` arrive
    OWNER-SHARDED — padded to P·ceil(N/P) rows (``pad_nodes``-style) and row-
    partitioned across the mesh — and every feature/teacher gather goes
    through :func:`table_gather` (masked local gather + psum).  This is the
    N·D-doesn't-fit regime for the student: the reference keeps the huge
    feature matrix on the HOST and gathers per batch (``src/main.py:96``);
    the TPU-native counterpart keeps it sharded across chips and gathers
    over ICI.  Trajectory-identical to the replicated epoch (test-gated).
    """
    if feature_sharding not in ("replicated", "table"):
        raise ValueError(f"unknown feature_sharding {feature_sharding!r}")
    table = feature_sharding == "table"
    if table and not minibatch:
        raise ValueError(
            "feature_sharding='table' requires minibatch=True: the "
            "full-batch student forward reads the whole feature matrix "
            "per step, which is exactly what the sharded table avoids"
        )
    ndev = int(mesh.shape[axis])
    n_per_tab = -(-num_nodes // ndev)
    e = num_pos_edges
    bl = min(link_batch_size, e)
    steps = -(-e // bl)
    bl_loc = -(-bl // ndev)
    bl_pad = bl_loc * ndev
    bn = min(node_batch_size, num_nodes)
    bn_loc = -(-bn // ndev)
    bn_pad = bn_loc * ndev
    c = rw_step * hops * (1 + ns_rate)
    use_kd = (llp_d != 0.0) or (llp_r != 0.0)
    pairs = pair_table(c) if (llp_r != 0.0 and use_kd) else None
    pair_chunks = build_pair_chunks(pairs, llp_r_chunk) if pairs is not None else None

    tx, _ = adam_init({}, lr)
    stateful = norm_type == "batch"
    cdtype = resolve_dtype(compute_dtype)

    def epoch_body(params, opt_state, key, graph, x, t_h, tpred, pos_edges,
                   neg_keys):
        me = jax.lax.axis_index(axis)
        if x.dtype == jnp.float32:
            x = x.astype(cdtype)
        if t_h.dtype == jnp.float32:
            t_h = t_h.astype(cdtype)
        tpred_c = cast_params(tpred, cdtype)
        if table:
            gx = lambda idx: table_gather(x, idx, n_per_tab, axis)
            gt = lambda idx: table_gather(t_h, idx, n_per_tab, axis)
        else:
            gx = lambda idx: jnp.take(x, idx, axis=0)
            gt = lambda idx: jnp.take(t_h, idx, axis=0)

        def batch_loss(params, rng, edges_loc, emask_loc, anchors_full,
                       amask_full):
            params = cast_params(params, cdtype)
            k_drop, k_pred, k_neg, k_ctx = jax.random.split(rng, 4)
            # Predictor rows are this device's batch shard — decorrelate the
            # mask streams across devices. The encoder key folds the device
            # index ONLY in minibatch mode (gathered rows are per-device);
            # full-batch h is replicated and needs the shared key.
            k_pred = jax.random.fold_in(k_pred, me)
            if minibatch:
                k_drop = jax.random.fold_in(k_drop, me)

            if neg_mode == "dense":
                neg = sample_negative_edges(k_neg, neg_keys, bl_pad, num_nodes)
            else:
                neg = sample_uniform_edges(k_neg, bl_pad, num_nodes)
            src = jnp.concatenate(
                [edges_loc[:, 0],
                 jax.lax.dynamic_slice_in_dim(neg[0], me * bl_loc, bl_loc)]
            )
            dst = jnp.concatenate(
                [edges_loc[:, 1],
                 jax.lax.dynamic_slice_in_dim(neg[1], me * bl_loc, bl_loc)]
            )

            if use_kd:
                # Full-batch walks with the single-device key stream
                # (cheap CSR gathers), local row slice.
                samples_full = sample_contexts(
                    k_ctx, graph, anchors_full, ps_method=ps_method,
                    step=rw_step, hops=hops, ns_rate=ns_rate,
                )  # (bn_pad, 1 + c)
                samples = jax.lax.dynamic_slice_in_dim(
                    samples_full, me * bn_loc, bn_loc
                )
            amask = jax.lax.dynamic_slice_in_dim(amask_full, me * bn_loc, bn_loc)
            af = amask.astype(jnp.float32)

            if minibatch:
                if use_kd:
                    targets = jnp.concatenate([samples.reshape(-1), src, dst])
                else:
                    targets = jnp.concatenate([src, dst])
                # Batch-norm statistics psum across the mesh: every device
                # holds a shard of the SAME global gathered batch, so the
                # psum'd moments equal the single-device minibatch step's
                # (mesh-divisible batches; test-gated).
                hrows = apply_mlp(
                    params["encoder"], gx(targets),
                    dropout=dropout, train=True, rng=k_drop, norm_type=norm_type,
                    norm_axis=axis,
                )
                new_norm_state = None
                if stateful:
                    hrows, new_norm_state = hrows
                if use_kd:
                    nctx = bn_loc * (1 + c)
                    ctx_h = hrows[:nctx].reshape(bn_loc, 1 + c, -1)
                    anchor_h = ctx_h[:, 0, :]
                    ctx_rest_h = ctx_h[:, 1:, :]
                    src_h = hrows[nctx : nctx + src.shape[0]]
                    dst_h = hrows[nctx + src.shape[0] :]
                else:
                    src_h = hrows[: src.shape[0]]
                    dst_h = hrows[src.shape[0] :]
            else:
                h = apply_mlp(
                    params["encoder"], x, dropout=dropout, train=True,
                    rng=k_drop, norm_type=norm_type,
                )
                new_norm_state = None
                if stateful:
                    h, new_norm_state = h
                if use_kd:
                    anchor_h = jnp.take(h, samples[:, 0], axis=0)
                    ctx_rest_h = jnp.take(
                        h, samples[:, 1:].reshape(-1), axis=0
                    ).reshape(bn_loc, c, -1)
                src_h = jnp.take(h, src, axis=0)
                dst_h = jnp.take(h, dst, axis=0)

            loss = jnp.float32(0.0)

            if use_kd:
                s_r = apply_link_predictor(
                    params["predictor"], anchor_h[:, None, :], ctx_rest_h,
                    mode=predictor_mode, dropout=dropout, train=True,
                    rng=jax.random.fold_in(k_pred, 1),
                )
                t_anchor = gt(samples[:, 0])
                t_ctx = gt(samples[:, 1:].reshape(-1)).reshape(bn_loc, c, -1)
                t_r = jax.lax.stop_gradient(
                    apply_link_predictor(
                        tpred_c, t_anchor[:, None, :], t_ctx,
                        mode=predictor_mode, train=False,
                    )
                )
                if llp_d != 0.0:
                    # kl_div_loss with T=1: sum of elements / real row count.
                    y_s = jax.nn.log_softmax(s_r.astype(jnp.float32), axis=-1)
                    p_t = jax.nn.softmax(t_r.astype(jnp.float32), axis=-1)
                    elt = p_t * (jnp.log(jnp.maximum(p_t, _EPS)) - y_s)
                    num = jax.lax.psum(jnp.sum(elt * af[:, None]), axis)
                    den = jnp.maximum(jax.lax.psum(jnp.sum(af), axis), 1.0)
                    loss = loss + llp_d * num / den
                if llp_r != 0.0 and pair_chunks is not None:
                    p0c, p1c, pvc = pair_chunks

                    @jax.checkpoint
                    def pair_chunk_sums(s_r, t_r, amask, p0, p1, pv):
                        t0 = jnp.take(t_r, p0, axis=1)
                        t1 = jnp.take(t_r, p1, axis=1)
                        target = jnp.where(
                            t0 > t1 + margin, 1.0,
                            jnp.where(t0 < t1 - margin, -1.0, 0.0),
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
                    pnum = jax.lax.psum(pnum, axis)
                    pden = jax.lax.psum(pden, axis)
                    loss = loss + llp_r * pnum / jnp.maximum(pden, 1.0)
                elif llp_r != 0.0:
                    p0, p1 = pairs[0], pairs[1]
                    t0 = jnp.take(t_r, p0, axis=1)
                    t1 = jnp.take(t_r, p1, axis=1)
                    target = jnp.where(
                        t0 > t1 + margin, 1.0,
                        jnp.where(t0 < t1 - margin, -1.0, 0.0),
                    )
                    s0 = jnp.take(s_r, p0, axis=1).astype(jnp.float32)
                    s1 = jnp.take(s_r, p1, axis=1).astype(jnp.float32)
                    elt = jnp.maximum(0.0, -target * (s0 - s1) + margin)
                    pm = jnp.broadcast_to(af[:, None], elt.shape)
                    loss = loss + llp_r * _psum_masked_mean(elt, pm, axis)

            out = apply_link_predictor(
                params["predictor"], src_h, dst_h, mode=predictor_mode,
                dropout=dropout, train=True, rng=jax.random.fold_in(k_pred, 0),
            )
            labels = jnp.concatenate(
                [jnp.ones((bl_loc,)), jnp.zeros((bl_loc,))]
            )
            fmask = jnp.concatenate([emask_loc, emask_loc]).astype(jnp.float32)
            loss = loss + true_label * _psum_masked_mean(
                _bce_elements(out, labels), fmask, axis
            )

            if not minibatch:
                anchors = jax.lax.dynamic_slice_in_dim(
                    anchors_full, me * bn_loc, bn_loc
                )
                if kd_rm != 0.0:
                    s32 = jnp.take(h, anchors, axis=0).astype(jnp.float32)
                    t32 = jax.lax.stop_gradient(
                        jnp.take(t_h, anchors, axis=0)
                    ).astype(jnp.float32)
                    cosnum = jnp.sum(s32 * t32, axis=-1)
                    cosden = jnp.maximum(
                        jnp.linalg.norm(s32, axis=-1)
                        * jnp.linalg.norm(t32, axis=-1),
                        1e-8,
                    )
                    loss = loss + kd_rm * (
                        1.0 - _psum_masked_mean(cosnum / cosden, af, axis)
                    )
                if kd_lm != 0.0:
                    t_out = jax.lax.stop_gradient(
                        apply_link_predictor(
                            tpred_c,
                            jnp.take(t_h, src, axis=0),
                            jnp.take(t_h, dst, axis=0),
                            mode=predictor_mode, train=False,
                        )
                    )
                    sq = jnp.square(
                        out.astype(jnp.float32) - t_out.astype(jnp.float32)
                    )
                    loss = loss + kd_lm * _psum_masked_mean(sq, fmask, axis)
            return loss, new_norm_state

        def one_epoch(carry, ekey):
            params, opt_state = carry
            k_lperm, k_nperm, k_steps = jax.random.split(ekey, 3)
            lperm = jax.random.permutation(k_lperm, e)
            lpad = steps * bl - e
            lperm = jnp.concatenate(
                [lperm, jnp.full((lpad,), e, lperm.dtype)]
            ).reshape(steps, bl)
            if bl_pad > bl:
                lperm = jnp.concatenate(
                    [lperm, jnp.full((steps, bl_pad - bl), e, lperm.dtype)],
                    axis=1,
                )
            nperm = jax.random.permutation(k_nperm, num_nodes)
            npad = max(steps * bn - num_nodes, 0)
            nperm = jnp.concatenate(
                [nperm, jnp.full((npad,), num_nodes, nperm.dtype)]
            )[: steps * bn].reshape(steps, bn)
            if bn_pad > bn:
                nperm = jnp.concatenate(
                    [nperm,
                     jnp.full((steps, bn_pad - bn), num_nodes, nperm.dtype)],
                    axis=1,
                )

            def step(carry, inp):
                params, opt_state, tl, tn = carry
                lidx, nidx, i = inp
                lidx_loc = jax.lax.dynamic_slice_in_dim(lidx, me * bl_loc, bl_loc)
                emask_loc = lidx_loc < e
                edges_loc = pos_edges[jnp.clip(lidx_loc, 0, e - 1)]
                amask_full = nidx < num_nodes
                anchors_full = jnp.clip(nidx, 0, num_nodes - 1).astype(jnp.int32)
                rng = jax.random.fold_in(k_steps, i)
                (loss, new_ns), grads = jax.value_and_grad(
                    batch_loss, has_aux=True
                )(params, rng, edges_loc, emask_loc, anchors_full, amask_full)
                # pmean, not psum: see the teacher step above — the
                # replicated loss makes psum ndev-times the true gradient.
                grads = jax.tree_util.tree_map(
                    lambda g: jax.lax.pmean(g, axis), grads
                )
                grads = clip_by_group_norm(grads, 1.0)
                params, opt_state = adam_update(tx, grads, opt_state, params)
                if stateful:
                    params = dict(
                        params, encoder=dict(params["encoder"], norm_state=new_ns)
                    )
                n = jax.lax.psum(jnp.sum(emask_loc.astype(jnp.float32)), axis)
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

    def _run(params, opt_state, key, graph, x, t_h, tpred, pos_edges, neg_keys):
        _check_divisible(graph, ndev)
        feat_spec = P(axis) if table else P()
        mapped = shard_map(
            epoch_body,
            mesh=mesh,
            in_specs=(P(), P(), P(), _graph_specs(graph, axis),
                      feat_spec, feat_spec, P(), P(), P()),
            out_specs=(P(), P(), P()),
            check_vma=False,
        )
        return mapped(params, opt_state, key, graph, x, t_h, tpred,
                      pos_edges, neg_keys)

    epoch_fn = jax.jit(_run, donate_argnums=(0, 1))
    return epoch_fn, tx
