"""Device mesh setup and graph sharding helpers.

The scaling axis for LLP graphs is EDGES (SURVEY.md §2.3): the graph's edge
set is partitioned across devices on a 1-D ``data`` mesh axis; node features
and model parameters are replicated (models are tiny MLP/SAGE stacks — DP +
edge-partition is the whole strategy; there is no sequence/attention axis to
shard).  Multi-host extends the same axis over ICI/DCN via
``jax.distributed.initialize`` — collectives are inserted by XLA from the
``shard_map`` specs in :mod:`llp_tpu.parallel.sharded`.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh

from llp_tpu.core.graph import Graph


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(f"need {n_devices} devices, have {len(devices)}")
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def shard_edges(graph: Graph, n_shards: int) -> Graph:
    """Re-pad the COO edge arrays so E_pad divides evenly across shards.

    The returned Graph's senders/receivers/edge_mask can be sharded on axis 0
    with ``P('data')``; CSR stays replicated (it feeds the random-walk sampler,
    which is anchor-sharded rather than edge-sharded).
    """
    if not graph.receiver_sorted:
        raise ValueError(
            "shard_edges requires the canonical receiver-sorted edge order "
            "(build_graph produces it): every sharded aggregation passes "
            "indices_are_sorted=True, which silently corrupts results on an "
            "unsorted Graph"
        )
    import numpy as onp

    e_pad = graph.num_padded_edges
    target = ((e_pad + n_shards - 1) // n_shards) * n_shards
    if target == e_pad:
        return graph
    extra = target - e_pad
    n = graph.num_nodes
    pad_zero = onp.zeros((extra,), onp.int32)
    pad_n = onp.full((extra,), n, onp.int32)  # out-of-range: dropped by segops
    pad_b = onp.zeros((extra,), bool)
    import jax.numpy as jnp

    out = graph.replace(
        senders=jnp.concatenate([graph.senders, jnp.asarray(pad_zero)]),
        receivers=jnp.concatenate([graph.receivers, jnp.asarray(pad_n)]),
        edge_mask=jnp.concatenate([graph.edge_mask, jnp.asarray(pad_b)]),
        col=jnp.concatenate([graph.col, jnp.asarray(pad_zero)]),
        csr_row=jnp.concatenate([graph.csr_row, jnp.asarray(pad_n)]),
    )
    if graph.edge_weight is not None:
        out = out.replace(
            edge_weight=jnp.concatenate(
                [graph.edge_weight, jnp.zeros((extra,), jnp.float32)]
            )
        )
    return out
