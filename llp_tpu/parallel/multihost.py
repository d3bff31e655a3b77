"""Multi-host process setup and a scaling-efficiency harness.

The reference has no distributed backend at all (SURVEY.md §2.3).  Here the
multi-host story is the standard JAX one: ``jax.distributed.initialize`` makes
every host's devices visible in one global mesh; the edge-partitioned
``shard_map`` programs in :mod:`llp_tpu.parallel.sharded` then run unchanged —
XLA places the ``psum`` over ICI within a slice and DCN across slices.

``measure_scaling`` runs the sharded teacher step over 1..N devices of
whatever platform is available (virtual CPU mesh in tests, a real slice in
production) and reports throughput + efficiency — the BASELINE.json
"scaling efficiency at N hosts" harness.
"""

from __future__ import annotations

import time
from typing import Optional, Sequence

import numpy as np


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Wire this process into a multi-host JAX job (no-op when single)."""
    import jax

    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def measure_scaling(
    device_counts: Sequence[int] = (1, 2, 4, 8),
    *,
    n_nodes: int = 2048,
    dim: int = 128,
    hidden: int = 128,
    batch: int = 1024,
    steps: int = 10,
) -> dict:
    """Sharded-teacher-step throughput at each device count.

    Returns {n_devices: {"step_ms": ..., "edges_per_sec": ...,
    "efficiency": ...}} with efficiency relative to perfect scaling from the
    smallest count.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from llp_tpu.core import build_graph
    from llp_tpu.data.synthetic import sbm_graph
    from llp_tpu.parallel.mesh import shard_edges
    from llp_tpu.parallel.sharded import make_sharded_teacher_step
    from llp_tpu.train.teacher import init_teacher_params

    ei, _ = sbm_graph(n_nodes, 8, 12.0, seed=3)
    rng = np.random.default_rng(0)
    x_host = rng.normal(size=(n_nodes, dim)).astype(np.float32)

    results = {}
    for nd in device_counts:
        if len(jax.devices()) < nd:
            continue
        mesh = Mesh(np.asarray(jax.devices()[:nd]), ("data",))
        rep = NamedSharding(mesh, P())
        shd = NamedSharding(mesh, P("data"))
        g = shard_edges(build_graph(ei, n_nodes), nd)
        put = jax.device_put
        senders = put(g.senders, shd)
        receivers = put(g.receivers, shd)
        emask = put(g.edge_mask, shd)
        in_deg = put(g.in_degree, rep)
        x = put(jnp.asarray(x_host), rep)
        b = (batch // nd) * nd
        pos = put(jnp.asarray(rng.integers(0, n_nodes, (b, 2)), jnp.int32), shd)
        neg = put(jnp.asarray(rng.integers(0, n_nodes, (b, 2)), jnp.int32), shd)
        mask = put(jnp.ones((b,), bool), shd)

        step_fn, tx = make_sharded_teacher_step(
            mesh, num_nodes=n_nodes, dropout=0.0, lr=0.01
        )
        params = jax.tree_util.tree_map(
            lambda a: put(a, rep),
            init_teacher_params(
                jax.random.PRNGKey(0), encoder="sage", in_channels=dim,
                hidden_channels=hidden, num_layers=2, predictor_mode="mlp",
            ),
        )
        opt_state = tx.init(params)
        # compile + warm
        params, opt_state, loss = step_fn(
            params, opt_state, jax.random.PRNGKey(1), senders, receivers,
            emask, in_deg, x, pos, neg, mask,
        )
        float(loss)
        t0 = time.perf_counter()
        for i in range(steps):
            params, opt_state, loss = step_fn(
                params, opt_state, jax.random.PRNGKey(2 + i), senders,
                receivers, emask, in_deg, x, pos, neg, mask,
            )
        float(loss)
        dt = (time.perf_counter() - t0) / steps
        results[nd] = {
            "step_ms": round(dt * 1000, 3),
            "edges_per_sec": round(2 * b / dt, 1),
        }

    if results:
        base_nd = min(results)
        base = results[base_nd]["edges_per_sec"] / base_nd
        for nd, r in results.items():
            r["efficiency"] = round(r["edges_per_sec"] / (nd * base), 3)
    return results
