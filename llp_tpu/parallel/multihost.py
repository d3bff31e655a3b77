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
        results[nd] = _measure_mesh(
            mesh, ei, x_host, n_nodes=n_nodes, dim=dim, hidden=hidden,
            batch=batch, steps=steps,
        )

    if results:
        base_nd = min(results)
        base = results[base_nd]["edges_per_sec"] / base_nd
        for nd, r in results.items():
            r["efficiency"] = round(r["edges_per_sec"] / (nd * base), 3)
    return results


def _measure_mesh(mesh, ei, x_host, *, n_nodes, dim, hidden, batch, steps):
    """Sharded-teacher-step throughput on ``mesh``.

    Global arrays are built with ``jax.make_array_from_callback`` so the same
    code path serves a single-process device subset AND a multi-process
    global mesh (where ``device_put`` onto non-addressable devices would
    fail).
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from llp_tpu.core import build_graph
    from llp_tpu.parallel.mesh import shard_edges
    from llp_tpu.parallel.sharded import make_sharded_teacher_step
    from llp_tpu.train.teacher import init_teacher_params

    nd = mesh.size
    rng = np.random.default_rng(0)

    def put(host, spec):
        host = np.asarray(host)
        return jax.make_array_from_callback(
            host.shape, NamedSharding(mesh, spec), lambda idx: host[idx]
        )

    g = shard_edges(build_graph(ei, n_nodes), nd)
    senders = put(g.senders, P("data"))
    receivers = put(g.receivers, P("data"))
    emask = put(g.edge_mask, P("data"))
    in_deg = put(g.in_degree, P())
    x = put(x_host, P())
    b = (batch // nd) * nd
    pos = put(rng.integers(0, n_nodes, (b, 2)).astype(np.int32), P("data"))
    neg = put(rng.integers(0, n_nodes, (b, 2)).astype(np.int32), P("data"))
    mask = put(np.ones((b,), bool), P("data"))

    step_fn, tx = make_sharded_teacher_step(
        mesh, num_nodes=n_nodes, dropout=0.0, lr=0.01
    )
    params = jax.tree_util.tree_map(
        lambda a: put(np.asarray(a), P()),
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
    return {
        "step_ms": round(dt * 1000, 3),
        "edges_per_sec": round(2 * b / dt, 1),
    }


def measure_scaling_global(
    *,
    n_nodes: int = 2048,
    dim: int = 128,
    hidden: int = 128,
    batch: int = 1024,
    steps: int = 10,
) -> dict:
    """Throughput of the FULL global mesh (all processes × all local devices).

    In a multi-process job every process must call this with identical
    arguments (SPMD); the returned numbers are identical everywhere.
    Cross-topology efficiency (1 chip vs 1 host vs N hosts) is computed by
    the caller from per-topology invocations — see
    ``scripts/measure_scaling_multiproc.py`` and the ``__main__`` below.
    """
    import jax
    from jax.sharding import Mesh

    from llp_tpu.data.synthetic import sbm_graph

    ei, _ = sbm_graph(n_nodes, 8, 12.0, seed=3)
    rng = np.random.default_rng(0)
    x_host = rng.normal(size=(n_nodes, dim)).astype(np.float32)
    mesh = Mesh(np.asarray(jax.devices()), ("data",))
    out = _measure_mesh(
        mesh, ei, x_host, n_nodes=n_nodes, dim=dim, hidden=hidden,
        batch=batch, steps=steps,
    )
    out.update(
        devices=jax.device_count(), processes=jax.process_count()
    )
    return out


def _main(argv=None) -> None:
    """Per-process scaling-measurement entry for real multi-host jobs:

        python -m llp_tpu.parallel.multihost \
            --coordinator=HOST:PORT --num_processes=N --process_id=I

    Run once per host; process 0 prints one JSON line with the global-mesh
    throughput. On a single process (no flags) it measures the local mesh.
    """
    import argparse
    import json

    p = argparse.ArgumentParser(description="global-mesh scaling measurement")
    p.add_argument("--coordinator", type=str, default=None)
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    p.add_argument("--n_nodes", type=int, default=2048)
    p.add_argument("--dim", type=int, default=128)
    p.add_argument("--batch", type=int, default=1024)
    p.add_argument("--steps", type=int, default=10)
    args = p.parse_args(argv)

    import os

    import jax

    # Plugin backends (axon TPU) ignore the JAX_PLATFORMS env var; the
    # config update is authoritative and must precede backend init.
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    initialize_multihost(args.coordinator, args.num_processes, args.process_id)

    out = measure_scaling_global(
        n_nodes=args.n_nodes, dim=args.dim, batch=args.batch, steps=args.steps
    )
    if jax.process_index() == 0:
        print(json.dumps(out))


if __name__ == "__main__":
    _main()
