"""On-device uniform random walks and LLP context sampling.

TPU-native replacement for ``torch_cluster.random_walk`` (reference
``src/main.py:37-45``) and the ``neighbor_samplers`` context builder
(``src/main.py:33-50``).  Walks run entirely on device over the padded CSR:
each step draws a uniform neighbor slot from the current node's out-edges via
one gather into ``row_ptr``/``col``; isolated nodes stay in place (the same
padding behavior torch_cluster exhibits).  Everything is static-shape and
jit-able, keyed by a JAX PRNG key.

Context layout matches the reference exactly:

* 'rw'  — one walk of length step*hops per anchor → (B, 1 + step*hops)
* 'nb'  — ``step`` independent walks of length ``hops``, concatenated with the
  repeated anchor column dropped (``main.py:45``) → (B, 1 + step*hops)
* negatives — uniform node ids, (B, step*hops*ns_rate)

``sample_contexts`` returns the concatenated (B, 1 + C) sample matrix with
C = step*hops*(1+ns_rate), column 0 the anchor — the shape the KD losses
consume (``main.py:183``).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from llp_tpu.core.graph import Graph


@partial(jax.jit, static_argnames=("walk_length",))
def random_walk(
    key: jax.Array, graph: Graph, start: jnp.ndarray, walk_length: int
) -> jnp.ndarray:
    """Uniform random walk. Returns (B, walk_length + 1) node ids, col 0 = start."""
    start = start.astype(jnp.int32)

    def step(cur, k):
        deg = graph.out_degree[cur]
        u = jax.random.uniform(k, cur.shape)
        # floor(u * deg) ∈ [0, deg); guard deg=0 with a clamp.
        off = jnp.minimum((u * deg.astype(u.dtype)).astype(jnp.int32), deg - 1)
        off = jnp.maximum(off, 0)
        nxt = graph.col[graph.row_ptr[cur] + off]
        nxt = jnp.where(deg > 0, nxt, cur)
        return nxt, nxt

    keys = jax.random.split(key, walk_length)
    _, path = jax.lax.scan(step, start, keys)
    return jnp.concatenate([start[:, None], path.T], axis=1)


@partial(jax.jit, static_argnames=("ps_method", "step", "hops", "ns_rate"))
def sample_contexts(
    key: jax.Array,
    graph: Graph,
    anchors: jnp.ndarray,
    *,
    ps_method: str = "nb",
    step: int = 3,
    hops: int = 2,
    ns_rate: int = 1,
) -> jnp.ndarray:
    """Build the (B, 1 + step*hops*(1+ns_rate)) context-sample matrix."""
    k_pos, k_neg = jax.random.split(key)
    if ps_method == "rw":
        pos = random_walk(k_pos, graph, anchors, step * hops)
    elif ps_method == "nb":
        walks = []
        for i in range(step):
            w = random_walk(jax.random.fold_in(k_pos, i), graph, anchors, hops)
            walks.append(w if i == 0 else w[:, 1:])
        pos = jnp.concatenate(walks, axis=1)
    else:
        raise ValueError(f"unknown ps_method {ps_method!r}")

    neg = jax.random.randint(
        k_neg,
        (anchors.shape[0], step * hops * ns_rate),
        0,
        graph.num_nodes,
        dtype=jnp.int32,
    )
    return jnp.concatenate([pos, neg], axis=1)
