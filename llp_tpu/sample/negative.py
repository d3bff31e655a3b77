"""Fixed-shape negative edge sampling under a JAX PRNG key.

TPU-native replacement for PyG ``negative_sampling(method='dense')`` (used by
the reference at ``src/main.py:81,206``, ``src/train_teacher_gnn.py:50`` and in
the splitters) and for the plain ``torch.randint`` collab negatives
(``src/main.py:83-84``).

PyG's dense method materializes an N×N mask and draws uniformly from
non-edges — dynamic-shaped and hostile to XLA.  Here: uniform pair proposals,
membership test against a *sorted* array of hashed real edges
(``searchsorted``), and a bounded number of masked resampling rounds.  After
``rounds`` passes the residual collision probability is (E/N²)^rounds —
negligible for every LLP dataset (densest is cora at E/N² ≈ 1.4e-3); any
survivor is kept, which only makes the negative set infinitesimally "easier",
the same bias PyG accepts when it samples fewer candidates than requested.

Self-loops are excluded exactly when the caller includes them in the exclusion
set, mirroring the reference (its splitter adds self-loops before sampling,
``src/utils.py:70``, its train loops do not).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


# u*N+v must fit int32 (TPU-native integer width; x64 stays disabled).  Every
# dataset that needs structure-aware negatives satisfies this (largest is
# coauthor-physics, N=34493, N^2 < 2^31); collab (N=235868) uses plain uniform
# negatives in the reference (main.py:83-84) via sample_uniform_edges.
MAX_EXACT_NODES = 46340


def edge_hash_keys(edge_index: np.ndarray, num_nodes: int) -> np.ndarray:
    """Host helper: sorted int32 keys u*N+v for device membership tests."""
    if num_nodes > MAX_EXACT_NODES:
        raise ValueError(
            f"exact edge keys need num_nodes <= {MAX_EXACT_NODES}; use "
            "sample_uniform_edges for larger graphs (the reference does too)"
        )
    edge_index = np.asarray(edge_index, dtype=np.int64)
    keys = edge_index[0] * np.int64(num_nodes) + edge_index[1]
    return np.sort(keys).astype(np.int32)


def _member(sorted_keys: jnp.ndarray, keys: jnp.ndarray) -> jnp.ndarray:
    """True where ``keys`` appear in ``sorted_keys``."""
    idx = jnp.searchsorted(sorted_keys, keys, side="left")
    idx = jnp.clip(idx, 0, sorted_keys.shape[0] - 1)
    return sorted_keys[idx] == keys


@partial(jax.jit, static_argnames=("num_samples", "num_nodes", "force_undirected", "rounds"))
def sample_negative_edges(
    key: jax.Array,
    sorted_edge_keys: jnp.ndarray,
    num_samples: int,
    num_nodes: int,
    *,
    force_undirected: bool = False,
    rounds: int = 8,
) -> jnp.ndarray:
    """Sample (2, num_samples) int32 pairs not present in the exclusion set.

    ``sorted_edge_keys``: sorted int32 ``u*N+v`` keys of edges to avoid.
    ``force_undirected=True`` proposes i<j pairs only (callers exclude a
    symmetric edge set, so checking one direction suffices), matching the
    production splitter's global negatives (generate_production_split.py:47).
    """
    n = jnp.int32(num_nodes)

    def propose(k):
        k1, k2 = jax.random.split(k)
        src = jax.random.randint(k1, (num_samples,), 0, num_nodes, dtype=jnp.int32)
        dst = jax.random.randint(k2, (num_samples,), 0, num_nodes, dtype=jnp.int32)
        if force_undirected:
            lo = jnp.minimum(src, dst)
            hi = jnp.maximum(src, dst)
            # avoid self-loops for undirected proposals (i<j strictly): bump
            # equal pairs deterministically.
            hi = jnp.where(lo == hi, (hi + 1) % num_nodes, hi)
            src, dst = jnp.minimum(lo, hi), jnp.maximum(lo, hi)
        return src, dst

    def bad(src, dst):
        keys = src * n + dst
        return _member(sorted_edge_keys, keys)

    src, dst = propose(key)
    collide = bad(src, dst)
    for r in range(rounds):
        k = jax.random.fold_in(key, r + 1)
        new_src, new_dst = propose(k)
        src = jnp.where(collide, new_src, src)
        dst = jnp.where(collide, new_dst, dst)
        collide = collide & bad(src, dst)
    return jnp.stack([src, dst])


def sample_uniform_edges(
    key: jax.Array, num_samples: int, num_nodes: int
) -> jnp.ndarray:
    """Plain uniform (2, num_samples) pairs — the collab path (main.py:83-84)."""
    return jax.random.randint(key, (2, num_samples), 0, num_nodes, dtype=jnp.int32)
