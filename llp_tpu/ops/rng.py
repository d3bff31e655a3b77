"""Fast dropout-mask generation via XLA's hardware RngBitGenerator.

Dropout needs determinism-under-key and the right marginal distribution —
not threefry's cross-backend stream stability. On this TPU the default
threefry2x32 generator is VPU-bound and measured at ~43% of a collab-scale
student train step (scripts/bench_student2.py: dropout 0.5 -> 0 recovers
13 ms of a 30 ms step; scripts/bench_rng.py: the step's four masks cost
10.2 ms threefry vs 5.9 ms rbg). :func:`bernoulli_mask` re-bases the
caller's threefry key onto the 'rbg' PRNG implementation (the XLA
RngBitGenerator instruction, lowered to the hardware generator) and draws
the mask there — still a pure function of the key, still different per
layer/step via the usual ``fold_in`` chain, but ~2x cheaper bits.

Everything else in the framework (negative sampling, walks, batch
permutations, parameter init) stays on threefry: those streams are part of
recorded-trajectory contracts and cost nothing at their shapes.

Set ``LLP_TPU_DROPOUT_RNG=threefry`` to restore the default generator
(e.g. to bit-reproduce pre-session-6 recorded runs).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

def _impl() -> str:
    # Read at CALL time: the docstring invites setting the env var to
    # reproduce old runs, which must work regardless of import order.
    return os.environ.get("LLP_TPU_DROPOUT_RNG", "rbg")


def _as_rbg(key: jax.Array) -> jax.Array:
    """Deterministically re-base a threefry key (raw (2,) uint32 or typed)
    onto the rbg impl, whose key data is (4,) uint32."""
    data = key if jnp.issubdtype(key.dtype, jnp.uint32) else jax.random.key_data(key)
    return jax.random.wrap_key_data(jnp.concatenate([data, data]), impl="rbg")


def bernoulli_mask(key: jax.Array, p, shape) -> jax.Array:
    """Bernoulli(p) keep-mask on the fast generator. ``key`` is the usual
    threefry key (already folded for the layer/step)."""
    if _impl() == "rbg":
        key = _as_rbg(key)
    return jax.random.bernoulli(key, p, shape)


def inverted_dropout(h: jax.Array, rate: float, key: jax.Array) -> jax.Array:
    """Standard inverted dropout on the fast mask generator — the single
    implementation behind every encoder/predictor dropout site (same ops in
    the same order as the original inline copies: bit-identical streams)."""
    keep = 1.0 - rate
    mask = bernoulli_mask(key, keep, h.shape)
    return jnp.where(mask, h / keep, jnp.zeros_like(h))
