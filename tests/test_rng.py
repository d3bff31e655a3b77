"""Fast dropout-RNG (ops/rng.py): determinism, distribution, and the
threefry escape hatch. See scripts/bench_rng.py for the TPU timing this
path exists for."""

import jax
import jax.numpy as jnp
import numpy as np

from llp_tpu.ops import rng as rng_mod
from llp_tpu.models.mlp import apply_mlp, init_mlp


def test_bernoulli_mask_deterministic_and_key_sensitive():
    k = jax.random.PRNGKey(7)
    m1 = rng_mod.bernoulli_mask(k, 0.5, (128, 64))
    m2 = rng_mod.bernoulli_mask(k, 0.5, (128, 64))
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))
    m3 = rng_mod.bernoulli_mask(jax.random.fold_in(k, 1), 0.5, (128, 64))
    assert (np.asarray(m1) != np.asarray(m3)).any()


def test_bernoulli_mask_marginal_rate():
    k = jax.random.PRNGKey(3)
    for keep in (0.3, 0.5, 0.9):
        m = rng_mod.bernoulli_mask(k, keep, (512, 256))
        rate = float(jnp.mean(m.astype(jnp.float32)))
        assert abs(rate - keep) < 0.01, (keep, rate)


def test_bernoulli_mask_threefry_fallback(monkeypatch):
    k = jax.random.PRNGKey(7)
    # env var read at CALL time (session-7 fix) — set it like a user would
    monkeypatch.setenv("LLP_TPU_DROPOUT_RNG", "threefry")
    m = rng_mod.bernoulli_mask(k, 0.5, (64, 32))
    np.testing.assert_array_equal(
        np.asarray(m), np.asarray(jax.random.bernoulli(k, 0.5, (64, 32)))
    )


def test_bernoulli_mask_accepts_typed_keys():
    k = jax.random.key(7)
    m = rng_mod.bernoulli_mask(k, 0.5, (32, 16))
    assert m.shape == (32, 16) and m.dtype == jnp.bool_


def test_mlp_dropout_rides_fast_mask_and_stays_deterministic():
    params = init_mlp(jax.random.PRNGKey(0), 2, 16, 32, 32)
    x = jax.random.normal(jax.random.PRNGKey(1), (64, 16))
    k = jax.random.PRNGKey(2)
    h1 = apply_mlp(params, x, dropout=0.5, train=True, rng=k)
    h2 = apply_mlp(params, x, dropout=0.5, train=True, rng=k)
    np.testing.assert_array_equal(np.asarray(h1), np.asarray(h2))
    # different key -> different mask
    h3 = apply_mlp(params, x, dropout=0.5, train=True, rng=jax.random.fold_in(k, 9))
    assert (np.asarray(h1) != np.asarray(h3)).any()
    # dropout actually perturbs the forward (no dropout after the last
    # layer, so compare against the dropout-free output instead of zeros)
    h_nodrop = apply_mlp(params, x, dropout=0.0, train=True, rng=k)
    assert (np.asarray(h1) != np.asarray(h_nodrop)).any()
