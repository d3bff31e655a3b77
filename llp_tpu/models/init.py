"""Parameter initializers distribution-matched to the reference's torch models.

torch.nn.Linear.reset_parameters uses kaiming_uniform(a=sqrt(5)) on the weight,
which collapses to U(-1/sqrt(fan_in), 1/sqrt(fan_in)); the bias draws from the
same interval.  PyG's dense Linear (used inside SAGEConv) defaults to the same
scheme; GCNConv uses glorot weights and zero bias.  Exact RNG parity with
torch is impossible (different streams) — distributional parity is the goal,
with bit-exact parity achieved separately via the torch weight importer
(:mod:`llp_tpu.utils.torch_import`).

Weights are stored as (in_features, out_features) so forward is ``x @ w + b``.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def kaiming_uniform_bound(fan_in: int) -> float:
    """Bound of torch's default Linear init: U(-1/sqrt(fan_in), +...)."""
    return 1.0 / math.sqrt(max(fan_in, 1))


def glorot_uniform(key: jax.Array, shape, dtype=jnp.float32) -> jnp.ndarray:
    """PyG glorot: U(-a, a) with a = sqrt(6 / (fan_in + fan_out))."""
    fan_in, fan_out = shape[0], shape[1]
    a = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, minval=-a, maxval=a)


def init_linear(
    key: jax.Array,
    din: int,
    dout: int,
    *,
    bias: bool = True,
    init: str = "torch",
    dtype=jnp.float32,
) -> dict:
    """Initialize a Linear layer param dict {"w": (din, dout)[, "b": (dout,)]}."""
    kw, kb = jax.random.split(key)
    if init == "torch":
        bound = kaiming_uniform_bound(din)
        w = jax.random.uniform(kw, (din, dout), dtype, minval=-bound, maxval=bound)
    elif init == "glorot":
        w = glorot_uniform(kw, (din, dout), dtype)
    else:
        raise ValueError(f"unknown init {init!r}")
    params = {"w": w}
    if bias:
        if init == "glorot":
            params["b"] = jnp.zeros((dout,), dtype)
        else:
            bound = kaiming_uniform_bound(din)
            params["b"] = jax.random.uniform(
                kb, (dout,), dtype, minval=-bound, maxval=bound
            )
    return params


def apply_linear(params: dict, x: jnp.ndarray) -> jnp.ndarray:
    y = jnp.dot(x, params["w"], preferred_element_type=jnp.float32)
    if "b" in params:
        y = y + params["b"]
    return y.astype(x.dtype)
