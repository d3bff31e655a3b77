"""Mixed precision: bfloat16 compute over float32 master parameters.

The reference trains in fp32 end-to-end (torch CUDA).  On TPU the MXU runs
bf16 matmuls at twice the fp32 rate and every gather/DMA moves half the
bytes, so the TPU-native training step casts parameters and activations to
``compute_dtype`` for the forward/backward while keeping

* master params, Adam moments, and grad updates in fp32 (autodiff through
  the cast yields fp32 grads),
* batch-norm running buffers in fp32 (momentum accumulation would drift in
  bf16),
* loss math in fp32 (all of :mod:`llp_tpu.ops.losses` upcasts internally),
* matmul accumulation in fp32 (``preferred_element_type`` everywhere).

Default remains fp32; ``compute_dtype="bfloat16"`` is opt-in via config/CLI.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_DTYPES = {
    "float32": jnp.float32,
    "fp32": jnp.float32,
    "bfloat16": jnp.bfloat16,
    "bf16": jnp.bfloat16,
}


def resolve_dtype(spec):
    """'float32' | 'bfloat16' (+ short aliases) | a jnp dtype -> jnp dtype."""
    if spec is None:
        return jnp.float32
    if isinstance(spec, str):
        try:
            return _DTYPES[spec]
        except KeyError:
            raise ValueError(
                f"compute_dtype={spec!r}; expected one of {sorted(_DTYPES)}"
            ) from None
    return jnp.dtype(spec).type


def cast_params(tree, dtype):
    """Cast fp32 leaves of a params pytree to ``dtype`` for the forward pass.

    Batch-norm running buffers (any subtree keyed ``norm_state``) are left
    fp32: they are state, not weights, and their momentum update must not
    round.  Non-float leaves pass through untouched.
    """
    if dtype == jnp.float32:
        return tree

    def cast(path, leaf):
        if any(getattr(k, "key", None) == "norm_state" for k in path):
            return leaf
        if hasattr(leaf, "dtype") and leaf.dtype == jnp.float32:
            return leaf.astype(dtype)
        return leaf

    return jax.tree_util.tree_map_with_path(cast, tree)
