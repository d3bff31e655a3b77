"""Adam + per-group gradient clipping, matched to the reference's torch calls.

The reference clips the encoder's parameters and the predictor's parameters
with *separate* ``clip_grad_norm_(…, 1.0)`` calls (reference
``src/train_teacher_gnn.py:63-67``, ``src/main.py:224-228``) — i.e. each group
is scaled by min(1, 1/||g_group||₂) independently — then takes one Adam step
(torch defaults: betas (0.9, 0.999), eps 1e-8).  ``optax.adam`` with default
hyperparameters is update-for-update identical to torch's Adam, and
:func:`clip_by_group_norm` reproduces the grouped clip over the top-level keys
of the grad pytree.

(The reference also "clips" ``data.x``, which has no grad — a no-op [QUIRK],
not reproduced.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def clip_by_group_norm(grads: dict, max_norm: float = 1.0) -> dict:
    """Clip each top-level subtree of ``grads`` to global-norm ``max_norm``."""

    def clip_tree(tree):
        leaves = jax.tree_util.tree_leaves(tree)
        if not leaves:
            return tree
        sq = sum(jnp.sum(jnp.square(l.astype(jnp.float32))) for l in leaves)
        norm = jnp.sqrt(sq)
        # torch uses clip_coef = max_norm / (norm + 1e-6), clamped to <= 1.
        scale = jnp.minimum(1.0, max_norm / (norm + 1e-6))
        return jax.tree_util.tree_map(lambda l: (l * scale).astype(l.dtype), tree)

    return {k: clip_tree(v) for k, v in grads.items()}


def adam_init(params, lr: float):
    tx = optax.adam(lr)
    return tx, tx.init(params)


def adam_update(tx, grads, opt_state, params):
    updates, opt_state = tx.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state
