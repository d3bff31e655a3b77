"""Numerical-debug helpers (SURVEY §5.2 — the reference has no sanitizers).

* :func:`nan_debug` — context manager enabling jax's NaN debugger (every jit
  re-runs un-jitted on NaN and pinpoints the primitive).
* :func:`assert_finite` — host-side pytree finiteness check for use between
  epochs when chasing a divergence.
"""

from __future__ import annotations

import contextlib
from typing import Any


@contextlib.contextmanager
def nan_debug(enable: bool = True):
    import jax

    if not enable:
        yield
        return
    old = jax.config.read("jax_debug_nans")
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", old)


def assert_finite(tree: Any, name: str = "pytree") -> None:
    import jax
    import numpy as np

    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(jax.device_get(leaf))
        if arr.dtype.kind == "f" and not np.isfinite(arr).all():
            keystr = jax.tree_util.keystr(path)
            raise FloatingPointError(
                f"non-finite values in {name}{keystr}: "
                f"{np.count_nonzero(~np.isfinite(arr))}/{arr.size} bad"
            )
