"""Resumable training state — the checkpoint/resume capability the reference
lacks (SURVEY.md §5.3-5.4: a crash loses the run there; here any run resumes
from the last periodic snapshot).

A snapshot = params + optimizer state + loop counters + the run loggers'
accumulated results, written via the npz checkpoint with the counters and
logger history in JSON metadata.  Optimizer state is an optax pytree of
NamedTuples; it round-trips through ``tree_flatten`` with the structure
rebuilt from a freshly-initialized template at load time.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax

from llp_tpu.utils.checkpoint import load_checkpoint, save_checkpoint


def save_run_state(
    path: str,
    *,
    params: Any,
    opt_state: Any,
    run: int,
    epoch: int,
    best_val: float,
    cnt_wait: int,
    val_max: float,
    logger_results: Dict[str, list],
) -> None:
    opt_leaves = jax.tree_util.tree_leaves(opt_state)
    blob = {
        "params": params,
        "opt": {str(i): leaf for i, leaf in enumerate(opt_leaves)},
    }
    meta = {
        "run": run,
        "epoch": epoch,
        "best_val": best_val,
        "cnt_wait": cnt_wait,
        "val_max": val_max,
        "logger_results": {
            k: [[list(map(float, t)) for t in runres] for runres in v]
            for k, v in logger_results.items()
        },
    }
    save_checkpoint(path, blob, meta)


def load_run_state(path: str, opt_template: Any) -> Optional[Tuple[Any, Any, dict]]:
    """Returns (params, opt_state, meta) or None if no snapshot exists."""
    if not os.path.exists(path + ".npz"):
        return None
    blob, meta = load_checkpoint(path)
    params = blob["params"]
    opt_dict = blob.get("opt", {})
    # _unflatten rebuilds digit-keyed dicts as lists.
    if isinstance(opt_dict, list):
        leaves = opt_dict
    else:
        leaves = [opt_dict[str(i)] for i in range(len(opt_dict))]
    treedef = jax.tree_util.tree_structure(opt_template)
    opt_state = jax.tree_util.tree_unflatten(treedef, leaves)
    return params, opt_state, meta
