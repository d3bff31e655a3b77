"""Driver hooks: entry() compiles single-device; dryrun_multichip(8) runs the
full sharded stack on the virtual CPU mesh (same surface the round driver
exercises)."""

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")


def test_entry_compiles_and_runs():
    from __graft_entry__ import entry

    fn, args = entry()
    out = jax.jit(fn)(*args)
    assert np.isfinite(np.asarray(out)).all()


def test_dryrun_multichip_8():
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8)
