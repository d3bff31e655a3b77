"""Halo comm-volume accounting: range vs locality partition (CPU, static).

Regenerates the BASELINE.md "halo comm-volume" table inputs on the collab
stand-in shape, now with the round-4 locality partitioner column (the
structural lever the round-4 table named).  Run: python scripts/halo_comm_volume.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from llp_tpu.core.graph import build_graph  # noqa: E402
from llp_tpu.data.partition import boundary_stats, locality_order  # noqa: E402
from llp_tpu.data.reorder import apply_order  # noqa: E402
from llp_tpu.data.synthetic import sbm_graph  # noqa: E402
from llp_tpu.parallel.halo import build_halo_partition  # noqa: E402

N, K, DEG, SEED, D = 235_868, 64, 8.2, 11, 128
BYTES = D * 4  # fp32 rows


def table_row(ei, n, p_, label):
    g = build_graph(ei, n)
    part = build_halo_partition(g, p_)
    cap = part.n_per
    assign = np.minimum(np.arange(n) // cap, p_ - 1).astype(np.int32)
    st = boundary_stats(ei, assign, p_)
    padded = p_ * (p_ - 1) * part.m
    halo_mb = padded * BYTES / 1e6
    repl_mb = p_ * (n - cap) * BYTES / 1e6
    psum_mb = p_ * n * BYTES / 1e6
    print(f"  {label:9s} P={p_}: m={part.m:7d} true_rows={st['boundary_rows']:8d} "
          f"padded_rows={padded:8d} halo={halo_mb:7.1f}MB "
          f"repl={repl_mb:7.1f}MB psum={psum_mb:7.1f}MB")
    return st["boundary_rows"], part.m


if __name__ == "__main__":
    import time

    ei, _ = sbm_graph(N, K, DEG, seed=SEED)
    x = np.zeros((N, 1), np.float32)
    for p_ in (2, 4, 8):
        table_row(ei, N, p_, "range")
        t0 = time.time()
        order = locality_order(ei, N, p_)
        dt = time.time() - t0
        _, ei2, _ = apply_order(x, ei, order)
        table_row(ei2, N, p_, "locality")
        print(f"            (locality_order: {dt:.1f}s)")
