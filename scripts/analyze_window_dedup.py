"""Static analysis: would window-level sender dedup cut the SpMM gather?

The r4 device trace (docs/traces/r4/) shows 68.4% of the warm teacher step is
the two edge-endpoint row gathers, and BASELINE.md records the gather as
row-COUNT-bound (bf16 half-width rows measured slower).  The segsum kernel
gathers one x-row per edge slot (B*BE rows).  If senders repeat within a
512-edge receiver-sorted window, gathering only the UNIQUE rows per block and
expanding in-kernel (an extra one-hot matmul — MXU is ~12% of the step) would
cut gather row count by the per-window duplication factor.

This script measures that factor on the exact edge streams training uses
(canonical receiver-sorted fwd, sender-sorted CSR bwd) for the bench graphs,
BEFORE any kernel is built.  Pure CPU/numpy.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")  # axon ignores env JAX_PLATFORMS

import numpy as np
from llp_tpu.data.synthetic import sbm_graph

BE = 512
RMAX = 512


def blocks_of(seg):
    """Chunk assignment per edge, identical to build_blocked_layout."""
    e = len(seg)
    win = seg // RMAX
    group_start = np.r_[0, np.flatnonzero(np.diff(win)) + 1]
    group_len = np.diff(np.r_[group_start, e])
    n_chunks = -(-group_len // BE)
    chunk_base = np.r_[0, np.cumsum(n_chunks)[:-1]].astype(np.int64)
    within = np.arange(e, dtype=np.int64) - np.repeat(group_start, group_len)
    chunk = np.repeat(chunk_base, group_len) + within // BE
    return chunk, int(n_chunks.sum())


def uniques_per_block(chunk, snd, nb):
    key = chunk * (int(snd.max()) + 2) + snd
    uk = np.unique(key)
    return np.bincount((uk // (int(snd.max()) + 2)).astype(np.int64), minlength=nb)


def analyze(name, seg, snd):
    chunk, nb = blocks_of(seg)
    uc = uniques_per_block(chunk, snd, nb)
    e = len(seg)
    tot_u = int(uc.sum())
    print(f"  {name}: E={e} blocks={nb} slots={nb*BE}")
    print(f"    uniques/block mean={uc.mean():.1f} p50={np.percentile(uc,50):.0f} "
          f"p90={np.percentile(uc,90):.0f} p99={np.percentile(uc,99):.0f} max={uc.max()}")
    print(f"    dedup (sum-uniques basis): {e/tot_u:.2f}x ; "
          f"vs padded slots: {nb*BE/tot_u:.2f}x")
    for umax in (512, 384, 256, 192, 128):
        # cost if every block pads its unique rows to UMAX, splitting blocks
        # whose uniques exceed it (approx: ceil split, sub-block uniques<=umax)
        nb2 = int(np.ceil(uc / umax).sum())
        gather_rows = nb2 * umax
        print(f"    UMAX={umax}: blocks={nb2} gather_rows={gather_rows} "
              f"-> {e/gather_rows:.2f}x vs per-edge, {nb*BE/gather_rows:.2f}x vs current slots")


def run(tag, n, k, deg, seed):
    ei, _ = sbm_graph(n, k, deg, seed=seed)
    s, r = ei[0], ei[1]
    print(f"{tag}: N={n} k={k} deg={deg}")
    order = np.argsort(r, kind="stable")
    analyze("fwd (recv-sorted)", r[order], s[order])
    order = np.argsort(s, kind="stable")
    analyze("bwd (send-sorted)", s[order], r[order])
    print()


if __name__ == "__main__":
    run("WARM bench", 20_000, 16, 16.0, 7)
    run("COLD collab-shape", 235_868, 64, 8.2, 11)
