"""ctypes bindings + lazy g++ build for the native sampler."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "sampler.cpp")
_SO = os.path.join(_HERE, "_libllpsampler.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            if (not os.path.exists(_SO)) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
                subprocess.run(
                    [
                        "g++", "-O3", "-march=native", "-shared", "-fPIC",
                        "-std=c++17", "-pthread", _SRC, "-o", _SO,
                    ],
                    check=True,
                    capture_output=True,
                )
            lib = ctypes.CDLL(_SO)
            i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
            i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
            lib.llp_random_walks.argtypes = [
                i32p, i32p, ctypes.c_int32, i32p, ctypes.c_int64,
                ctypes.c_int32, ctypes.c_uint64, i32p,
            ]
            lib.llp_sample_negative_edges.argtypes = [
                i64p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int32, ctypes.c_int32, ctypes.c_uint64, i32p, i32p,
            ]
            lib.llp_build_csr_perm.argtypes = [
                i32p, ctypes.c_int64, ctypes.c_int32, i32p, i64p,
            ]
            lib.llp_partition_graph.argtypes = [
                i32p, i32p, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
                ctypes.c_int32, ctypes.c_int32, i32p, i32p,
            ]
            lib.llp_partition_multilevel.argtypes = [
                i32p, i32p, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
                ctypes.c_int32, ctypes.c_double, i32p,
            ]
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def native_available() -> bool:
    return _build() is not None


def random_walks(
    row_ptr: np.ndarray,
    col: np.ndarray,
    starts: np.ndarray,
    walk_length: int,
    seed: int,
) -> np.ndarray:
    """(B, walk_length+1) uniform walks; isolated nodes stay in place."""
    row_ptr = np.ascontiguousarray(row_ptr, np.int32)
    col = np.ascontiguousarray(col, np.int32)
    starts = np.ascontiguousarray(starts, np.int32)
    out = np.empty((starts.shape[0], walk_length + 1), np.int32)
    lib = _build()
    if lib is not None:
        lib.llp_random_walks(
            row_ptr, col, np.int32(row_ptr.shape[0] - 1), starts,
            np.int64(starts.shape[0]), np.int32(walk_length), np.uint64(seed), out,
        )
        return out
    # numpy fallback
    rng = np.random.default_rng(seed)
    cur = starts.copy()
    out[:, 0] = cur
    deg_all = row_ptr[1:] - row_ptr[:-1]
    for s in range(walk_length):
        deg = deg_all[cur]
        off = (rng.random(cur.shape[0]) * deg).astype(np.int64)
        if col.size:
            # clamp BEFORE the gather: for a tail isolated node
            # row_ptr[cur] == E and the unguarded index col[E] is OOB (the
            # where() below discards the value but numpy gathers eagerly)
            idx = np.minimum(
                row_ptr[cur] + np.minimum(off, np.maximum(deg - 1, 0)),
                col.shape[0] - 1,
            )
            nxt = col[idx]
            cur = np.where(deg > 0, nxt, cur).astype(np.int32)
        out[:, s + 1] = cur
    return out


def sample_negative_edges(
    sorted_keys: np.ndarray,
    num_nodes: int,
    num_samples: int,
    seed: int,
    *,
    force_undirected: bool = False,
    max_rounds: int = 16,
) -> np.ndarray:
    """(2, num_samples) pairs avoiding the sorted int64 key set.

    Unlike the on-device sampler (int32-keyed, N <= 46340), this handles any
    node count — the host path for collab-scale graphs.
    """
    sorted_keys = np.ascontiguousarray(sorted_keys, np.int64)
    src = np.empty((num_samples,), np.int32)
    dst = np.empty((num_samples,), np.int32)
    lib = _build()
    if lib is not None:
        lib.llp_sample_negative_edges(
            sorted_keys, np.int64(sorted_keys.shape[0]), np.int64(num_nodes),
            np.int64(num_samples), np.int32(bool(force_undirected)),
            np.int32(max_rounds), np.uint64(seed), src, dst,
        )
        return np.stack([src, dst])
    # numpy fallback (vectorized rejection)
    rng = np.random.default_rng(seed)
    a = rng.integers(0, num_nodes, num_samples)
    b = rng.integers(0, num_nodes, num_samples)
    for _ in range(max_rounds):
        if force_undirected:
            bad_sym = a >= b
        else:
            bad_sym = np.zeros(num_samples, bool)
        keys = a * num_nodes + b
        if sorted_keys.size:
            idx = np.clip(np.searchsorted(sorted_keys, keys), 0, sorted_keys.size - 1)
            bad = bad_sym | (sorted_keys[idx] == keys)
        else:  # empty exclusion set: indexing it (even masked) would raise
            bad = bad_sym
        if not bad.any():
            break
        n_bad = int(bad.sum())
        a[bad] = rng.integers(0, num_nodes, n_bad)
        b[bad] = rng.integers(0, num_nodes, n_bad)
    return np.stack([a.astype(np.int32), b.astype(np.int32)])


def partition_graph(
    row_ptr: np.ndarray,
    col: np.ndarray,
    num_parts: int,
    max_passes: int,
    cap: int,
    cap2: int,
    order: np.ndarray,
) -> np.ndarray:
    """(N,) int32 balanced locality partition (see sampler.cpp).

    LDG stream over ``order`` then capacitated label-propagation restreams.
    Deterministic (no RNG): the numpy fallback implements the identical
    sequential algorithm, so both paths produce the same assignment.
    """
    row_ptr = np.ascontiguousarray(row_ptr, np.int32)
    col = np.ascontiguousarray(col, np.int32)
    order = np.ascontiguousarray(order, np.int32)
    n = row_ptr.shape[0] - 1
    assign = np.empty((n,), np.int32)
    lib = _build()
    if lib is not None:
        lib.llp_partition_graph(
            row_ptr, col, np.int32(n), np.int32(num_parts),
            np.int32(max_passes), np.int32(cap), np.int32(cap2), order, assign,
        )
        return assign
    # numpy fallback: same algorithm, python loops (small graphs / no g++).
    if n > 100_000:
        import warnings

        # O(max_passes * N * P) interpreter iterations: a million-node
        # graph without g++ would look like a hang at data-prep time.
        warnings.warn(
            f"native sampler library unavailable (no g++?): partitioning "
            f"{n} nodes with the pure-python fallback — this is "
            f"O(passes*N*P) interpreter work and may take hours at this "
            f"scale; install g++ so llp_tpu can compile native/sampler.cpp.",
            RuntimeWarning, stacklevel=2,
        )
    assign[:] = -1
    load = np.zeros(num_parts, np.int64)
    nb = np.zeros(num_parts, np.int64)
    for v in order:
        nbrs = col[row_ptr[v]:row_ptr[v + 1]]
        nb[:] = 0
        an = assign[nbrs]
        an = an[an >= 0]
        if an.size:
            np.add.at(nb, an, 1)
        score = nb * (cap - load)
        score[load >= cap] = np.iinfo(np.int64).min
        best = int(np.argmax(score))  # ties -> lowest p, like the C++ scan
        assign[v] = best
        load[best] += 1
    for _ in range(max_passes):
        moved = 0
        for v in range(n):
            cur = assign[v]
            nbrs = col[row_ptr[v]:row_ptr[v + 1]]
            nb[:] = 0
            np.add.at(nb, assign[nbrs], 1)
            score = np.where((load < cap2) | (np.arange(num_parts) == cur), nb, -1)
            best = int(np.argmax(score))
            if best != cur and score[best] > nb[cur]:
                load[cur] -= 1
                load[best] += 1
                assign[v] = best
                moved += 1
        if moved == 0:
            break
    return assign


def partition_multilevel(
    row_ptr: np.ndarray,
    col: np.ndarray,
    num_parts: int,
    coarsest: int,
    refine_passes: int,
    slack: float,
) -> np.ndarray | None:
    """(N,) int32 multilevel partition (sampler.cpp V-cycle), or None when
    the native library is unavailable (callers fall back to the flat
    restreaming path)."""
    lib = _build()
    if lib is None:
        return None
    row_ptr = np.ascontiguousarray(row_ptr, np.int32)
    col = np.ascontiguousarray(col, np.int32)
    n = row_ptr.shape[0] - 1
    assign = np.empty((n,), np.int32)
    lib.llp_partition_multilevel(
        row_ptr, col, np.int32(n), np.int32(num_parts), np.int32(coarsest),
        np.int32(refine_passes), ctypes.c_double(slack), assign,
    )
    return assign


def build_csr(
    senders: np.ndarray, receivers: np.ndarray, num_nodes: int
) -> Tuple[np.ndarray, np.ndarray]:
    """(row_ptr, col) CSR sorted stably by sender."""
    senders = np.ascontiguousarray(senders, np.int32)
    receivers = np.ascontiguousarray(receivers, np.int32)
    e = senders.shape[0]
    lib = _build()
    if lib is not None:
        row_ptr = np.empty((num_nodes + 1,), np.int32)
        perm = np.empty((e,), np.int64)
        lib.llp_build_csr_perm(senders, np.int64(e), np.int32(num_nodes), row_ptr, perm)
        return row_ptr, receivers[perm]
    order = np.argsort(senders, kind="stable")
    counts = np.bincount(senders, minlength=num_nodes)
    row_ptr = np.zeros((num_nodes + 1,), np.int32)
    row_ptr[1:] = np.cumsum(counts).astype(np.int32)
    return row_ptr, receivers[order]
