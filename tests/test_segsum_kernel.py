"""Windowed Pallas segmented-sum: layout properties + parity with XLA."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llp_tpu.ops.pallas.segsum_kernel import (
    BE,
    RMAX,
    build_blocked_layout,
    segment_sum_blocked,
)


def _sorted_problem(n, e, d, seed=0):
    rng = np.random.default_rng(seed)
    seg = np.sort(rng.integers(0, n, e))
    send = rng.integers(0, n, e)
    x = rng.normal(size=(n, d)).astype(np.float32)
    return seg, send, x


def test_layout_covers_all_edges():
    seg, send, _ = _sorted_problem(1000, 5000, 8)
    lay = build_blocked_layout(seg, send, 1000)
    lid = np.asarray(lay.local_ids).reshape(-1)
    assert int((lid < RMAX).sum()) == 5000
    # every block's window is 8-aligned and local ids are in range
    assert (np.asarray(lay.block_r0) % 8 == 0).all()
    assert lid.max() <= RMAX


def test_layout_respects_window_span():
    seg, send, _ = _sorted_problem(100_000, 3000, 4, seed=1)  # sparse: big jumps
    lay = build_blocked_layout(seg, send, 100_000)
    lid = np.asarray(lay.local_ids).reshape(-1)
    r0 = np.asarray(lay.block_r0)
    for b in range(lay.num_blocks):
        blk = lid[b * BE : (b + 1) * BE]
        real = blk[blk < RMAX]
        if real.size:
            assert real.max() < RMAX
            assert r0[b] + real.max() < 100_000 + RMAX


@pytest.mark.parametrize("n,e,d", [(300, 2000, 32), (1000, 8000, 50), (97, 511, 8)])
def test_segsum_matches_xla(n, e, d):
    seg, send, x = _sorted_problem(n, e, d, seed=2)
    lay = build_blocked_layout(seg, send, n)
    out = np.asarray(segment_sum_blocked(jnp.asarray(x), lay, n))
    ref = np.asarray(
        jax.ops.segment_sum(
            jnp.take(jnp.asarray(x), jnp.asarray(send), axis=0),
            jnp.asarray(seg),
            num_segments=n,
        )
    )
    np.testing.assert_allclose(out, ref, atol=1e-3)


def test_segsum_empty_segments():
    # receivers with gaps (empty output rows stay zero)
    seg = np.array([5, 5, 900], np.int64)
    send = np.array([0, 1, 2], np.int64)
    x = np.eye(3, 16, dtype=np.float32)
    lay = build_blocked_layout(seg, send, 1000)
    out = np.asarray(segment_sum_blocked(jnp.asarray(x), lay, 1000))
    assert out.shape == (1000, 16)
    np.testing.assert_allclose(out[5], x[0] + x[1], atol=1e-6)
    np.testing.assert_allclose(out[900], x[2], atol=1e-6)
    assert np.abs(out).sum() == pytest.approx(np.abs(x[:3]).sum(), rel=1e-5)


def test_layout_arrays_are_lane_aligned_not_column_shaped():
    """Regression guard for the round-3 128x padding bug: the layout's
    local_ids must be stored as lane-aligned (B8, BE) rows — a (B*BE, 1)
    column would tile to T(8,128) on TPU with 128x padding (3.34 GB x2 of
    pure padding at 7M edges; OOM found at the 1M-node scale check)."""
    seg, send, _ = _sorted_problem(1000, 5000, 8)
    lay = build_blocked_layout(seg, send, 1000)
    # one row per block, rows padded to a multiple of 8, BE lanes
    assert lay.local_ids.ndim == 2
    assert lay.local_ids.shape[1] == BE
    assert lay.local_ids.shape[0] % 8 == 0
    assert lay.local_ids.shape[0] >= lay.num_blocks
    # no persistent layout array may have a trailing singleton dim (the
    # TPU tiles the last dim to 128 lanes: a (X, 1) store wastes 128x)
    for name, arr in lay._asdict().items():
        if hasattr(arr, "shape") and getattr(arr, "ndim", 0) >= 2:
            assert arr.shape[-1] != 1, (name, arr.shape)
    # unpadded bytes stay within ~2.2x of the edge count (pad rows + BE
    # chunking slack), nowhere near the 128x padded regime
    e_pad_slots = lay.num_blocks * BE
    assert lay.local_ids.size <= e_pad_slots + 8 * BE


def test_sharded_layout_arrays_lane_aligned():
    from llp_tpu.core import build_graph
    from llp_tpu.ops.pallas.segsum_kernel import build_shard_layouts

    rng = np.random.default_rng(3)
    ei = np.stack([rng.integers(0, 256, 4000), rng.integers(0, 256, 4000)])
    g = build_graph(ei, 256)
    lays = build_shard_layouts(g, 2)
    for name in ("fwd_local", "bwd_local"):
        arr = getattr(lays, name)
        assert arr.ndim == 3 and arr.shape[-1] == BE, (name, arr.shape)
        assert arr.shape[1] % 8 == 0
