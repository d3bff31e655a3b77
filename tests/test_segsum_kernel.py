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
