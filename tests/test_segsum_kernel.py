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


def test_chunked_accumulation_matches_single_dispatch(monkeypatch):
    """Round 5: streams whose message tensor exceeds the chunk budget split
    into window-aligned block ranges accumulating into the aliased output.
    Forcing a tiny budget must reproduce the single-dispatch result exactly
    (fp32 accumulation order within a window is unchanged; only the
    dispatch boundaries move), including windows spanning chunk edges."""
    from llp_tpu.ops.pallas import segsum_kernel as sk

    seg, send, x = _sorted_problem(700, 24_000, 24, seed=3)
    lay = build_blocked_layout(seg, send, 700)
    assert lay.num_blocks > 16  # enough blocks for several chunks
    want = np.asarray(segment_sum_blocked(jnp.asarray(x), lay, 700))
    monkeypatch.setattr(sk, "_CHUNK_MSG_BYTES", 8 * BE * 128 * 4)
    got = np.asarray(segment_sum_blocked(jnp.asarray(x), lay, 700))
    np.testing.assert_array_equal(got, want)


def test_chunked_grad_matches_through_custom_vjp(monkeypatch):
    """The chunked path must hold through the spmm custom VJP (forward AND
    the transposed-layout backward), unweighted and weighted."""
    from llp_tpu.core import build_graph
    from llp_tpu.data.synthetic import sbm_graph
    from llp_tpu.ops.pallas import segsum_kernel as sk
    from llp_tpu.ops.spmm import spmm

    ei, _ = sbm_graph(500, 4, 24.0, seed=9)
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.normal(size=(500, 24)), jnp.float32)

    def run():
        sk._SEG_FN_CACHE.clear()  # rebuild fns under the active budget
        g = build_graph(ei, 500)
        ew = jnp.asarray(rng2.normal(size=g.senders.shape), jnp.float32)
        sk.prepare_segsum(g, weighted=True)
        f = lambda xx: jnp.sum(spmm(g, xx, "mean", impl="segsum") ** 2)
        fw = lambda xx, ww: jnp.sum(
            spmm(g, xx, "mean", edge_weight=ww, impl="segsum") ** 2
        )
        out = (f(x), jax.grad(f)(x), fw(x, ew), *jax.grad(fw, (0, 1))(x, ew))
        return [np.asarray(o) for o in out]

    rng2 = np.random.default_rng(4)
    want = run()
    rng2 = np.random.default_rng(4)
    monkeypatch.setattr(sk, "_CHUNK_MSG_BYTES", 4 * BE * 128 * 4)
    got = run()
    for g_, w_ in zip(got, want):
        np.testing.assert_allclose(g_, w_, rtol=1e-6, atol=1e-6)


def test_narrow_features_use_128_lane_tile():
    """D<=128 streams must not pad gathered messages to 256 lanes (2x DMA
    and HBM waste — the r3 layout-padding bug class at the feature axis)."""
    seg, send, x = _sorted_problem(300, 4000, 100, seed=1)
    lay = build_blocked_layout(seg, send, 300)
    out = segment_sum_blocked(jnp.asarray(x), lay, 300)
    assert out.shape == (300, 100)
    ref = np.zeros((300, 100), np.float32)
    np.add.at(ref, seg, x[send])
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-4)


class TestArgPassedLayouts:
    """attach_segsum: layouts as traced jit ARGUMENTS (round 5) — the path
    huge graphs need on remote-compile runtimes (closure layouts serialize
    into the HLO upload at ~16 B/edge)."""

    def _graph(self, n=400, deg=12.0, seed=7):
        from llp_tpu.core import build_graph
        from llp_tpu.data.synthetic import sbm_graph
        from llp_tpu.ops.pallas.segsum_kernel import attach_segsum

        ei, _ = sbm_graph(n, 4, deg, seed=seed)
        g = build_graph(ei, n)
        return attach_segsum(g), ei

    @pytest.mark.parametrize("reduce", ["sum", "mean"])
    def test_matches_xla_and_grads(self, reduce):
        from llp_tpu.ops.spmm import spmm

        g, _ = self._graph()
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(400, 24)), jnp.float32)

        def run(impl):
            f = lambda xx: jnp.sum(spmm(g, xx, reduce, impl=impl) ** 2)
            return spmm(g, x, reduce, impl=impl), jax.grad(f)(x)

        (o_seg, g_seg), (o_xla, g_xla) = run("segsum"), run("xla")
        np.testing.assert_allclose(np.asarray(o_seg), np.asarray(o_xla),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(g_seg), np.asarray(g_xla),
                                   rtol=1e-5, atol=1e-4)

    def test_traced_graph_no_large_constants(self):
        """The whole point: jitting over a TRACED attached graph must not
        bake layout arrays in as constants."""
        from llp_tpu.ops.spmm import spmm

        g, _ = self._graph()
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.normal(size=(400, 24)), jnp.float32)

        def loss(graph, xx):
            return jnp.sum(spmm(graph, xx, "mean", impl="segsum") ** 2)

        jaxpr = jax.make_jaxpr(lambda graph, xx: (
            loss(graph, xx), jax.grad(loss, argnums=1)(graph, xx)
        ))(g, x)
        assert "pallas_call" in str(jaxpr)
        big = [np.asarray(c).nbytes for c in jaxpr.consts
               if hasattr(c, "nbytes") and np.asarray(c).nbytes > 4096]
        assert not big, f"large closure constants leaked: {big}"

    def test_bf16_out_close_to_fp32(self):
        """bf16 x routes the bf16-out kernel (one round per window store):
        must agree with the fp32 path to bf16 resolution, fwd and bwd."""
        from llp_tpu.ops.spmm import spmm

        g, _ = self._graph()
        rng = np.random.default_rng(3)
        x32 = jnp.asarray(rng.normal(size=(400, 24)), jnp.float32)
        x16 = x32.astype(jnp.bfloat16)
        o32 = spmm(g, x32, "mean", impl="segsum")
        o16 = spmm(g, x16, "mean", impl="segsum")
        assert o16.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            np.asarray(o16, np.float32), np.asarray(o32), rtol=3e-2,
            atol=3e-2,
        )
        f = lambda xx: jnp.sum(spmm(g, xx, "mean", impl="segsum") ** 2)
        g16 = jax.grad(f)(x16)
        g32 = jax.grad(f)(x32)
        assert g16.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            np.asarray(g16, np.float32), np.asarray(g32), rtol=6e-2,
            atol=0.25,
        )

    def test_chunked_arg_path(self, monkeypatch):
        from llp_tpu.ops.pallas import segsum_kernel as sk
        from llp_tpu.ops.spmm import spmm

        g, _ = self._graph(n=600, deg=30.0)
        rng = np.random.default_rng(4)
        x = jnp.asarray(rng.normal(size=(600, 24)), jnp.float32)
        want = np.asarray(spmm(g, x, "sum", impl="segsum"))
        monkeypatch.setattr(sk, "_CHUNK_MSG_BYTES", 4 * BE * 128 * 4)
        got = np.asarray(spmm(g, x, "sum", impl="segsum"))
        np.testing.assert_array_equal(got, want)

    def test_attach_inside_jit_raises(self):
        from llp_tpu.ops.pallas.segsum_kernel import attach_segsum

        g, _ = self._graph()

        def bad(graph):
            return attach_segsum(graph).in_degree

        with pytest.raises(RuntimeError, match="outside jit"):
            jax.jit(bad)(g)
