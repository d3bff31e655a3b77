"""Int8-quantized serving tables (llp_tpu/serve/quant.py).

Gates: per-element dequantization error is bounded by scale/2; the MXU int8
dot path agrees with dense dequantized scoring to float rounding; quantized
retrieval reproduces the fp32 top-k (recall + score-error bounds); the
ServingState / ShardedServingState / HTTP daemon surfaces work quantized
(the sharded state must match the single-device one exactly — identical
dequant arithmetic).
"""

import json
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llp_tpu.models.predictor import apply_link_predictor, init_link_predictor
from llp_tpu.serve import score_pairs, top_k_partners
from llp_tpu.serve.quant import (
    QuantTable,
    as_numpy_dense,
    dequantize_rows,
    int8_dot_scores,
    quantize_table,
)


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(7)
    n, h = 257, 24  # n not a multiple of any block / mesh size
    emb = jnp.asarray(rng.normal(size=(n, h)), jnp.float32)
    preds = {
        "mlp": init_link_predictor(jax.random.PRNGKey(1), "mlp", h, h, 1, 2),
        "inner": init_link_predictor(jax.random.PRNGKey(2), "inner", h, h),
    }
    return emb, quantize_table(emb), preds


def test_quantize_error_bound(setup):
    emb, qt, _ = setup
    deq = as_numpy_dense(qt)
    err = np.abs(deq - np.asarray(emb))
    bound = np.asarray(qt.scale)[:, None] / 2 + 1e-6
    assert (err <= bound).all()
    assert qt.q.dtype == jnp.int8 and qt.scale.dtype == jnp.float32
    # int8 codes + one fp32 scale per row (→ ~4x smaller at serving widths,
    # e.g. 242MB → 61MB at collab's 236k x 256)
    n, hd = emb.shape
    assert qt.nbytes == n * hd + n * 4


def test_quantize_zero_rows_exact():
    h = jnp.zeros((5, 8), jnp.float32)
    qt = quantize_table(h)
    assert (np.asarray(qt.q) == 0).all()
    np.testing.assert_array_equal(as_numpy_dense(qt), np.zeros((5, 8)))


def test_dequantize_rows_matches_dense(setup):
    _, qt, _ = setup
    idx = jnp.asarray([0, 3, 256, 17], jnp.int32)
    rows = dequantize_rows(qt, idx)
    np.testing.assert_allclose(
        np.asarray(rows), as_numpy_dense(qt)[np.asarray(idx)], rtol=1e-6
    )
    assert dequantize_rows(qt, idx, dtype=jnp.bfloat16).dtype == jnp.bfloat16


def test_int8_dot_scores_matches_dense(setup):
    _, qt, _ = setup
    qi = jnp.asarray([5, 0, 99], jnp.int32)
    dots = np.asarray(int8_dot_scores(qt, qi))
    deq = as_numpy_dense(qt)
    n_pad = dots.shape[1]
    ref = deq[np.asarray(qi)] @ np.pad(deq, ((0, n_pad - deq.shape[0]), (0, 0))).T
    # The integer dot is EXACT; only the fp32 scale multiply rounds.
    np.testing.assert_allclose(dots, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("mode", ["mlp", "inner"])
@pytest.mark.parametrize("approx", [False, True])
def test_topk_quant_matches_fp32(setup, mode, approx):
    emb, qt, preds = setup
    qi = np.asarray([0, 7, 100, 256], np.int32)
    k = 5
    v_f, i_f = top_k_partners(
        preds[mode], emb, qi, k=k, mode=mode, block=64, approx=approx
    )
    v_q, i_q = top_k_partners(
        preds[mode], qt, qi, k=k, mode=mode, block=64, approx=approx
    )
    # int8 rounding can swap near-ties; require high recall + tight scores.
    recall = np.mean([
        len(set(a.tolist()) & set(b.tolist())) / k
        for a, b in zip(np.asarray(i_f), np.asarray(i_q))
    ])
    assert recall >= 0.8, recall
    np.testing.assert_allclose(np.asarray(v_f), np.asarray(v_q), atol=0.05)


def test_topk_quant_scores_are_selfconsistent(setup):
    """Quantized retrieval's (score, id) rows must equal brute-force scoring
    of the DEQUANTIZED table — the approximation is the table, not the
    search."""
    emb, qt, preds = setup
    qi = np.asarray([3, 42], np.int32)
    vals, ids = top_k_partners(
        preds["mlp"], qt, qi, k=4, mode="mlp", block=64
    )
    deq = jnp.asarray(as_numpy_dense(qt))
    full = np.asarray(
        apply_link_predictor(
            preds["mlp"], deq[np.asarray(qi)][:, None, :], deq[None, :, :],
            mode="mlp", train=False,
        )
    )
    for r, q in enumerate(qi):
        scores = full[r].copy()
        scores[q] = -np.inf
        order = np.argsort(-scores)[:4]
        np.testing.assert_allclose(np.asarray(vals)[r], scores[order], atol=1e-5)


@pytest.mark.parametrize("mode", ["mlp", "inner"])
def test_score_pairs_quant_close(setup, mode):
    emb, qt, preds = setup
    rng = np.random.default_rng(3)
    src = rng.integers(0, emb.shape[0], size=100).astype(np.int32)
    dst = rng.integers(0, emb.shape[0], size=100).astype(np.int32)
    s_f = np.asarray(score_pairs(preds[mode], emb, src, dst, mode=mode, block=64))
    s_q = np.asarray(score_pairs(preds[mode], qt, src, dst, mode=mode, block=64))
    assert np.abs(s_f - s_q).max() < 0.05


def test_topk_quant_bf16_dequant_compose(setup):
    """compute_dtype on a quantized table sets the dequantized block dtype
    (blocked path); results stay close to fp32-dequant."""
    _, qt, preds = setup
    qi = np.asarray([1, 2], np.int32)
    v32, _ = top_k_partners(preds["mlp"], qt, qi, k=4, mode="mlp", block=64)
    v16, _ = top_k_partners(
        preds["mlp"], qt, qi, k=4, mode="mlp", block=64,
        compute_dtype=jnp.bfloat16,
    )
    np.testing.assert_allclose(np.asarray(v32), np.asarray(v16), atol=0.03)


def test_serving_state_quantized(setup):
    from llp_tpu.serve.server import ServingState

    emb, qt, preds = setup
    state = ServingState(preds["mlp"], emb, mode="mlp", quantize="int8",
                         block=64)
    assert isinstance(state.h, QuantTable)
    assert state.num_nodes == emb.shape[0] and state.dim == emb.shape[1]
    vals, ids = state.topk([0, 5], 3)
    vq, iq = top_k_partners(preds["mlp"], qt, np.asarray([0, 5], np.int32),
                            k=3, mode="mlp", block=64)
    np.testing.assert_allclose(vals, np.asarray(vq), atol=1e-6)
    np.testing.assert_array_equal(ids, np.asarray(iq))
    s = state.score([[0, 5], [3, 77]])
    sq = score_pairs(preds["mlp"], qt, np.asarray([0, 3], np.int32),
                     np.asarray([5, 77], np.int32), mode="mlp", block=64)
    np.testing.assert_allclose(s, np.asarray(sq)[: len(s)], atol=1e-6)


def test_serving_state_rejects_unknown_quantize(setup):
    from llp_tpu.serve.server import ServingState

    emb, _, preds = setup
    with pytest.raises(ValueError, match="quantize"):
        ServingState(preds["mlp"], emb, quantize="int2")


def test_sharded_quantized_matches_single_device(setup):
    """Exact parity: the sharded int8 state runs the same dequant arithmetic
    as the single-device one (per-shard merges are exact)."""
    from jax.sharding import Mesh

    from llp_tpu.serve.server import ServingState, ShardedServingState

    emb, _, preds = setup
    devs = jax.devices()
    if len(devs) < 2:
        pytest.skip("needs a multi-device mesh")
    mesh = Mesh(np.array(devs), ("data",))
    single = ServingState(preds["mlp"], emb, mode="mlp", quantize="int8",
                          block=32)
    shard = ShardedServingState(preds["mlp"], emb, mesh, mode="mlp",
                                quantize="int8", block=32)
    assert isinstance(shard.h, QuantTable)
    v1, i1 = single.topk(list(range(7)), 5)
    v2, i2 = shard.topk(list(range(7)), 5)
    np.testing.assert_allclose(v1, v2, atol=1e-5)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(
        single.score([[0, 5], [3, 77]]), shard.score([[0, 5], [3, 77]]),
        atol=1e-5,
    )


def test_requantize_dequantized_rows_exact(setup):
    """Dequantized absmax rows requantize to their ORIGINAL codes/scales —
    the property that lets the sharded 'inner' path recover query codes from
    the replicated dequantized query rows."""
    from llp_tpu.serve.quant import quantize_rows

    _, qt, _ = setup
    deq = jnp.asarray(as_numpy_dense(qt))
    q2, s2 = quantize_rows(deq)
    np.testing.assert_array_equal(np.asarray(q2), np.asarray(qt.q))
    np.testing.assert_allclose(np.asarray(s2), np.asarray(qt.scale), rtol=1e-7)


@pytest.mark.parametrize("cdtype", [None, "bfloat16"])
def test_sharded_quantized_inner_matches_single_device(setup, cdtype):
    """The sharded quantized 'inner' path dots int8 codes on-device (like the
    single-device engine) — scores and ids must match the single-device
    int8 path exactly.  Including under compute_dtype=bf16: query
    requantization must happen BEFORE the bf16 cast (a bf16 round-trip
    flips codes by ±1 — round-3 review finding)."""
    from jax.sharding import Mesh

    from llp_tpu.serve.server import ServingState, ShardedServingState

    emb, _, preds = setup
    devs = jax.devices()
    if len(devs) < 2:
        pytest.skip("needs a multi-device mesh")
    cd = jnp.bfloat16 if cdtype == "bfloat16" else None
    mesh = Mesh(np.array(devs), ("data",))
    single = ServingState(preds["inner"], emb, mode="inner", quantize="int8",
                          block=32)
    shard = ShardedServingState(preds["inner"], emb, mesh, mode="inner",
                                quantize="int8", block=32, compute_dtype=cd)
    # Queries include rows whose dequantized values do NOT survive a bf16
    # round-trip (rows 56/68/80 flip codes under requantize-after-cast for
    # this fixture) — so the bf16 case FAILS if quantization runs after
    # the compute_dtype cast.
    qs = [0, 5, 56, 68, 80, 87, 93]
    v1, i1 = single.topk(qs, 5)
    v2, i2 = shard.topk(qs, 5)
    np.testing.assert_allclose(v1, v2, atol=1e-6)
    np.testing.assert_array_equal(i1, i2)


def test_daemon_quantized_roundtrip(setup):
    from llp_tpu.serve.server import BackgroundServer, ServingState

    emb, _, preds = setup
    state = ServingState(preds["mlp"], emb, mode="mlp", quantize="int8",
                         block=64)
    with BackgroundServer(state) as srv:
        health = json.load(
            urllib.request.urlopen(f"http://127.0.0.1:{srv.port}/healthz")
        )
        assert health["table_dtype"] == "int8"
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/v1/topk",
            json.dumps({"queries": [0, 5], "k": 3}).encode(),
            {"Content-Type": "application/json"},
        )
        res = json.load(urllib.request.urlopen(req))
        direct_v, direct_i = state.topk([0, 5], 3)
        for row, want_ids, want_vals in zip(
            res["results"], direct_i, direct_v
        ):
            assert row["partners"] == want_ids.tolist()
            np.testing.assert_allclose(row["scores"], want_vals, atol=1e-5)


# ---- int4 (packed-nibble) tables ---------------------------------------------


@pytest.fixture(scope="module")
def setup4(setup):
    emb, _, preds = setup
    return emb, quantize_table(emb, bits=4), preds


def test_int4_pack_unpack_roundtrip():
    from llp_tpu.serve.quant import pack_int4, unpack_int4

    rng = np.random.default_rng(0)
    codes = jnp.asarray(rng.integers(-7, 8, size=(13, 10)), jnp.int8)
    packed = pack_int4(codes)
    # lane-packed: TWO logical rows per storage row (odd M pads a half-row)
    # so the storage minor dim stays the logical H — the (M, H/2) column
    # layout tiled 2x on TPU lanes at H=128 (the 100M-scale OOM).
    assert packed.shape == (7, 10) and packed.dtype == jnp.uint8
    np.testing.assert_array_equal(
        np.asarray(unpack_int4(packed, num_rows=13)), np.asarray(codes)
    )


def test_int4_error_bound_and_layout(setup4):
    emb, qt, _ = setup4
    n, hd = emb.shape
    assert qt.q.shape == ((n + 1) // 2, hd) and qt.q.dtype == jnp.uint8
    assert qt.shape == (n, hd)  # LOGICAL shape
    assert qt.fmt == "int4"
    # ~8x smaller codes than fp32 (one padded half-row at odd N)
    assert qt.nbytes == ((n + 1) // 2) * hd + n * 4
    deq = as_numpy_dense(qt)
    err = np.abs(deq - np.asarray(emb))
    bound = np.asarray(qt.scale)[:, None] / 2 + 1e-6  # scale = absmax/7
    assert (err <= bound).all()


def test_int4_requantize_dequantized_rows_exact(setup4):
    from llp_tpu.serve.quant import pack_int4, quantize_rows

    _, qt, _ = setup4
    deq = jnp.asarray(as_numpy_dense(qt))
    q2, s2 = quantize_rows(deq, bits=4)
    np.testing.assert_array_equal(np.asarray(pack_int4(q2)), np.asarray(qt.q))
    # codes are bit-exact; the scale recovers to 1 ulp ((7s)/7 re-rounds,
    # unlike 127 whose round-trip happened to be exact in this fixture)
    np.testing.assert_allclose(np.asarray(s2), np.asarray(qt.scale), rtol=3e-7)


def test_int4_dot_scores_matches_dense(setup4):
    _, qt, _ = setup4
    qi = jnp.asarray([5, 0, 99], jnp.int32)
    dots = np.asarray(int8_dot_scores(qt, qi))
    deq = as_numpy_dense(qt)
    ref = deq[np.asarray(qi)] @ np.pad(
        deq, ((0, dots.shape[1] - deq.shape[0]), (0, 0))
    ).T
    np.testing.assert_allclose(dots, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("mode", ["mlp", "inner"])
@pytest.mark.parametrize("approx", [False, True])
def test_int4_topk_selfconsistent_and_recall(setup4, mode, approx):
    """The SEARCH stays exact over the int4-dequantized table (the
    approximation is the table, not the retrieval); vs fp32 this random
    gaussian fixture is a worst case (near-tie dots) — measured recall@5
    0.75-0.8, gated at 0.6."""
    emb, qt, preds = setup4
    qi = np.asarray([0, 7, 100, 256], np.int32)
    v_q, i_q = top_k_partners(
        preds[mode], qt, qi, k=5, mode=mode, block=64, approx=approx
    )
    deq = jnp.asarray(as_numpy_dense(qt))
    full = np.asarray(
        apply_link_predictor(
            preds[mode], deq[np.asarray(qi)][:, None, :], deq[None, :, :],
            mode=mode, train=False,
        )
    )
    for r, q in enumerate(qi):
        scores = full[r].copy()
        scores[q] = -np.inf
        order = np.argsort(-scores)[:5]
        np.testing.assert_allclose(np.asarray(v_q)[r], scores[order], atol=1e-5)
    v_f, i_f = top_k_partners(
        preds[mode], emb, qi, k=5, mode=mode, block=64, approx=approx
    )
    recall = np.mean([
        len(set(a.tolist()) & set(b.tolist())) / 5
        for a, b in zip(np.asarray(i_f), np.asarray(i_q))
    ])
    assert recall >= 0.6, recall


def test_int4_score_pairs_close(setup4):
    emb, qt, preds = setup4
    rng = np.random.default_rng(3)
    src = rng.integers(0, emb.shape[0], size=100).astype(np.int32)
    dst = rng.integers(0, emb.shape[0], size=100).astype(np.int32)
    for mode, tol in (("mlp", 0.1), ("inner", 0.5)):
        s_f = np.asarray(
            score_pairs(preds[mode], emb, src, dst, mode=mode, block=64)
        )
        s_q = np.asarray(
            score_pairs(preds[mode], qt, src, dst, mode=mode, block=64)
        )
        assert np.abs(s_f - s_q).max() < tol, mode


def test_serving_state_int4_and_daemon_fmt(setup):
    from llp_tpu.serve.server import BackgroundServer, ServingState

    emb, _, preds = setup
    state = ServingState(preds["mlp"], emb, mode="mlp", quantize="int4",
                         block=64)
    assert isinstance(state.h, QuantTable) and state.h.bits == 4
    v, i = state.topk([0, 5], 3)
    assert np.isfinite(v).all() and (np.asarray(i) >= 0).all()
    with BackgroundServer(state) as srv:
        health = json.load(
            urllib.request.urlopen(f"http://127.0.0.1:{srv.port}/healthz")
        )
        assert health["table_dtype"] == "int4"


@pytest.mark.parametrize("mode", ["mlp", "inner"])
def test_sharded_int4_matches_single_device(setup, mode):
    """Sharded int4: same codes-dot / dequant arithmetic as single-device
    (the 'inner' path also exercises query requantization at 4-bit levels)."""
    from jax.sharding import Mesh

    from llp_tpu.serve.server import ServingState, ShardedServingState

    emb, _, preds = setup
    devs = jax.devices()
    if len(devs) < 2:
        pytest.skip("needs a multi-device mesh")
    mesh = Mesh(np.array(devs), ("data",))
    single = ServingState(preds[mode], emb, mode=mode, quantize="int4",
                          block=32)
    shard = ShardedServingState(preds[mode], emb, mesh, mode=mode,
                                quantize="int4", block=32)
    assert isinstance(shard.h, QuantTable) and shard.h.bits == 4
    v1, i1 = single.topk(list(range(7)), 5)
    v2, i2 = shard.topk(list(range(7)), 5)
    np.testing.assert_allclose(v1, v2, atol=1e-5)
    np.testing.assert_array_equal(i1, i2)


def test_int8_dot_scores_refuses_large_int4_unpack(setup4, monkeypatch):
    """ADVICE r4 (low): int8_dot_scores on an int4 table unpacks the WHOLE
    table to an (N, H) int8 transient — at the 10M-100M scales int4 exists
    for that is the exact full-table-copy class the blocked path eliminates.
    Large int4 tables must be refused with a pointer to the blocked path."""
    from llp_tpu.serve import quant

    emb, qt4, preds = setup4
    # Small table (under the cap): still works.
    s = int8_dot_scores(qt4, jnp.asarray([0, 1], jnp.int32))
    assert s.shape[1] >= emb.shape[0]
    # Shrink the cap below this table's unpacked size: refused.
    monkeypatch.setattr(quant, "_INT4_UNPACK_MAX_BYTES", 64)
    with pytest.raises(ValueError, match="blocked"):
        int8_dot_scores(qt4, jnp.asarray([0, 1], jnp.int32))
