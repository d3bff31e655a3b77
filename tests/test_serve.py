"""Serving engine: blocked encode/score parity + brute-force top-K checks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llp_tpu.models.mlp import apply_mlp, init_mlp
from llp_tpu.models.predictor import apply_link_predictor, init_link_predictor
from llp_tpu.serve import (
    encode_nodes,
    load_serving_artifacts,
    score_pairs,
    top_k_partners,
)


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    n, d, h = 203, 12, 16  # n deliberately not a multiple of any block
    x = jnp.asarray(rng.normal(size=(n, d)), jnp.float32)
    enc = init_mlp(jax.random.PRNGKey(0), 2, d, h, h)
    emb = apply_mlp(enc, x, train=False)
    preds = {
        "mlp": init_link_predictor(jax.random.PRNGKey(1), "mlp", h, h, 1, 2),
        "inner": init_link_predictor(jax.random.PRNGKey(2), "inner", h, h, 1, 2),
    }
    return x, enc, emb, preds


def test_encode_nodes_matches_full_forward(setup):
    x, enc, emb, _ = setup
    out = encode_nodes(enc, x, block=64)
    np.testing.assert_allclose(np.asarray(out), np.asarray(emb), atol=1e-5)


@pytest.mark.parametrize("mode", ["mlp", "inner"])
def test_score_pairs_matches_direct(setup, mode):
    x, enc, emb, preds = setup
    rng = np.random.default_rng(3)
    src = rng.integers(0, x.shape[0], size=150).astype(np.int32)
    dst = rng.integers(0, x.shape[0], size=150).astype(np.int32)
    got = score_pairs(preds[mode], emb, src, dst, mode=mode, block=64)
    want = apply_link_predictor(
        preds[mode], jnp.take(emb, jnp.asarray(src), axis=0),
        jnp.take(emb, jnp.asarray(dst), axis=0), mode=mode, train=False,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


@pytest.mark.parametrize("mode", ["mlp", "inner"])
def test_top_k_partners_matches_bruteforce(setup, mode):
    x, enc, emb, preds = setup
    n = x.shape[0]
    qi = np.array([0, 7, 100, n - 1], np.int32)
    k = 5
    vals, ids = top_k_partners(
        preds[mode], emb, qi, k=k, mode=mode, block=64, exclude_self=True
    )
    # host brute force
    full = np.asarray(
        apply_link_predictor(
            preds[mode], jnp.take(emb, jnp.asarray(qi), axis=0)[:, None, :],
            emb[None, :, :], mode=mode, train=False,
        )
    )
    for r, q in enumerate(qi):
        scores = full[r].copy()
        scores[q] = -np.inf
        order = np.argsort(-scores)[:k]
        np.testing.assert_allclose(np.asarray(vals)[r], scores[order], atol=1e-5)
        # ids must score identically (ties may reorder ids)
        np.testing.assert_allclose(
            scores[np.asarray(ids)[r]], scores[order], atol=1e-5
        )
        assert q not in np.asarray(ids)[r]


def test_top_k_without_self_exclusion(setup):
    x, enc, emb, preds = setup
    qi = np.array([3], np.int32)
    vals, ids = top_k_partners(
        preds["inner"], emb, qi, k=3, mode="inner", block=50, exclude_self=False
    )
    full = np.asarray(
        apply_link_predictor(
            preds["inner"], emb[3][None, None, :], emb[None, :, :],
            mode="inner", train=False,
        )
    )[0]
    np.testing.assert_allclose(np.asarray(vals)[0], np.sort(full)[::-1][:3], atol=1e-5)


def test_load_serving_artifacts_roundtrip(tmp_path, setup):
    from llp_tpu.utils.checkpoint import save_checkpoint

    x, enc, emb, preds = setup
    path = str(tmp_path / "ckpt")
    save_checkpoint(
        path, {"params": {"encoder": enc, "predictor": preds["mlp"]}},
        meta={"encoder": "mlp", "hidden_channels": 16, "predictor": "mlp"},
    )
    params, feats, meta = load_serving_artifacts(path)
    assert meta["hidden_channels"] == 16 and feats is None
    out = encode_nodes(params["encoder"], x, block=32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(emb), atol=1e-5)


def test_serve_cli_end_to_end(tmp_path):
    """Train a tiny student (which exports its best-val checkpoint), then
    answer top-K and pair queries through the serve CLI."""
    from llp_tpu.cli.serve import main as serve_main
    from llp_tpu.cli.train_student import main as student_main
    from llp_tpu.cli.train_teacher import main as teacher_main

    common = [
        "--datasets=synthetic:sbm:150:3:6.0:9",
        f"--dataset_dir={tmp_path}",
        f"--save_dir={tmp_path}/saved",
        f"--results_dir={tmp_path}/results",
        "--hidden_channels=16",
        "--epochs=2",
        "--eval_steps=1",
        "--patience=50",
        "--device=cpu",
        "--spmm_impl=xla",
        "--log_steps=100",
    ]
    teacher_main(common + ["--runs=1", "--batch_size=1024"])
    student_main(common + ["--runs=1", "--link_batch_size=1024"])
    ckpt = f"{tmp_path}/saved/synthetic:sbm:150:3:6.0:9-student_transductive"
    import os

    assert os.path.exists(ckpt + ".npz")
    out = serve_main([
        f"--checkpoint={ckpt}",
        "--datasets=synthetic:sbm:150:3:6.0:9",
        f"--dataset_dir={tmp_path}",
        "--device=cpu",
        "--topk=5",
        "--queries=0,7",
        "--pairs=0:1,5:9",
        "--block=64",
    ])
    assert out["nodes"] == 150 and out["pairs_scored_per_s"] > 0

    # --approx + --compute_dtype plumb through (ApproxTopK exact on CPU)
    out_a = serve_main([
        f"--checkpoint={ckpt}",
        "--datasets=synthetic:sbm:150:3:6.0:9",
        f"--dataset_dir={tmp_path}",
        "--device=cpu",
        "--topk=5",
        "--queries=0,7",
        "--block=64",
        "--approx",
        "--compute_dtype=bfloat16",
    ])
    assert out_a["nodes"] == 150

    # out-of-range queries error instead of silently clamping
    import pytest

    with pytest.raises(SystemExit, match="out of range"):
        serve_main([
            f"--checkpoint={ckpt}",
            "--datasets=synthetic:sbm:150:3:6.0:9",
            f"--dataset_dir={tmp_path}",
            "--device=cpu",
            "--topk=3",
            "--queries=99999",
        ])

    # Teacher checkpoint: saved-features serving AND inductive re-encode.
    tckpt = f"{tmp_path}/saved/synthetic:sbm:150:3:6.0:9-sage_transductive"
    for extra in ([], ["--reencode"]):
        tout = serve_main([
            f"--checkpoint={tckpt}",
            "--datasets=synthetic:sbm:150:3:6.0:9",
            f"--dataset_dir={tmp_path}",
            "--device=cpu",
            "--topk=3",
            "--queries=1",
            "--block=64",
        ] + extra)
        assert tout["nodes"] == 150


def test_encode_graph_nodes_matches_encoder(setup):
    from llp_tpu.core import build_graph
    from llp_tpu.data.synthetic import sbm_graph
    from llp_tpu.models.encoder import apply_encoder, init_encoder
    from llp_tpu.serve.engine import encode_graph_nodes

    ei, _ = sbm_graph(120, 3, 5.0, seed=4)
    g = build_graph(ei, 120)
    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.normal(size=(120, 10)), jnp.float32)
    params = init_encoder(jax.random.PRNGKey(5), "sage", 10, 16, 16, 2)
    got = encode_graph_nodes(params, g, x, encoder="sage", spmm_impl="segsum")
    want = apply_encoder("sage", params, g, x, train=False, impl="xla")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_top_k_partners_bf16_compute(setup):
    x, enc, emb, preds = setup
    qi = np.array([2, 99], np.int32)
    k = 5
    v32, i32 = top_k_partners(preds["inner"], emb, qi, k=k, mode="inner", block=64)
    v16, i16 = top_k_partners(
        preds["inner"], emb, qi, k=k, mode="inner", block=64,
        compute_dtype=jnp.bfloat16,
    )
    # bf16 scoring may swap near-ties, but every returned candidate's true
    # (fp32) score must sit at or above the true k-th best minus bf16 noise.
    full = np.asarray(
        apply_link_predictor(
            preds["inner"], jnp.take(emb, jnp.asarray(qi), axis=0)[:, None, :],
            emb[None, :, :], mode="inner", train=False,
        )
    )
    for r, q in enumerate(qi):
        scores = full[r].copy()
        scores[q] = -np.inf
        kth = np.sort(scores)[::-1][k - 1]
        assert (scores[np.asarray(i16)[r]] >= kth - 0.02).all()
    np.testing.assert_allclose(np.asarray(v16), np.asarray(v32), atol=0.02)


@pytest.mark.parametrize("mode", ["inner", "mlp"])
def test_top_k_partners_approx_matches_exact_on_cpu(setup, mode):
    """ApproxTopK lowers to exact top-k on the CPU backend, so the approx
    retrieval paths (single-pass inner + per-block merge) must reproduce the
    exact path bit-for-bit here."""
    x, enc, emb, preds = setup
    n = x.shape[0]
    qi = np.array([0, 7, 100, n - 1], np.int32)
    k = 5
    ve, ie = top_k_partners(preds[mode], emb, qi, k=k, mode=mode, block=64)
    va, ia = top_k_partners(
        preds[mode], emb, qi, k=k, mode=mode, block=64, approx=True
    )
    np.testing.assert_allclose(np.asarray(va), np.asarray(ve), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(ia), np.asarray(ie))


def test_top_k_partners_approx_blocked_inner_fallback(setup, monkeypatch):
    """When the (Q, N) score matrix exceeds the single-pass budget, approx
    inner retrieval falls back to the blocked per-block-approx scan — force
    that with a zero budget and check it still matches exact."""
    import llp_tpu.serve.engine as engine

    x, enc, emb, preds = setup
    qi = np.array([3, 44, 150], np.int32)
    monkeypatch.setattr(engine, "_SINGLE_PASS_SCORE_BYTES", 0)
    va, ia = top_k_partners(
        preds["inner"], emb, qi, k=4, mode="inner", block=64, approx=True
    )
    ve, ie = top_k_partners(preds["inner"], emb, qi, k=4, mode="inner", block=64)
    np.testing.assert_allclose(np.asarray(va), np.asarray(ve), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(ia), np.asarray(ie))


def test_top_k_partners_approx_bf16_compose(setup):
    x, enc, emb, preds = setup
    qi = np.array([5, 9], np.int32)
    k = 4
    va, ia = top_k_partners(
        preds["inner"], emb, qi, k=k, mode="inner", block=64, approx=True,
        compute_dtype=jnp.bfloat16,
    )
    full = np.asarray(
        apply_link_predictor(
            preds["inner"], jnp.take(emb, jnp.asarray(qi), axis=0)[:, None, :],
            emb[None, :, :], mode="inner", train=False,
        )
    )
    for r, q in enumerate(qi):
        scores = full[r].copy()
        scores[q] = -np.inf
        kth = np.sort(scores)[::-1][k - 1]
        assert (scores[np.asarray(ia)[r]] >= kth - 0.02).all()


def test_top_k_partners_approx_k_exceeds_block(setup):
    """approx_max_k needs k <= its reduction width; k > block must fall back
    to the exact merge instead of crashing (review finding)."""
    x, enc, emb, preds = setup
    qi = np.array([1, 2], np.int32)
    ve, ie = top_k_partners(preds["mlp"], emb, qi, k=12, mode="mlp", block=8)
    va, ia = top_k_partners(
        preds["mlp"], emb, qi, k=12, mode="mlp", block=8, approx=True
    )
    np.testing.assert_allclose(np.asarray(va), np.asarray(ve), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(ia), np.asarray(ie))


def test_encode_nodes_batch_norm_checkpoint(setup):
    """Review finding: norm_type='batch' makes apply_mlp return
    (h, new_norm_state); serving encode must unpack it, matching eval-mode
    batch-norm semantics (running buffers used, not updated)."""
    from llp_tpu.models.mlp import init_mlp as _init

    x, _, _, _ = setup
    enc = _init(jax.random.PRNGKey(4), 2, x.shape[1], 16, 16, norm_type="batch")
    h = encode_nodes(enc, x, norm_type="batch", block=64)
    ref = apply_mlp(enc, x, train=False, norm_type="batch")[0]
    np.testing.assert_allclose(np.asarray(h), np.asarray(ref), atol=1e-5)


def test_auto_block_policy(setup, monkeypatch):
    """Guard the measured auto-block sizes: 'mlp' must stay at 8192 (XLA's
    reduce-epilogue fusion cliffs at b16384 — 51.7 -> 191 ms at collab
    scale, BASELINE.md round 3), 'inner' exact at 16384, 'inner'+approx at
    the 256MB budget.  A well-meaning 'simplification' of these constants
    regresses retrieval 2-4x."""
    import llp_tpu.serve.engine as engine

    x, enc, emb, preds = setup
    captured = {}
    real = engine._topk_blocked

    def spy(params, h, qi, **kw):
        captured.update(kw)
        return real(params, h, qi, **kw)

    monkeypatch.setattr(engine, "_topk_blocked", spy)
    n = emb.shape[0]
    qi = np.array([0, 1], np.int32)

    top_k_partners(preds["mlp"], emb, qi, k=3, mode="mlp")
    assert captured["block"] == min(8192, n)

    top_k_partners(preds["inner"], emb, qi, k=3, mode="inner")
    assert captured["block"] == min(16384, n)

    # approx inner at tiny N routes single-pass; force the blocked path.
    monkeypatch.setattr(engine, "_SINGLE_PASS_SCORE_BYTES", 0)
    top_k_partners(preds["inner"], emb, qi, k=3, mode="inner", approx=True)
    assert captured["block"] == min(
        max(4096, engine._BLOCKED_SCORE_BYTES // (4 * len(qi))), n
    )


def test_auto_topk_block_stays_below_mlp_cliff():
    """Round-3 measurement: the 'mlp' retrieval path cliffs at block=16384
    (51.7 -> 191 ms at Q=256/N=235k).  The auto choice must stay strictly
    below the cliff for every gated shape, refactor-proof on CPU; the TPU
    bench serving floor is the hardware backstop (VERDICT r3, weak #6)."""
    from llp_tpu.serve.engine import (
        MLP_BLOCK_CLIFF,
        MLP_TOPK_BLOCK,
        auto_topk_block,
    )

    assert MLP_TOPK_BLOCK < MLP_BLOCK_CLIFF
    for q in (1, 16, 256, 4096):
        assert auto_topk_block("mlp", False, q) < MLP_BLOCK_CLIFF
        assert auto_topk_block("mlp", True, q) < MLP_BLOCK_CLIFF
    # 'inner' invariants: exact keeps short tiles; approx grows as queries
    # shrink but stays within the 256MB score-tile budget.
    assert auto_topk_block("inner", False, 256) == 16384
    for q in (1, 16, 256, 4096):
        b = auto_topk_block("inner", True, q)
        assert b >= 4096 and b * max(1, q) * 4 <= (256 << 20) + 4096 * q * 4


@pytest.mark.parametrize("mode", ["mlp", "inner"])
@pytest.mark.parametrize("approx", [False, True])
def test_top_k_partners_tiny_table_default_block(setup, mode, approx):
    """ADVICE r4 (medium): with the no-padded-copy rewrite, the blocked
    path slices the UNPADDED table, so a block clamped to max(8, n)=8 on a
    5-row table failed at trace time.  Tables smaller than any block must
    retrieve in one exact block under the DEFAULT (auto) block size."""
    x, enc, emb, preds = setup
    tiny = emb[:5]
    qi = np.array([0, 3], np.int32)
    vals, ids = top_k_partners(
        preds[mode], tiny, qi, k=2, mode=mode, approx=approx,
        exclude_self=True,
    )
    full = np.asarray(
        apply_link_predictor(
            preds[mode], jnp.take(tiny, jnp.asarray(qi), axis=0)[:, None, :],
            tiny[None, :, :], mode=mode, train=False,
        )
    )
    for r, q in enumerate(qi):
        scores = full[r].copy()
        scores[q] = -np.inf
        np.testing.assert_allclose(
            np.asarray(vals)[r], np.sort(scores)[::-1][:2], atol=1e-5
        )
        assert q not in np.asarray(ids)[r]
