"""Fused VMEM 'mlp'-retrieval kernel (llp_tpu/ops/pallas/mlp_topk_kernel.py).

Gates: the kernel's raw logits match the XLA Hadamard→MLP expression to
float rounding (dense, int8-dequant, multi-layer, bf16-tolerance); routed
retrieval (top_k_partners / sharded) reproduces the unfused path's scores
and ids exactly in fp32 (sigmoid is monotone, so deferring it cannot change
ranks); unsupported head shapes fall back to the XLA expression silently.

On CPU the kernel runs in Pallas interpret mode (bit-faithful to the TPU
program structure); ApproxTopK is exact on CPU so approx-mode tests assert
equality.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llp_tpu.models.predictor import apply_link_predictor, init_link_predictor
from llp_tpu.ops.pallas.mlp_topk_kernel import (
    fused_mlp_supported,
    mlp_block_logits,
)
from llp_tpu.serve.engine import top_k_partners
from llp_tpu.serve.quant import quantize_table


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(3)
    n, h = 300, 128  # n not a tile multiple; h lane-aligned
    emb = jnp.asarray(rng.normal(size=(n, h)).astype(np.float32))
    params = init_link_predictor(jax.random.PRNGKey(1), "mlp", h, 256, 1, 2)
    return emb, params


def _ref_logits(params, q_h, cand):
    probs = apply_link_predictor(
        params, q_h[:, None, :], cand[None, :, :], mode="mlp", train=False
    )
    p = np.asarray(probs, np.float64)
    return np.log(p / (1.0 - p))


def test_kernel_matches_xla_dense(setup):
    emb, params = setup
    q_h = emb[:13]
    logits = np.asarray(mlp_block_logits(params["lins"], q_h, emb))
    assert logits.shape == (13, emb.shape[0])
    np.testing.assert_allclose(
        logits, _ref_logits(params, q_h, emb), rtol=2e-5, atol=2e-5
    )


def test_kernel_matches_xla_three_layer(setup):
    emb, _ = setup
    p3 = init_link_predictor(jax.random.PRNGKey(7), "mlp", 128, 128, 1, 3)
    q_h = emb[:5]
    logits = np.asarray(mlp_block_logits(p3["lins"], q_h, emb))
    np.testing.assert_allclose(
        logits, _ref_logits(p3, q_h, emb), rtol=2e-5, atol=2e-5
    )


def test_kernel_int8_dequant_matches_dense_dequant(setup):
    emb, params = setup
    qt = quantize_table(emb)
    q_h = emb[:9]
    fused = np.asarray(
        mlp_block_logits(params["lins"], q_h, qt.q, scales=qt.scale)
    )
    deq = jnp.asarray(
        np.asarray(qt.q, np.float32) * np.asarray(qt.scale)[:, None]
    )
    np.testing.assert_allclose(
        fused, _ref_logits(params, q_h, deq), rtol=2e-5, atol=2e-5
    )


def test_kernel_bf16_within_tolerance(setup):
    emb, params = setup
    q_h = emb[:8]
    fused = np.asarray(
        mlp_block_logits(
            params["lins"], q_h.astype(jnp.bfloat16),
            emb.astype(jnp.bfloat16),
        )
    )
    ref = _ref_logits(params, q_h, emb)
    # bf16 operands, fp32 accumulation: ~8-bit mantissa rounding per layer.
    assert np.abs(fused - ref).max() < 0.05 * max(1.0, np.abs(ref).max())


def test_supported_gating():
    p_ok = init_link_predictor(jax.random.PRNGKey(0), "mlp", 128, 256, 1, 2)
    assert fused_mlp_supported(p_ok["lins"], 128)
    # unaligned input width
    p_bad = init_link_predictor(jax.random.PRNGKey(0), "mlp", 24, 256, 1, 2)
    assert not fused_mlp_supported(p_bad["lins"], 24)
    # unaligned hidden width
    p_h = init_link_predictor(jax.random.PRNGKey(0), "mlp", 128, 96, 1, 2)
    assert not fused_mlp_supported(p_h["lins"], 128)
    # single-layer head: XLA matvec is fine, kernel declines
    p_1 = init_link_predictor(jax.random.PRNGKey(0), "mlp", 128, 128, 1, 1)
    assert not fused_mlp_supported(p_1["lins"], 128)


@pytest.mark.parametrize("approx", [False, True])
def test_topk_fused_matches_unfused(setup, approx):
    emb, params = setup
    qi = np.asarray([0, 17, 42, 299, 3], np.int32)
    v0, i0 = top_k_partners(
        params, emb, qi, k=7, mode="mlp", approx=approx, mlp_fused=False
    )
    v1, i1 = top_k_partners(
        params, emb, qi, k=7, mode="mlp", approx=approx, mlp_fused=True
    )
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    np.testing.assert_allclose(np.asarray(v0), np.asarray(v1), atol=3e-6)


def test_topk_fused_quantized_matches_unfused_quantized(setup):
    emb, params = setup
    qt = quantize_table(emb)
    qi = np.asarray([5, 0, 123], np.int32)
    v0, i0 = top_k_partners(
        params, qt, qi, k=5, mode="mlp", mlp_fused=False
    )
    v1, i1 = top_k_partners(
        params, qt, qi, k=5, mode="mlp", mlp_fused=True
    )
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    np.testing.assert_allclose(np.asarray(v0), np.asarray(v1), atol=3e-6)


def test_topk_fused_unsupported_dims_fall_back():
    rng = np.random.default_rng(0)
    emb = jnp.asarray(rng.normal(size=(100, 24)).astype(np.float32))
    params = init_link_predictor(jax.random.PRNGKey(1), "mlp", 24, 24, 1, 2)
    qi = np.asarray([0, 1], np.int32)
    v0, i0 = top_k_partners(params, emb, qi, k=3, mode="mlp",
                            mlp_fused=False)
    v1, i1 = top_k_partners(params, emb, qi, k=3, mode="mlp", mlp_fused=True)
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    np.testing.assert_allclose(np.asarray(v0), np.asarray(v1), atol=1e-7)


def test_sharded_fused_matches_single_device(setup):
    from jax.sharding import Mesh, NamedSharding
    from jax.sharding import PartitionSpec as P

    from llp_tpu.parallel.eval import make_sharded_topk_partners

    emb, params = setup
    devs = jax.devices()
    if len(devs) < 2:
        pytest.skip("needs a multi-device mesh")
    mesh = Mesh(np.array(devs), ("data",))
    n = emb.shape[0]
    pad = (-n) % len(devs)
    hp = jnp.concatenate([emb, jnp.zeros((pad, emb.shape[1]), emb.dtype)])
    hp = jax.device_put(hp, NamedSharding(mesh, P("data", None)))
    qi = jnp.asarray([0, 7, 250], jnp.int32)
    q_h = emb[np.asarray(qi)]
    fn = make_sharded_topk_partners(
        mesh, k=6, mode="mlp", num_nodes=n, mlp_fused=True
    )
    vs, is_ = fn(params, hp, q_h, qi)
    v0, i0 = top_k_partners(params, emb, qi, k=6, mode="mlp",
                            mlp_fused=False)
    np.testing.assert_array_equal(np.asarray(is_), np.asarray(i0))
    np.testing.assert_allclose(np.asarray(vs), np.asarray(v0), atol=3e-6)
