"""Fused SDDMM edge-scoring kernel vs the XLA expression (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llp_tpu.models.predictor import apply_link_predictor, init_link_predictor
from llp_tpu.ops.edge_score import hadamard_mlp_score
from llp_tpu.ops.pallas.sddmm_kernel import fused_mlp_score, fused_supported


@pytest.fixture
def head():
    return init_link_predictor(jax.random.PRNGKey(0), "mlp", 256, 256, 1, 2)


def _pairs(rng, b, d=256):
    hi = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32))
    hj = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32))
    return hi, hj


def test_fused_matches_xla(head, rng):
    hi, hj = _pairs(rng, 2048)
    ref = np.asarray(hadamard_mlp_score(head["lins"], hi, hj))
    out = np.asarray(fused_mlp_score(head["lins"], hi, hj))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def test_fused_partial_tile(head, rng):
    hi, hj = _pairs(rng, 700)  # not a TP multiple — padded internally
    ref = np.asarray(hadamard_mlp_score(head["lins"], hi, hj))
    out = np.asarray(fused_mlp_score(head["lins"], hi, hj))
    assert out.shape == (700,)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def test_fused_supported_gates():
    lins_ok = init_link_predictor(jax.random.PRNGKey(1), "mlp", 256, 256, 1, 2)["lins"]
    hi = jnp.ones((8, 256))
    assert fused_supported(lins_ok, hi)
    lins3 = init_link_predictor(jax.random.PRNGKey(1), "mlp", 256, 256, 1, 3)["lins"]
    assert not fused_supported(lins3, hi)  # depth != 2
    lins_odd = init_link_predictor(jax.random.PRNGKey(1), "mlp", 200, 256, 1, 2)["lins"]
    assert not fused_supported(lins_odd, jnp.ones((8, 200)))  # D not lane-aligned
    # batched-context (3-D) input routes to XLA
    assert not fused_supported(lins_ok, jnp.ones((4, 7, 256)))


def test_fused_grad_falls_back_to_xla(head, rng):
    hi, hj = _pairs(rng, 512)

    def f_fused(hi_):
        return jnp.sum(fused_mlp_score(head["lins"], hi_, hj))

    def f_ref(hi_):
        return jnp.sum(hadamard_mlp_score(head["lins"], hi_, hj))

    np.testing.assert_allclose(
        np.asarray(jax.grad(f_fused)(hi)), np.asarray(jax.grad(f_ref)(hi)),
        rtol=1e-4, atol=1e-5,
    )


def test_predictor_fused_flag_routes(head, rng):
    hi, hj = _pairs(rng, 300)
    a = np.asarray(
        apply_link_predictor(head, hi, hj, mode="mlp", train=False, fused=True)
    )
    b = np.asarray(apply_link_predictor(head, hi, hj, mode="mlp", train=False))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)
