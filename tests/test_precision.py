"""Mixed precision (bf16 compute, fp32 master params) — utils/precision.py.

The reference trains fp32 on CUDA; the TPU-native step optionally runs the
forward/backward in bfloat16 (MXU 2x rate, half HBM traffic) while keeping
master params, Adam state, losses, and batch-norm buffers fp32.  These tests
pin: cast semantics, bf16-vs-fp32 agreement of the hot ops within bf16
tolerance, fp32 gradient dtypes, and that a bf16 teacher/student epoch still
optimizes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llp_tpu.core import build_graph
from llp_tpu.data.synthetic import community_features, sbm_graph
from llp_tpu.ops.spmm import spmm
from llp_tpu.sample.negative import edge_hash_keys
from llp_tpu.train.student import init_student_params, make_student_epoch_fn
from llp_tpu.train.teacher import init_teacher_params, make_teacher_epoch_fn
from llp_tpu.utils.precision import cast_params, resolve_dtype


def _problem(n=200, k=4, deg=6.0, d=32, seed=5):
    ei, comm = sbm_graph(n, k, deg, seed=seed)
    x = jnp.asarray(community_features(comm, d, kind="gauss", seed=seed))
    g = build_graph(ei, n)
    pos = jnp.asarray(ei.T.astype(np.int32))
    keys = jnp.asarray(edge_hash_keys(ei, n))
    return g, x, pos, keys


def test_resolve_dtype():
    assert resolve_dtype("bfloat16") == jnp.bfloat16
    assert resolve_dtype("bf16") == jnp.bfloat16
    assert resolve_dtype("float32") == jnp.float32
    assert resolve_dtype(None) == jnp.float32
    with pytest.raises(ValueError):
        resolve_dtype("float64")


def test_cast_params_skips_norm_state_and_ints():
    tree = {
        "w": jnp.ones((2, 2), jnp.float32),
        "idx": jnp.ones((3,), jnp.int32),
        "norm_state": [{"mean": jnp.zeros((4,), jnp.float32)}],
    }
    out = cast_params(tree, jnp.bfloat16)
    assert out["w"].dtype == jnp.bfloat16
    assert out["idx"].dtype == jnp.int32
    assert out["norm_state"][0]["mean"].dtype == jnp.float32
    # fp32 target is the identity (no tree rebuild).
    assert cast_params(tree, jnp.float32) is tree


@pytest.mark.parametrize("reduce", ["sum", "mean"])
def test_spmm_bf16_close_to_fp32(reduce):
    g, x, _, _ = _problem()
    ref = np.asarray(spmm(g, x, reduce))
    out = spmm(g, x.astype(jnp.bfloat16), reduce)
    assert out.dtype == jnp.bfloat16
    # fp32 accumulation: error is input-rounding-level, not degree-scaled.
    np.testing.assert_allclose(
        np.asarray(out, np.float32), ref, rtol=2e-2, atol=2e-2
    )


def test_spmm_bf16_grad_dtype_and_value():
    g, x, _, _ = _problem()

    def f(x_):
        return jnp.sum(spmm(g, x_, "mean") ** 2)

    gx16 = jax.grad(f)(x.astype(jnp.bfloat16))
    assert gx16.dtype == jnp.bfloat16
    gx32 = jax.grad(f)(x)
    np.testing.assert_allclose(
        np.asarray(gx16, np.float32), np.asarray(gx32), rtol=5e-2, atol=5e-2
    )


def test_segsum_bf16_matches_fp32(rng):
    from llp_tpu.ops.pallas.segsum_kernel import (
        build_blocked_layout,
        segment_sum_blocked,
    )

    n, e, d = 300, 2000, 64
    seg = np.sort(rng.integers(0, n, e)).astype(np.int64)
    send = rng.integers(0, n, e).astype(np.int64)
    lay = build_blocked_layout(seg, send, n)
    x = rng.normal(size=(n, d)).astype(np.float32)
    ref = np.asarray(segment_sum_blocked(jnp.asarray(x), lay, n))
    out = segment_sum_blocked(jnp.asarray(x, jnp.bfloat16), lay, n)
    assert out.dtype == jnp.float32  # accumulator dtype
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-2, atol=2e-1)


def test_teacher_epoch_bf16_trains_and_keeps_fp32_masters():
    g, x, pos, keys = _problem()
    epoch_fn, tx = make_teacher_epoch_fn(
        encoder="sage", predictor_mode="mlp", dropout=0.0,
        num_nodes=g.num_nodes, num_pos_edges=int(pos.shape[0]),
        link_batch_size=256, neg_mode="dense", lr=0.01,
        compute_dtype="bfloat16",
    )
    params = init_teacher_params(
        jax.random.PRNGKey(0), encoder="sage", in_channels=int(x.shape[1]),
        hidden_channels=32, num_layers=2, predictor_mode="mlp",
    )
    opt_state = tx.init(params)
    losses = []
    for ep in range(8):
        params, opt_state, loss = epoch_fn(
            params, opt_state, jax.random.PRNGKey(ep), g, x, pos, keys
        )
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0] * 0.8
    for leaf in jax.tree_util.tree_leaves(params):
        assert leaf.dtype == jnp.float32  # masters never leave fp32


def test_student_epoch_bf16_trains():
    g, x, pos, keys = _problem()
    t_h = jnp.asarray(
        np.random.default_rng(0).normal(size=(g.num_nodes, 32)), jnp.float32
    )
    teacher = init_teacher_params(
        jax.random.PRNGKey(9), encoder="sage", in_channels=int(x.shape[1]),
        hidden_channels=32, num_layers=2, predictor_mode="mlp",
    )
    epoch_fn, tx = make_student_epoch_fn(
        num_nodes=g.num_nodes, num_pos_edges=int(pos.shape[0]),
        link_batch_size=256, node_batch_size=64, predictor_mode="mlp",
        dropout=0.0, lr=0.01, true_label=0.5, kd_rm=0.1, kd_lm=0.1,
        llp_d=1.0, llp_r=1.0, margin=0.1, rw_step=2, hops=2, ns_rate=1,
        neg_mode="dense", compute_dtype="bfloat16",
    )
    params = init_student_params(
        jax.random.PRNGKey(2), in_channels=int(x.shape[1]),
        hidden_channels=32, num_layers=2, predictor_mode="mlp",
    )
    opt_state = tx.init(params)
    losses = []
    for ep in range(6):
        params, opt_state, loss = epoch_fn(
            params, opt_state, jax.random.PRNGKey(ep), g, x, t_h,
            teacher["predictor"], pos, keys,
        )
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]
