"""Structural gate: every encoder's epoch program rides the segsum kernel.

VERDICT r4 weak #2: the collab-scale encoder matrix (GCN / sage_updated at
SAGE speed, 181 ms/step) was a one-shot measurement — a routing regression
in the GCN factored sym-norm path or the linear-then-aggregate conv (e.g.
a silent fall-through to the XLA scatter, 2.25x slower) would be invisible
until someone re-ran scripts/r4_encoders_trace.py on hardware.  This gate
asserts the ROUTING on CPU: with prepare_segsum done, the traced teacher
epoch program for each encoder must contain the Pallas segsum kernel
(`pallas_call` eqns in the jaxpr) and, for the per-batch aggregations, no
XLA scatter-add fallback.

Reference anchors: the SpMM these programs route is the reference's
torch_sparse.matmul hot call (src/sageconv_updated.py:86-89) inside the
teacher hot loop (src/train_teacher_gnn.py:21-73); encoder matrix
src/models.py:56-119.
"""

import jax
import numpy as np
import pytest

from llp_tpu.core import build_graph
from llp_tpu.data.synthetic import community_features, sbm_graph
from llp_tpu.ops.pallas.segsum_kernel import prepare_segsum, segsum_ready
from llp_tpu.train.teacher import init_teacher_params, make_teacher_epoch_fn


@pytest.fixture(scope="module")
def problem():
    ei, comm = sbm_graph(300, 4, 6.0, seed=5)
    x = community_features(comm, 24, kind="gauss", seed=5)
    g = build_graph(ei.astype(np.int64), 300)
    prepare_segsum(g)
    assert segsum_ready(g)
    return g, jax.numpy.asarray(x), ei


def _epoch_jaxpr(g, x, ei, *, encoder, conv):
    pos = jax.numpy.asarray(ei.T.astype(np.int32))
    epoch_fn, tx = make_teacher_epoch_fn(
        encoder=encoder, conv=conv, predictor_mode="mlp", dropout=0.0,
        num_nodes=g.num_nodes, num_pos_edges=int(pos.shape[0]),
        link_batch_size=4096, neg_mode="uniform", lr=0.01,
        spmm_impl="segsum",
    )
    params = init_teacher_params(
        jax.random.PRNGKey(0), encoder=encoder, in_channels=24,
        hidden_channels=16, num_layers=2, predictor_mode="mlp",
    )
    jaxpr = jax.make_jaxpr(
        lambda p_, s_: epoch_fn(
            p_, s_, jax.random.PRNGKey(1), g, x, pos,
            jax.numpy.zeros((1,), jax.numpy.int32),
        )
    )(params, tx.init(params))
    return str(jaxpr)


ENCODERS = [("sage", "sage"), ("sage", "sage_updated"), ("gcn", "sage")]


@pytest.mark.parametrize("encoder,conv", ENCODERS)
def test_epoch_program_contains_segsum_kernel(problem, encoder, conv):
    g, x, ei = problem
    text = _epoch_jaxpr(g, x, ei, encoder=encoder, conv=conv)
    # The windowed segsum kernel appears as pallas_call eqns (fwd AND bwd
    # direction inside the custom VJP).
    assert text.count("pallas_call") >= 2, (
        f"{encoder}/{conv}: epoch program does not route through the "
        f"Pallas segsum kernel"
    )
    # ...and the scan body (per-batch work) must not fall back to the XLA
    # scatter-add path.  segment_sum lowers to scatter-add; the only
    # legitimate scatter in the program is OUTSIDE the batch scan (e.g.
    # the one-shot hoisted layer-1 aggregation runs before it).
    scan_body = text.split(" scan[")[-1]
    assert "scatter-add" not in scan_body and "scatter_add" not in scan_body, (
        f"{encoder}/{conv}: per-batch aggregation fell back to XLA scatter"
    )


def test_gate_detects_xla_fallback(problem):
    """Sanity: the same trace WITHOUT prepared layouts (fresh graph object,
    impl='xla') contains no pallas_call — i.e. the assertion above really
    distinguishes the two paths."""
    g, x, ei = problem
    pos = jax.numpy.asarray(ei.T.astype(np.int32))
    epoch_fn, tx = make_teacher_epoch_fn(
        encoder="gcn", conv="sage", predictor_mode="mlp", dropout=0.0,
        num_nodes=g.num_nodes, num_pos_edges=int(pos.shape[0]),
        link_batch_size=4096, neg_mode="uniform", lr=0.01,
        spmm_impl="xla",
    )
    params = init_teacher_params(
        jax.random.PRNGKey(0), encoder="gcn", in_channels=24,
        hidden_channels=16, num_layers=2, predictor_mode="mlp",
    )
    jaxpr = jax.make_jaxpr(
        lambda p_, s_: epoch_fn(
            p_, s_, jax.random.PRNGKey(1), g, x, pos,
            jax.numpy.zeros((1,), jax.numpy.int32),
        )
    )(params, tx.init(params))
    assert "pallas_call" not in str(jaxpr)
