"""One-shot TPU measurement: teacher epoch throughput fp32 vs bf16.

Single long-lived process (axon relay protocol: one client at a time).
Writes progress lines to the path given as argv[1] (unbuffered).
"""

import sys
import time

import numpy as np

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/bench_dtype.log"
log_f = open(OUT, "a", buffering=1)


def log(msg):
    log_f.write(f"[{time.strftime('%H:%M:%S')}] {msg}\n")


log("importing jax...")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

log(f"backend={jax.default_backend()} devices={jax.devices()}")

import os as _os; sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root
from bench import BATCH, DIM, HIDDEN, N_NODES, build_problem  # noqa: E402
from llp_tpu.core import build_graph  # noqa: E402
from llp_tpu.ops.pallas.segsum_kernel import prepare_segsum  # noqa: E402
from llp_tpu.train.teacher import (  # noqa: E402
    init_teacher_params,
    make_teacher_epoch_fn,
)

ei, x = build_problem()
graph = build_graph(ei, N_NODES)
e = ei.shape[1]
pos_edges = jnp.asarray(ei.T.astype(np.int32))
neg_keys = jnp.zeros((1,), jnp.int32)
xd = jnp.asarray(x)
log(f"graph built: N={N_NODES} E={e}")
prepare_segsum(graph)
log("segsum layouts ready")


def consume(params, loss):
    return float(loss) + float(params["encoder"]["convs"][0]["lin_l"]["w"][0, 0])


def run(dtype, epochs=10):
    epoch_fn, tx = make_teacher_epoch_fn(
        encoder="sage", predictor_mode="mlp", dropout=0.0,
        num_nodes=N_NODES, num_pos_edges=e, link_batch_size=BATCH,
        neg_mode="uniform", lr=0.005, spmm_impl="segsum", compute_dtype=dtype,
    )
    params = init_teacher_params(
        jax.random.PRNGKey(0), encoder="sage", in_channels=DIM,
        hidden_channels=HIDDEN, num_layers=2, predictor_mode="mlp",
    )
    opt_state = tx.init(params)
    # warmup/compile (first device op may wait on the relay grant)
    t0 = time.perf_counter()
    for i in range(2):
        params, opt_state, loss = epoch_fn(
            params, opt_state, jax.random.PRNGKey(1 + i), graph, xd,
            pos_edges, neg_keys,
        )
    consume(params, loss)
    log(f"{dtype}: warmup+compile {time.perf_counter() - t0:.1f}s")
    t0 = time.perf_counter()
    for i in range(epochs):
        params, opt_state, loss = epoch_fn(
            params, opt_state, jax.random.PRNGKey(10 + i), graph, xd,
            pos_edges, neg_keys,
        )
    final = consume(params, loss)
    dt = time.perf_counter() - t0
    eps = 2 * e * epochs / dt
    log(f"{dtype}: {dt / epochs * 1e3:.2f} ms/epoch, {eps / 1e6:.2f}M edges/s, "
        f"final_loss+w={final:.4f}")
    return eps


f32 = run("float32")
bf16 = run("bfloat16")
log(f"RESULT fp32={f32 / 1e6:.2f}M bf16={bf16 / 1e6:.2f}M speedup={bf16 / f32:.2f}x")
log("DONE")
