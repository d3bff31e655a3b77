"""Round-4 TPU batch 1: collab-scale GCN / sage_updated teacher timings
(VERDICT r3 item 3) + a jax.profiler trace of the warm teacher and student
epoch programs (item 6).

Axon protocol: ONE process, chained epoch-program timing (never single
dispatches), arrays as jit args, line-buffered log (argv[1]).
Trace lands in docs/traces/r4/ (parsed OFFLINE by
scripts/r4_parse_trace.py — keep this process TPU-only).
"""

import sys
import time

import numpy as np

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/r4_batch1.log"
log_f = open(OUT, "a", buffering=1)


def log(msg):
    log_f.write(f"[{time.strftime('%H:%M:%S')}] {msg}\n")


import os as _os; sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root

log("importing jax...")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from bench import COLD, build_problem  # noqa: E402
from llp_tpu.core import build_graph  # noqa: E402
from llp_tpu.models.predictor import init_link_predictor  # noqa: E402
from llp_tpu.ops.pallas.segsum_kernel import prepare_segsum  # noqa: E402
from llp_tpu.train.student import init_student_params, make_student_epoch_fn  # noqa: E402
from llp_tpu.train.teacher import init_teacher_params, make_teacher_epoch_fn  # noqa: E402

log(f"devices: {jax.devices()}")

spec = COLD
ei, x_np = build_problem(spec)
n, dim, hidden = spec["n"], spec["dim"], spec["hidden"]
e = ei.shape[1]
graph = build_graph(ei, n)
prepare_segsum(graph)
x = jnp.asarray(x_np)
pos_edges = jnp.asarray(ei.T.astype(np.int32))
neg_keys = jnp.zeros((1,), jnp.int32)
bl = spec["batch"]
steps = -(-e // bl)
log(f"collab standin: N={n} E={e} D={dim} H={hidden} L={spec['layers']} "
    f"steps/epoch={steps}")

# ---------------- teacher epoch timings: sage / sage_updated / gcn ----------
teacher_fns = {}
for label, encoder, conv in (
    ("sage", "sage", "sage"),
    ("sage_updated", "sage", "sage_updated"),
    ("gcn", "gcn", "sage"),
):
    epoch_fn, tx = make_teacher_epoch_fn(
        encoder=encoder, conv=conv, predictor_mode="mlp", dropout=0.5,
        num_nodes=n, num_pos_edges=e, link_batch_size=bl,
        neg_mode="uniform", lr=0.005, spmm_impl="segsum",
    )
    params = init_teacher_params(
        jax.random.PRNGKey(0), encoder=encoder, in_channels=dim,
        hidden_channels=hidden, num_layers=spec["layers"],
        predictor_mode="mlp",
    )
    opt = tx.init(params)
    t0 = time.perf_counter()
    params, opt, loss = epoch_fn(
        params, opt, jax.random.PRNGKey(1), graph, x, pos_edges, neg_keys
    )
    _ = float(loss)
    log(f"teacher[{label}] compile+run: {time.perf_counter() - t0:.1f} s "
        f"(loss {float(loss):.4f})")
    dts = []
    for i in (2, 3):
        t0 = time.perf_counter()
        params, opt, loss = epoch_fn(
            params, opt, jax.random.PRNGKey(i), graph, x, pos_edges, neg_keys
        )
        _ = float(loss)
        dts.append(time.perf_counter() - t0)
    dt = min(dts)
    log(f"teacher[{label}]: {dt:.3f} s/epoch = {dt / steps * 1e3:.1f} ms/step "
        f"({2 * e / dt / 1e6:.2f} M edges/s)  runs={['%.3f' % d for d in dts]}")
    teacher_fns[label] = (epoch_fn, params, opt)

# ---------------- student (bf16 minibatch) epoch, 1-epoch program ------------
bn = max(1, int(n / (e / min(bl, e))))
s_fn, stx = make_student_epoch_fn(
    num_nodes=n, num_pos_edges=e, link_batch_size=bl, node_batch_size=bn,
    minibatch=True, compute_dtype="bfloat16", neg_mode="uniform",
)
sparams = init_student_params(
    jax.random.PRNGKey(2), in_channels=dim, hidden_channels=hidden,
    num_layers=spec["layers"], predictor_mode="mlp",
)
sopt = stx.init(sparams)
t_h = jnp.asarray(
    np.random.default_rng(3).normal(size=(n, hidden)).astype(np.float32)
)
tpred = init_link_predictor(jax.random.PRNGKey(5), "mlp", hidden, hidden, 1, 2)
t0 = time.perf_counter()
sparams, sopt, sloss = s_fn(
    sparams, sopt, jax.random.PRNGKey(7), graph, x, t_h, tpred, pos_edges,
    neg_keys,
)
_ = float(sloss)
log(f"student compile+run: {time.perf_counter() - t0:.1f} s")
t0 = time.perf_counter()
sparams, sopt, sloss = s_fn(
    sparams, sopt, jax.random.PRNGKey(8), graph, x, t_h, tpred, pos_edges,
    neg_keys,
)
_ = float(sloss)
sdt = time.perf_counter() - t0
log(f"student[bf16 minibatch]: {sdt:.3f} s/epoch "
    f"({2 * e / sdt / 1e6:.2f} M edges/s)")

# ---------------- profiler trace: one warm teacher + one student epoch -------
trace_dir = _os.path.join(
    _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
    "docs", "traces", "r4",
)
log(f"tracing into {trace_dir} ...")
try:
    epoch_fn, params, opt = teacher_fns["sage"]
    jax.profiler.start_trace(trace_dir)
    params, opt, loss = epoch_fn(
        params, opt, jax.random.PRNGKey(100), graph, x, pos_edges, neg_keys
    )
    _ = float(loss)
    sparams, sopt, sloss = s_fn(
        sparams, sopt, jax.random.PRNGKey(101), graph, x, t_h, tpred,
        pos_edges, neg_keys,
    )
    _ = float(sloss)
    jax.profiler.stop_trace()
    log("trace captured")
except Exception as exc:  # noqa: BLE001 - record and continue; trace is best-effort
    log(f"trace FAILED: {exc!r}")

log("DONE")
