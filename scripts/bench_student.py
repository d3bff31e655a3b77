"""Student minibatch-step profiling at collab scale (TPU).

The teacher step was rooflined in session 2 (BASELINE.md); the student
minibatch path (the paper's deployment-relevant training mode) never was.
This times the whole-epoch program under knob ablations to attribute cost:

  1. full LLP (llp_d=1, llp_r=1, TL=0.1)   fp32
  2. same                                   bf16 compute
  3. label-only (llp_d=llp_r=0 -> no context sampling / KD at all)
  4. LLP_D only (llp_r=0)
  5. full with epochs_per_call=2 (dispatch amortization check)

Collab shapes: N=235,868  D=128  H=256  L=3  bl=65,536  c=12.
Writes progress to argv[1] (line-buffered) — run in background, poll the log.
"""

import sys
import time

import numpy as np

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/bench_student.log"
log_f = open(OUT, "a", buffering=1)


def log(msg):
    log_f.write(f"[{time.strftime('%H:%M:%S')}] {msg}\n")


log("importing jax...")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import os as _os; sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root
from llp_tpu.core import build_graph  # noqa: E402
from llp_tpu.data.synthetic import community_features, sbm_graph  # noqa: E402
from llp_tpu.train.student import init_student_params, make_student_epoch_fn  # noqa: E402
from llp_tpu.train.teacher import init_teacher_params  # noqa: E402

log(f"backend={jax.default_backend()}")

N, D, H, L = 235_868, 128, 256, 3
BL = 64 * 1024
log("building collab-shaped problem...")
ei, comm = sbm_graph(N, 64, 8.2, seed=7)
x = jnp.asarray(community_features(comm, D, kind="gauss", seed=7))
g = build_graph(ei, N)
E = int(ei.shape[1])
pos = jnp.asarray(ei.T.astype(np.int32))
t_h = jnp.asarray(
    np.random.default_rng(0).normal(size=(N, H)).astype(np.float32)
)
teacher = init_teacher_params(
    jax.random.PRNGKey(3), encoder="sage", in_channels=D, hidden_channels=H,
    num_layers=L, predictor_mode="mlp",
)
tpred = teacher["predictor"]
BN = max(1, int(N / (E / min(BL, E))))
STEPS = -(-E // BL)
log(f"N={N} E={E} bl={BL} bn={BN} steps/epoch={STEPS}")


def timeit(name, **kw):
    epochs_per_call = kw.pop("epochs_per_call", 1)
    epoch_fn, tx = make_student_epoch_fn(
        num_nodes=N, num_pos_edges=E, link_batch_size=BL, node_batch_size=BN,
        predictor_mode="mlp", dropout=0.5, lr=0.005, neg_mode="uniform",
        minibatch=True, epochs_per_call=epochs_per_call, **kw,
    )
    params = init_student_params(
        jax.random.PRNGKey(2), in_channels=D, hidden_channels=H,
        num_layers=L, predictor_mode="mlp",
    )
    opt = tx.init(params)
    if epochs_per_call > 1:
        key = jax.random.split(jax.random.PRNGKey(9), epochs_per_call)
    else:
        key = jax.random.PRNGKey(9)
    t0 = time.perf_counter()
    params, opt, loss = epoch_fn(params, opt, key, g, x, t_h, tpred, pos, None)
    _ = float(jnp.sum(loss))
    log(f"  {name}: compile+first {time.perf_counter() - t0:.1f}s")
    reps = 3
    t0 = time.perf_counter()
    for _i in range(reps):
        params, opt, loss = epoch_fn(params, opt, key, g, x, t_h, tpred, pos, None)
    _ = float(jnp.sum(loss))
    dt = (time.perf_counter() - t0) / (reps * epochs_per_call)
    eps = E / dt
    log(f"  {name}: {dt * 1e3:.1f} ms/epoch = {eps / 1e6:.2f} M edges/s "
        f"({dt / STEPS * 1e3:.2f} ms/step)")
    del params, opt
    return dt


t_full = timeit("full LLP fp32", true_label=0.1, llp_d=1.0, llp_r=1.0)
t_bf16 = timeit("full LLP bf16", true_label=0.1, llp_d=1.0, llp_r=1.0,
                compute_dtype="bfloat16")
t_label = timeit("label-only fp32", true_label=1.0, llp_d=0.0, llp_r=0.0)
t_d = timeit("LLP_D only (llp_r=0)", true_label=0.1, llp_d=1.0, llp_r=0.0)
t_fused = timeit("full fp32 epochs_per_call=2", true_label=0.1, llp_d=1.0,
                 llp_r=1.0, epochs_per_call=2)

log(f"attribution: KD total {1e3 * (t_full - t_label) / STEPS:.2f} ms/step; "
    f"LLP_R part {1e3 * (t_full - t_d) / STEPS:.2f} ms/step; "
    f"bf16 speedup {t_full / t_bf16:.2f}x; fusion {t_full / t_fused:.2f}x")
log("DONE")
