"""Component microbenchmarks on the real TPU: where does the teacher step go?

Times (per call, ms): edge gather, segsum fwd, segsum fwd+bwd, dense matmul,
predictor scoring, full batch_loss grad — fp32 vs bf16.
Writes to argv[1]; single process (axon protocol).
"""

import sys
import time

import numpy as np

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/bench_micro.log"
log_f = open(OUT, "a", buffering=1)


def log(msg):
    log_f.write(f"[{time.strftime('%H:%M:%S')}] {msg}\n")


log("importing jax...")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

log(f"backend={jax.default_backend()}")

import os as _os; sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root
from bench import BATCH, DIM, N_NODES, build_problem  # noqa: E402
from llp_tpu.core import build_graph  # noqa: E402
from llp_tpu.ops.pallas.segsum_kernel import prepare_segsum  # noqa: E402
from llp_tpu.ops.spmm import spmm  # noqa: E402

ei, x = build_problem()
graph = build_graph(ei, N_NODES)
e = ei.shape[1]
xd = jnp.asarray(x)
prepare_segsum(graph)
log(f"ready: N={N_NODES} E={e} D={DIM} B={BATCH}")


def timeit(name, fn, *args, iters=20):
    # warmup
    r = fn(*args)
    _ = float(jnp.sum(r) if r.ndim else r)
    t0 = time.perf_counter()
    acc = None
    for _ in range(iters):
        acc = fn(*args)
    _ = float(jnp.sum(acc) if acc.ndim else acc)
    dt = (time.perf_counter() - t0) / iters * 1e3
    log(f"{name}: {dt:.3f} ms")
    return dt


senders = graph.senders
key = jax.random.PRNGKey(0)
bidx = jax.random.randint(key, (2 * BATCH,), 0, N_NODES)

for dt_name, dt in [("f32", jnp.float32), ("bf16", jnp.bfloat16)]:
    xc = xd.astype(dt)

    gather = jax.jit(lambda x_: jnp.take(x_, senders, axis=0))
    timeit(f"gather_edges[{dt_name}] ({senders.shape[0]} rows)", gather, xc)

    gather_b = jax.jit(lambda x_: jnp.take(x_, bidx, axis=0))
    timeit(f"gather_batch[{dt_name}] ({2 * BATCH} rows)", gather_b, xc)

    seg_f = jax.jit(lambda x_: spmm(graph, x_, "mean", impl="segsum"))
    timeit(f"segsum_fwd[{dt_name}]", seg_f, xc)

    seg_fb = jax.jit(
        lambda x_: jax.grad(lambda y: jnp.sum(spmm(graph, y, "mean", impl="segsum")))(x_)
    )
    timeit(f"segsum_fwd+bwd[{dt_name}]", seg_fb, xc)

    xla_f = jax.jit(lambda x_: spmm(graph, x_, "mean", impl="xla"))
    timeit(f"xla_spmm_fwd[{dt_name}]", xla_f, xc)

    w = jnp.asarray(np.random.default_rng(0).normal(size=(DIM, DIM)), dt)
    mm = jax.jit(lambda x_, w_: jnp.dot(x_, w_, preferred_element_type=jnp.float32).astype(dt))
    timeit(f"dense_matmul[{dt_name}] ({N_NODES}x{DIM}x{DIM})", mm, xc, w)

    # predictor-shaped: gather 128k pairs + hadamard + 2-layer MLP head
    wp1 = jnp.asarray(np.random.default_rng(1).normal(size=(DIM, DIM)), dt)
    wp2 = jnp.asarray(np.random.default_rng(2).normal(size=(DIM, 1)), dt)

    def pred(x_, w1, w2):
        hi = jnp.take(x_, bidx[:BATCH], axis=0)
        hj = jnp.take(x_, bidx[BATCH:], axis=0)
        z = hi * hj
        z = jax.nn.relu(jnp.dot(z, w1, preferred_element_type=jnp.float32).astype(dt))
        return jnp.sum(jnp.dot(z, w2, preferred_element_type=jnp.float32))

    timeit(f"predictor[{dt_name}] ({BATCH} pairs)", jax.jit(pred), xc, wp1, wp2)

log("DONE")
