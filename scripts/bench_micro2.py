"""Dispatch-free microbench: chain K iterations of an op inside one jit
(lax.scan with data dependence) so the axon tunnel's ~2ms per-call latency
amortizes away. Writes to argv[1]."""

import sys
import time

import numpy as np

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/bench_micro2.log"
log_f = open(OUT, "a", buffering=1)


def log(msg):
    log_f.write(f"[{time.strftime('%H:%M:%S')}] {msg}\n")


log("importing jax...")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

import os as _os; sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root
from bench import BATCH, DIM, N_NODES, build_problem  # noqa: E402
from llp_tpu.core import build_graph  # noqa: E402
from llp_tpu.ops.pallas.segsum_kernel import prepare_segsum  # noqa: E402
from llp_tpu.ops.spmm import spmm  # noqa: E402

K = 50
ei, x = build_problem()
graph = build_graph(ei, N_NODES)
e = ei.shape[1]
xd = jnp.asarray(x)
prepare_segsum(graph)
log(f"ready: N={N_NODES} E={e} D={DIM} (K={K} chained iters)")

senders = graph.senders
bidx = jax.random.randint(jax.random.PRNGKey(0), (2 * BATCH,), 0, N_NODES)


def chain(name, body, x0):
    """body: x -> x (same shape/dtype). Times K chained applications."""

    @jax.jit
    def run(x_):
        def step(h, _):
            return body(h), ()

        out, _ = lax.scan(step, x_, None, length=K)
        return out

    r = run(x0)
    _ = float(jnp.sum(r.astype(jnp.float32)))  # compile + sync
    t0 = time.perf_counter()
    r = run(x0)
    _ = float(jnp.sum(r.astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / K * 1e3
    log(f"{name}: {dt:.3f} ms/iter")
    return dt


for dt_name, dt in [("f32", jnp.float32), ("bf16", jnp.bfloat16)]:
    xc = xd.astype(dt)

    # gather + fold back to (N, D) with a cheap slice so shapes chain
    def g_body(h):
        m = jnp.take(h, senders, axis=0)
        return h + m[:N_NODES] * jnp.asarray(1e-6, h.dtype)

    chain(f"gather_edges[{dt_name}]", g_body, xc)

    def seg_body(h):
        return spmm(graph, h, "mean", impl="segsum") + h * jnp.asarray(1e-6, h.dtype)

    chain(f"segsum_fwd[{dt_name}]", seg_body, xc)

    def segb_body(h):
        gr = jax.grad(
            lambda y: jnp.sum(spmm(graph, y, "mean", impl="segsum").astype(jnp.float32))
        )(h)
        return h + gr.astype(h.dtype) * jnp.asarray(1e-6, h.dtype)

    chain(f"segsum_fwd+bwd[{dt_name}]", segb_body, xc)

    def xla_body(h):
        return spmm(graph, h, "mean", impl="xla") + h * jnp.asarray(1e-6, h.dtype)

    chain(f"xla_spmm_fwd[{dt_name}]", xla_body, xc)

    w = jnp.asarray(np.random.default_rng(0).normal(size=(DIM, DIM)) * 0.01, dt)

    def mm_body(h):
        return jnp.dot(h, w, preferred_element_type=jnp.float32).astype(h.dtype)

    chain(f"dense_matmul[{dt_name}]", mm_body, xc)

    def pred_body(h):
        hi = jnp.take(h, bidx[:BATCH], axis=0)
        hj = jnp.take(h, bidx[BATCH:], axis=0)
        z = hi * hj
        z = jax.nn.relu(jnp.dot(z, w, preferred_element_type=jnp.float32).astype(h.dtype))
        s = jnp.sum(z, dtype=jnp.float32) * 1e-9
        return h + s.astype(h.dtype)

    chain(f"predictor[{dt_name}]", pred_body, xc)

log("DONE")
