"""A/B the segsum kernel's window height RMAX (FLOPs scale with E*RMAX*DT;
window-DMA traffic scales with N*DT per d-tile regardless). Chained in-jit
timing per RMAX on fresh graphs. Writes to argv[1]."""

import sys
import time

import numpy as np

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/bench_rmax.log"
log_f = open(OUT, "a", buffering=1)


def log(msg):
    log_f.write(f"[{time.strftime('%H:%M:%S')}] {msg}\n")


log("importing jax...")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

import os as _os; sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root
from bench import DIM, N_NODES, build_problem  # noqa: E402
from llp_tpu.core import build_graph  # noqa: E402
import llp_tpu.ops.pallas.segsum_kernel as sk  # noqa: E402
from llp_tpu.ops.spmm import spmm  # noqa: E402

K = 50
ei, x = build_problem()
xd = jnp.asarray(x)
ref = None

for rmax in (512, 256, 128):
    sk.RMAX = rmax
    graph = build_graph(ei, N_NODES)  # fresh cache_token per config
    sk.prepare_segsum(graph)

    def body(h, g=graph):
        return spmm(g, h, "mean", impl="segsum") + h * jnp.asarray(1e-6, h.dtype)

    @jax.jit
    def run(x_, g=graph):
        def step(h, _):
            return spmm(g, h, "mean", impl="segsum") + h * jnp.asarray(1e-6, h.dtype), ()

        h, _ = lax.scan(step, x_, None, length=K)
        return h

    r = run(xd)
    out1 = np.asarray(spmm(graph, xd, "mean", impl="segsum"))
    if ref is None:
        ref = out1
    else:
        err = float(np.max(np.abs(out1 - ref)))
        log(f"RMAX={rmax}: max|out-ref| = {err:.3e}")
    _ = float(jnp.sum(r[:1]))
    t0 = time.perf_counter()
    r = run(xd)
    _ = float(jnp.sum(r[:1]))
    dt = (time.perf_counter() - t0) / K * 1e3
    log(f"RMAX={rmax}: segsum fwd {dt:.3f} ms/iter")

    # fwd+bwd
    @jax.jit
    def runb(x_, g=graph):
        def step(h, _):
            gr = jax.grad(lambda y: jnp.sum(spmm(g, y, "mean", impl="segsum")))(h)
            return h + gr * jnp.asarray(1e-6, h.dtype), ()

        h, _ = lax.scan(step, x_, None, length=K)
        return h

    r = runb(xd)
    _ = float(jnp.sum(r[:1]))
    t0 = time.perf_counter()
    r = runb(xd)
    _ = float(jnp.sum(r[:1]))
    dt = (time.perf_counter() - t0) / K * 1e3
    log(f"RMAX={rmax}: segsum bwd {dt:.3f} ms/iter")

log("DONE")
