"""Post-layout-fix segsum micro timings (round 3): fwd/bwd + weighted at
the bench shape, updating BASELINE's in-jit op-cost rows (pre-fix: fwd
2.88 / bwd 2.81 / weighted 4.09 ms — the (E,1) lid layout added a padded
256KB read per 512-edge block)."""

import sys
import time

import numpy as np

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/bench_segsum_r3.log"
log_f = open(OUT, "a", buffering=1)


def log(msg):
    log_f.write(f"[{time.strftime('%H:%M:%S')}] {msg}\n")


log("importing jax...")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

import os as _os; sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root
from llp_tpu.core import build_graph  # noqa: E402
from llp_tpu.data.synthetic import community_features, sbm_graph  # noqa: E402
from llp_tpu.ops.pallas.segsum_kernel import prepare_segsum  # noqa: E402
from llp_tpu.ops.spmm import spmm  # noqa: E402

log(f"devices: {jax.devices()}")
ei, comm = sbm_graph(20_000, 16, 16.0, seed=7)
x = jnp.asarray(community_features(comm, 256, kind="gauss", seed=7))
g = build_graph(ei, 20_000)
prepare_segsum(g)
w = jnp.asarray(
    np.random.default_rng(0).uniform(0.5, 2.0, g.num_padded_edges)
    .astype(np.float32)
)
gw = build_graph(ei, 20_000, edge_weight=np.asarray(w)[: ei.shape[1]])
prepare_segsum(gw, weighted=True)
K = 20


def chain(name, fn, xv):
    @jax.jit
    def run(xa):
        def step(c, _):
            out = fn(xa + c * 1e-30)
            return c * 0.999 + jnp.sum(out[0]) * 1e-12, ()

        c, _ = lax.scan(step, jnp.float32(0.0), None, length=K)
        return c

    _ = float(run(xv))
    t0 = time.perf_counter()
    _ = float(run(xv))
    log(f"  {name}: {(time.perf_counter() - t0) / K * 1e3:.2f} ms")


chain("segsum fwd (mean, 413k x 256)",
      lambda xv: spmm(g, xv, "mean", impl="segsum"), x)
chain("segsum bwd (grad wrt x)",
      lambda xv: jax.grad(
          lambda a: jnp.sum(spmm(g, a, "mean", impl="segsum") ** 2) * 1e-9
      )(xv), x)
from llp_tpu.ops.spmm import mean_aggregate  # noqa: E402

chain("segsum WEIGHTED mean fwd",
      lambda xv: mean_aggregate(gw, xv, impl="segsum"), x)
log("DONE")
