"""TPU measurement (session 7): levers on the collab-scale SpMM gather floor.

bench_teacher_collab.py showed the 3-layer collab teacher step is SpMM-bound
at ~50 ms per (5M x 256) SpMM direction — the fwd gather reads sender rows
in receiver-sorted (i.e. random) order from a 240MB table at ~100 GB/s
effective, 2.5x below the cache-warm bench-scale rate. Candidates:

  1. bf16 feature/message rows (half the random-read bytes)
  2. RCM node reordering (senders of nearby receivers become nearby rows)
  3. both

Also times the full teacher epoch at compute_dtype=bfloat16 for the driver-
level effect. Axon protocol: one process, chained timing, arrays as args.
"""

import sys
import time

import numpy as np

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/bench_levers.log"
log_f = open(OUT, "a", buffering=1)


def log(msg):
    log_f.write(f"[{time.strftime('%H:%M:%S')}] {msg}\n")


log("importing jax...")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

import os as _os; sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root
from llp_tpu.core import build_graph  # noqa: E402
from llp_tpu.data.registry import get_dataset  # noqa: E402
from llp_tpu.data.reorder import rcm_order  # noqa: E402
from llp_tpu.ops.pallas.segsum_kernel import prepare_segsum  # noqa: E402
from llp_tpu.ops.spmm import spmm  # noqa: E402

log("building collab standin...")
ds = get_dataset("/tmp/llp-collab-refresh", "collab")
n = ds.num_nodes
tr = np.concatenate([ds.edge_index, ds.edge_index[::-1]], axis=1).astype(np.int64)
graph = build_graph(tr, n)
prepare_segsum(graph)

perm = rcm_order(tr, n)          # new id -> old id? check convention below
inv = np.empty(n, np.int64)
inv[perm] = np.arange(n)
tr_rcm = inv[tr]
graph_rcm = build_graph(tr_rcm, n)
prepare_segsum(graph_rcm)
log(f"N={n} E_msg={graph.num_edges}; rcm graph ready")

KCH = 8


def chain(name, body, x0, *ops):
    @jax.jit
    def run(v, *o):
        def step(v, _):
            return body(v, *o), ()

        out, _ = lax.scan(step, v, None, length=KCH)
        return out

    r = run(x0, *ops)
    _ = float(jnp.sum(r.astype(jnp.float32)))
    t0 = time.perf_counter()
    r = run(x0, *ops)
    _ = float(jnp.sum(r.astype(jnp.float32)))
    log(f"  {name}: {(time.perf_counter()-t0)/KCH*1e3:.2f} ms")


rng = np.random.default_rng(0)
h32 = jnp.asarray(rng.normal(size=(n, 256)), jnp.float32)
h16 = h32.astype(jnp.bfloat16)

chain("spmm fwd fp32 (baseline)",
      lambda v: spmm(graph, v, "mean", impl="segsum").astype(v.dtype) + v * 1e-6, h32)
chain("spmm fwd bf16 rows",
      lambda v: spmm(graph, v, "mean", impl="segsum").astype(v.dtype) + v * 1e-6, h16)
chain("spmm fwd fp32 RCM",
      lambda v: spmm(graph_rcm, v, "mean", impl="segsum").astype(v.dtype) + v * 1e-6, h32)
chain("spmm fwd bf16 RCM",
      lambda v: spmm(graph_rcm, v, "mean", impl="segsum").astype(v.dtype) + v * 1e-6, h16)

# XLA path for reference at this scale
chain("spmm fwd fp32 XLA impl",
      lambda v: spmm(graph, v, "mean", impl="xla").astype(v.dtype) + v * 1e-6, h32)
chain("spmm fwd bf16 XLA impl",
      lambda v: spmm(graph, v, "mean", impl="xla").astype(v.dtype) + v * 1e-6, h16)

# ---- full teacher epoch at bf16 compute --------------------------------------
from llp_tpu.train.teacher import init_teacher_params, make_teacher_epoch_fn  # noqa: E402

e_pos = tr.shape[1]
x = jnp.asarray(ds.x)
pos_edges = jnp.asarray(tr.T.astype(np.int32))
neg_keys = jnp.zeros((1,), jnp.int32)
params = init_teacher_params(
    jax.random.PRNGKey(0), encoder="sage", in_channels=ds.x.shape[1],
    hidden_channels=256, num_layers=3, predictor_mode="mlp",
)
for dtype in ("bfloat16",):
    epoch_fn, tx = make_teacher_epoch_fn(
        encoder="sage", predictor_mode="mlp", dropout=0.5, num_nodes=n,
        num_pos_edges=e_pos, link_batch_size=64 * 1024, neg_mode="uniform",
        lr=0.005, spmm_impl="segsum", compute_dtype=dtype,
    )
    p = jax.tree_util.tree_map(lambda a: a.copy(), params)
    opt = tx.init(p)
    t0 = time.perf_counter()
    p, opt, loss = epoch_fn(p, opt, jax.random.PRNGKey(1), graph, x, pos_edges, neg_keys)
    _ = float(loss)
    log(f"epoch[{dtype}] compile+run: {time.perf_counter()-t0:.1f} s")
    t0 = time.perf_counter()
    p, opt, loss = epoch_fn(p, opt, jax.random.PRNGKey(2), graph, x, pos_edges, neg_keys)
    _ = float(loss)
    dt = time.perf_counter() - t0
    steps = -(-e_pos // (64 * 1024))
    log(f"epoch[{dtype}]: {dt:.3f} s = {dt/steps*1e3:.1f} ms/step "
        f"({2*e_pos/dt/1e6:.2f} M edges/s) [fp32 was 205 ms/step]")
log("DONE")
