"""TPU measurement (round 4, session 2): locality relabel vs the cold gather.

The r4 trace pinned 68.4% of the collab-scale teacher step on the two
edge-row gathers; BASELINE records the cold-table random sender gather at
~100 GB/s (2.5x below cache-warm) and a measured RCM rejection (83.8 ms —
RCM's long thin ordering destroys window block structure).  The round-4
locality partitioner produces a different ordering class: community-
CLUSTERED ids, under which a receiver window's senders concentrate in a
compact id range (cache/locality friendly) while receiver sort is intact.

Measures (chained in-jit, one process, axon protocol):
  segsum SpMM fwd fp32: baseline vs locality P=8 vs locality P=64
  full 3-layer SAGE teacher epoch: baseline vs locality P=64

Usage: python scripts/r4s2_locality_gather.py [logfile]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/r4s2_locality.log"
log_f = open(OUT, "a", buffering=1)


def log(msg):
    log_f.write(f"[{time.strftime('%H:%M:%S')}] {msg}\n")


log("importing jax...")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

from llp_tpu.core import build_graph  # noqa: E402
from llp_tpu.data.partition import locality_order  # noqa: E402
from llp_tpu.data.registry import get_dataset  # noqa: E402
from llp_tpu.ops.pallas.segsum_kernel import prepare_segsum  # noqa: E402
from llp_tpu.ops.spmm import spmm  # noqa: E402

log("building collab standin...")
ds = get_dataset("/tmp/llp-collab-refresh", "collab")
n = ds.num_nodes
tr = np.concatenate([ds.edge_index, ds.edge_index[::-1]], axis=1).astype(np.int64)
graphs = {"baseline": (build_graph(tr, n), np.arange(n))}
for p_ in (8, 64):
    t0 = time.time()
    order = locality_order(tr, n, p_)
    dt = time.time() - t0
    inv = np.empty(n, np.int64)
    inv[order] = np.arange(n)
    graphs[f"locality P={p_}"] = (build_graph(inv[tr], n), order)
    log(f"locality_order P={p_}: {dt:.1f}s host build")
for name, (g, _) in graphs.items():
    prepare_segsum(g)
log(f"N={n} E_msg={graphs['baseline'][0].num_edges}; graphs ready")

KCH = 8


def chain(name, body, x0):
    @jax.jit
    def run(v):
        def step(v, _):
            return body(v), ()

        out, _ = lax.scan(step, v, None, length=KCH)
        return out

    r = run(x0)
    _ = float(jnp.sum(r.astype(jnp.float32)))
    t0 = time.perf_counter()
    r = run(x0)
    _ = float(jnp.sum(r.astype(jnp.float32)))
    log(f"  {name}: {(time.perf_counter() - t0) / KCH * 1e3:.2f} ms")


rng = np.random.default_rng(0)
h32 = jnp.asarray(rng.normal(size=(n, 256)), jnp.float32)
for name, (g, _) in graphs.items():
    chain(
        f"spmm fwd fp32 {name}",
        lambda v, g=g: spmm(g, v, "mean", impl="segsum").astype(v.dtype)
        + v * 1e-6,
        h32,
    )

# ---- full teacher epoch, baseline vs locality P=64 ---------------------------
from llp_tpu.train.teacher import (  # noqa: E402
    init_teacher_params,
    make_teacher_epoch_fn,
)

e_pos = tr.shape[1]
params = init_teacher_params(
    jax.random.PRNGKey(0), encoder="sage", in_channels=ds.x.shape[1],
    hidden_channels=256, num_layers=3, predictor_mode="mlp",
)
epoch_fn, tx = make_teacher_epoch_fn(
    encoder="sage", predictor_mode="mlp", dropout=0.5, num_nodes=n,
    num_pos_edges=e_pos, link_batch_size=64 * 1024, neg_mode="uniform",
    lr=0.005, spmm_impl="segsum",
)
steps = -(-e_pos // (64 * 1024))
for name in ("baseline", "locality P=64"):
    g, order = graphs[name]
    x = jnp.asarray(np.asarray(ds.x)[order])
    inv = np.empty(n, np.int64)
    inv[order] = np.arange(n)
    pos_edges = jnp.asarray(inv[tr].T.astype(np.int32))
    neg_keys = jnp.zeros((1,), jnp.int32)
    p = jax.tree_util.tree_map(lambda a: a.copy(), params)
    opt = tx.init(p)
    t0 = time.perf_counter()
    p, opt, loss = epoch_fn(p, opt, jax.random.PRNGKey(1), g, x, pos_edges, neg_keys)
    _ = float(loss)
    log(f"epoch[{name}] compile+run: {time.perf_counter() - t0:.1f} s")
    t0 = time.perf_counter()
    p, opt, loss = epoch_fn(p, opt, jax.random.PRNGKey(2), g, x, pos_edges, neg_keys)
    _ = float(loss)
    dt = time.perf_counter() - t0
    log(f"epoch[{name}]: {dt:.3f} s = {dt / steps * 1e3:.1f} ms/step "
        f"({2 * e_pos / dt / 1e6:.2f} M edges/s)")
log("DONE")
