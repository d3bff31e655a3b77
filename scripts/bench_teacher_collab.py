"""TPU measurement (session 7): where does the collab-scale TEACHER step go?

Driver shows 172 ms/step (5.67 s/epoch, 33 steps) at N=236k, E_msg=4.26M,
D=128, H=256, dropout=0.5 — roughly 2.9x a naive component floor. Measure
the epoch program and its components at the real shapes.

Axon protocol: one process, chained in-jit timing, arrays as jit ARGS,
line-buffered log (argv[1]).
"""

import sys
import time

import numpy as np

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/bench_teacher_collab.log"
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
from llp_tpu.ops.pallas.segsum_kernel import prepare_segsum  # noqa: E402
from llp_tpu.ops.rng import bernoulli_mask  # noqa: E402
from llp_tpu.ops.spmm import spmm  # noqa: E402
from llp_tpu.train.teacher import init_teacher_params, make_teacher_epoch_fn  # noqa: E402

log("building collab standin...")
ds = get_dataset("/tmp/llp-collab-refresh", "collab")
n = ds.num_nodes
tr = np.concatenate([ds.edge_index, ds.edge_index[::-1]], axis=1).astype(np.int64)
# the driver trains on the symmetric split-train edges; close enough for
# component shapes: use the full symmetric edge set
graph = build_graph(tr, n)
e_pos = tr.shape[1]
log(f"N={n} E_msg={graph.num_edges} (padded {graph.num_padded_edges}) D={ds.x.shape[1]}")
prepare_segsum(graph)
x = jnp.asarray(ds.x)
pos_edges = jnp.asarray(tr.T.astype(np.int32))
neg_keys = jnp.zeros((1,), jnp.int32)

params = init_teacher_params(
    jax.random.PRNGKey(0), encoder="sage", in_channels=ds.x.shape[1],
    hidden_channels=256, num_layers=3, predictor_mode="mlp",
)

# ---- full epoch program at dropout 0.5 and 0.0 -------------------------------
for dr in (0.5, 0.0):
    epoch_fn, tx = make_teacher_epoch_fn(
        encoder="sage", predictor_mode="mlp", dropout=dr, num_nodes=n,
        num_pos_edges=e_pos, link_batch_size=64 * 1024, neg_mode="uniform",
        lr=0.005, spmm_impl="segsum",
    )
    p = jax.tree_util.tree_map(lambda a: a.copy(), params)
    opt = tx.init(p)
    t0 = time.perf_counter()
    p, opt, loss = epoch_fn(p, opt, jax.random.PRNGKey(1), graph, x, pos_edges, neg_keys)
    _ = float(loss)
    log(f"epoch[dropout={dr}] compile+run: {time.perf_counter()-t0:.1f} s")
    t0 = time.perf_counter()
    p, opt, loss = epoch_fn(p, opt, jax.random.PRNGKey(2), graph, x, pos_edges, neg_keys)
    _ = float(loss)
    dt = time.perf_counter() - t0
    steps = -(-e_pos // (64 * 1024))
    log(f"epoch[dropout={dr}]: {dt:.3f} s = {dt/steps*1e3:.1f} ms/step "
        f"({2*e_pos/dt/1e6:.2f} M edges/s)")

# ---- components (chained) ----------------------------------------------------
KCH = 8


def chain(name, body, x0, *ops):
    @jax.jit
    def run(v, *o):
        def step(v, _):
            return body(v, *o), ()

        out, _ = lax.scan(step, v, None, length=KCH)
        return out

    r = run(x0, *ops)
    _ = float(jnp.sum(r.astype(jnp.float32)) if hasattr(r, "astype") else r[0])
    t0 = time.perf_counter()
    r = run(x0, *ops)
    _ = float(jnp.sum(r.astype(jnp.float32)) if hasattr(r, "astype") else r[0])
    log(f"  {name}: {(time.perf_counter()-t0)/KCH*1e3:.2f} ms")


h256 = jnp.asarray(np.random.default_rng(0).normal(size=(n, 256)), jnp.float32)

chain("spmm fwd (4.26M x 256)", lambda v: spmm(graph, v, "mean", impl="segsum") + v * 1e-6, h256)
chain(
    "spmm fwd+bwd",
    lambda v: v + jax.grad(lambda y: jnp.sum(spmm(graph, y, "mean", impl="segsum")))(v) * 1e-6,
    h256,
)

w = jnp.asarray(np.random.default_rng(1).normal(size=(256, 256)) * 0.05, jnp.float32)
chain("dense fwd+bwd (236k,256)@(256,256)",
      lambda v, ww: v + jax.grad(lambda y: jnp.sum(jax.nn.relu(y @ ww)))(v) * 1e-6,
      h256, w)

kk = jax.random.PRNGKey(0)
chain("2x rbg masks (236k,256) + 1x (262k,256)",
      lambda v: jnp.where(bernoulli_mask(kk, 0.5, (n, 256)), v * 2.0, v)
      + bernoulli_mask(jax.random.fold_in(kk, 1), 0.5, (n, 256)).astype(jnp.float32)
      + jnp.sum(bernoulli_mask(jax.random.fold_in(kk, 2), 0.5, (262144, 256)).astype(jnp.float32)) * 1e-9,
      h256)

from llp_tpu.models.predictor import apply_link_predictor  # noqa: E402

pi = jnp.asarray(np.random.default_rng(2).integers(0, n, 262144).astype(np.int32))
pj = jnp.asarray(np.random.default_rng(3).integers(0, n, 262144).astype(np.int32))


def pred_body(v, pi_, pj_):
    def loss(hv):
        s = apply_link_predictor(
            params["predictor"], jnp.take(hv, pi_, axis=0),
            jnp.take(hv, pj_, axis=0), mode="mlp", train=False,
        )
        return jnp.sum(s)

    return v + jax.grad(loss)(v) * 1e-6


chain("predictor fwd+bwd (262k pairs, 236k table)", pred_body, h256, pi, pj)
log("DONE")
