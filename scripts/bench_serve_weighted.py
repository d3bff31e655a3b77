"""TPU measurement batch (session 3): weighted-segsum micro + serving throughput.

One long-lived process, chained measurements, line-buffered log (argv[1]) —
the axon relay protocol from .claude/skills/verify/SKILL.md.
"""

import sys
import time

import numpy as np

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/bench_serve_weighted.log"
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
from llp_tpu.ops.pallas.segsum_kernel import prepare_segsum  # noqa: E402
from llp_tpu.ops.spmm import spmm  # noqa: E402

K = 50
ei, x = build_problem()
graph = build_graph(ei, N_NODES)
e = ei.shape[1]
xd = jnp.asarray(x)
prepare_segsum(graph, weighted=True)
wts = jnp.asarray(
    np.random.default_rng(1).uniform(0.5, 1.5, size=(graph.num_padded_edges,)),
    jnp.float32,
)
log(f"ready: N={N_NODES} E={e} D={DIM} (K={K} chained iters)")


def chain(name, body, x0):
    @jax.jit
    def run(x_):
        def step(h, _):
            return body(h), ()

        out, _ = lax.scan(step, x_, None, length=K)
        return out

    r = run(x0)
    _ = float(jnp.sum(r.astype(jnp.float32)))
    t0 = time.perf_counter()
    r = run(x0)
    _ = float(jnp.sum(r.astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / K * 1e3
    log(f"{name}: {dt:.3f} ms/iter")
    return dt


# ---- weighted SpMM: kernel vs XLA, fwd and fwd+bwd ---------------------------
def wseg_body(h):
    return spmm(graph, h, "mean", edge_weight=wts, impl="segsum") + h * 1e-6


def wxla_body(h):
    return spmm(graph, h, "mean", edge_weight=wts, impl="xla") + h * 1e-6


def wsegb_body(h):
    gr = jax.grad(
        lambda y: jnp.sum(spmm(graph, y, "mean", edge_weight=wts, impl="segsum"))
    )(h)
    return h + gr * 1e-6


def wxlab_body(h):
    gr = jax.grad(
        lambda y: jnp.sum(spmm(graph, y, "mean", edge_weight=wts, impl="xla"))
    )(h)
    return h + gr * 1e-6


chain("weighted_segsum_fwd", wseg_body, xd)
chain("weighted_xla_fwd", wxla_body, xd)
chain("weighted_segsum_fwd+bwd", wsegb_body, xd)
chain("weighted_xla_fwd+bwd", wxlab_body, xd)

# ---- serving throughput -------------------------------------------------------
from llp_tpu.models.mlp import init_mlp  # noqa: E402
from llp_tpu.models.predictor import init_link_predictor  # noqa: E402
from llp_tpu.serve import encode_nodes, score_pairs, top_k_partners  # noqa: E402

N_SERVE, H = 235_000, 256
rng = np.random.default_rng(2)
xs = jnp.asarray(rng.normal(size=(N_SERVE, DIM)).astype(np.float32))
enc = init_mlp(jax.random.PRNGKey(0), 2, DIM, H, H)
log(f"serving table: N={N_SERVE} D={DIM} H={H}")

t0 = time.perf_counter()
h_emb = encode_nodes(enc, xs, block=32768)
_ = float(h_emb[0, 0])
log(f"encode_nodes compile+run: {time.perf_counter() - t0:.2f} s")
t0 = time.perf_counter()
h_emb = encode_nodes(enc, xs, block=32768)
_ = float(h_emb[0, 0])
dt = time.perf_counter() - t0
log(f"encode_nodes: {dt*1e3:.1f} ms -> {N_SERVE/dt/1e6:.2f} M nodes/s")

for mode in ("inner", "mlp"):
    pred = init_link_predictor(jax.random.PRNGKey(1), mode, H, H, 1, 2)
    npairs = 1 << 20
    src = jnp.asarray(rng.integers(0, N_SERVE, npairs).astype(np.int32))
    dst = jnp.asarray(rng.integers(0, N_SERVE, npairs).astype(np.int32))
    out = score_pairs(pred, h_emb, src, dst, mode=mode)
    _ = float(out[0])
    t0 = time.perf_counter()
    out = score_pairs(pred, h_emb, src, dst, mode=mode)
    _ = float(out[0])
    dt = time.perf_counter() - t0
    log(f"score_pairs[{mode}] {npairs} pairs: {dt*1e3:.1f} ms -> "
        f"{npairs/dt/1e6:.1f} M pairs/s")

    q = 256
    qi = jnp.asarray(rng.integers(0, N_SERVE, q).astype(np.int32))
    vals, ids = top_k_partners(pred, h_emb, qi, k=10, mode=mode, block=16384)
    _ = float(vals[0, 0])
    t0 = time.perf_counter()
    vals, ids = top_k_partners(pred, h_emb, qi, k=10, mode=mode, block=16384)
    _ = float(vals[0, 0])
    dt = time.perf_counter() - t0
    log(f"top_k_partners[{mode}] Q={q} over N={N_SERVE}: {dt*1e3:.1f} ms -> "
        f"{q*N_SERVE/dt/1e6:.0f} M pairs scored/s, "
        f"{dt/q*1e3:.3f} ms/query")

log("DONE")
