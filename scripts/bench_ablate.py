"""Ablation timing of the teacher step: full grad vs encoder-only vs
predictor-only, chained in-jit (dispatch-free). Writes to argv[1]."""

import sys
import time

import numpy as np

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/bench_ablate.log"
log_f = open(OUT, "a", buffering=1)


def log(msg):
    log_f.write(f"[{time.strftime('%H:%M:%S')}] {msg}\n")


log("importing jax...")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

import os as _os; sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root
from bench import BATCH, DIM, HIDDEN, N_NODES, build_problem  # noqa: E402
from llp_tpu.core import build_graph  # noqa: E402
from llp_tpu.models.encoder import apply_encoder, precompute_first_aggregation  # noqa: E402
from llp_tpu.models.predictor import apply_link_predictor  # noqa: E402
from llp_tpu.ops.losses import bce_loss  # noqa: E402
from llp_tpu.ops.pallas.segsum_kernel import prepare_segsum  # noqa: E402
from llp_tpu.train.teacher import init_teacher_params  # noqa: E402

K = 30
ei, x = build_problem()
graph = build_graph(ei, N_NODES)
xd = jnp.asarray(x)
prepare_segsum(graph)
params = init_teacher_params(
    jax.random.PRNGKey(0), encoder="sage", in_channels=DIM,
    hidden_channels=HIDDEN, num_layers=2, predictor_mode="mlp",
)
x_agg = precompute_first_aggregation("sage", graph, xd, impl="segsum")
key = jax.random.PRNGKey(1)
src = jax.random.randint(key, (2 * BATCH,), 0, N_NODES)
dst = jax.random.randint(jax.random.fold_in(key, 1), (2 * BATCH,), 0, N_NODES)
labels = jnp.concatenate([jnp.ones((BATCH,)), jnp.zeros((BATCH,))])
log(f"ready N={N_NODES} E={ei.shape[1]} B={BATCH}")


def encoder_fwd(p, xa):
    return apply_encoder(
        "sage", p["encoder"], graph, xd, train=False, impl="segsum", x_agg=xa
    )


def full_loss(p, xa):
    h = encoder_fwd(p, xa)
    out = apply_link_predictor(
        p["predictor"], jnp.take(h, src, axis=0), jnp.take(h, dst, axis=0),
        mode="mlp", train=False,
    )
    return bce_loss(out, labels)


def enc_loss(p, xa):
    return jnp.sum(encoder_fwd(p, xa) ** 2) * 1e-9


h_fixed = encoder_fwd(params, x_agg)


def pred_loss(p, h):
    out = apply_link_predictor(
        p["predictor"], jnp.take(h, src, axis=0), jnp.take(h, dst, axis=0),
        mode="mlp", train=False,
    )
    return bce_loss(out, labels)


def chain_grad(name, loss_fn, *extra):
    @jax.jit
    def run(p, *e):
        def step(p, _):
            g = jax.grad(loss_fn)(p, *e)
            return jax.tree_util.tree_map(
                lambda a, b: a + 1e-12 * b.astype(a.dtype), p, g
            ), ()
        p, _ = lax.scan(step, p, None, length=K)
        return p

    r = run(params, *extra)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(r)[0]))
    t0 = time.perf_counter()
    r = run(params, *extra)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(r)[0]))
    dt = (time.perf_counter() - t0) / K * 1e3
    log(f"{name}: {dt:.3f} ms/iter")
    return dt


t_full = chain_grad("grad(full step loss)", full_loss, x_agg)
t_enc = chain_grad("grad(encoder-only)", enc_loss, x_agg)
t_pred = chain_grad("grad(predictor-only, fixed h)", pred_loss, h_fixed)
log(f"predictor-attributable ~= {t_full - t_enc:.2f} ms; "
    f"pred-only {t_pred:.2f} ms")
log("DONE")
