"""Predictor-backward experiment: unsorted scatter vs runtime-sorted
segment-sum for dh accumulation. Writes to argv[1]."""

import functools
import sys
import time

import numpy as np

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/bench_predbwd.log"
log_f = open(OUT, "a", buffering=1)


def log(msg):
    log_f.write(f"[{time.strftime('%H:%M:%S')}] {msg}\n")


log("importing jax...")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

import os as _os; sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root
from bench import BATCH, DIM, HIDDEN, N_NODES  # noqa: E402
from llp_tpu.models.predictor import apply_link_predictor  # noqa: E402
from llp_tpu.ops.losses import bce_loss  # noqa: E402
from llp_tpu.train.teacher import init_teacher_params  # noqa: E402

K = 30
params = init_teacher_params(
    jax.random.PRNGKey(0), encoder="sage", in_channels=DIM,
    hidden_channels=HIDDEN, num_layers=2, predictor_mode="mlp",
)
key = jax.random.PRNGKey(1)
src = jax.random.randint(key, (BATCH,), 0, N_NODES)
dst = jax.random.randint(jax.random.fold_in(key, 1), (BATCH,), 0, N_NODES)
nsrc = jax.random.randint(jax.random.fold_in(key, 2), (BATCH,), 0, N_NODES)
ndst = jax.random.randint(jax.random.fold_in(key, 3), (BATCH,), 0, N_NODES)
h_fixed = jax.random.normal(jax.random.fold_in(key, 4), (N_NODES, HIDDEN))
labels = jnp.concatenate([jnp.ones((BATCH,)), jnp.zeros((BATCH,))])
asrc = jnp.concatenate([src, nsrc])
adst = jnp.concatenate([dst, ndst])
log(f"ready B={2 * BATCH} pairs")


# ---- baseline: plain gathers (XLA unsorted scatter-add in bwd) --------------
def pred_loss_base(p, h):
    out = apply_link_predictor(
        p["predictor"], jnp.take(h, asrc, axis=0), jnp.take(h, adst, axis=0),
        mode="mlp", train=False,
    )
    return bce_loss(out, labels)


# ---- sorted variant: custom vjp gathers fwd, sorted segment-sum bwd ---------
cat = jnp.concatenate([asrc, adst])
order = jnp.argsort(cat)
sorted_cat = cat[order]


@jax.custom_vjp
def gather_pair(h):
    return jnp.take(h, asrc, axis=0), jnp.take(h, adst, axis=0)


def gp_fwd(h):
    return gather_pair(h), ()


def gp_bwd(_res, g):
    gi, gj = g
    dcat = jnp.take(jnp.concatenate([gi, gj], axis=0), order, axis=0)
    dh = jax.ops.segment_sum(
        dcat, sorted_cat, num_segments=N_NODES, indices_are_sorted=True
    )
    return (dh,)


gather_pair.defvjp(gp_fwd, gp_bwd)


def pred_loss_sorted(p, h):
    hi, hj = gather_pair(h)
    out = apply_link_predictor(p["predictor"], hi, hj, mode="mlp", train=False)
    return bce_loss(out, labels)


def chain(name, loss_fn):
    @jax.jit
    def run(p, h):
        def step(h, _):
            dh = jax.grad(loss_fn, argnums=1)(p, h)
            return h + 1e-12 * dh, ()

        h, _ = lax.scan(step, h, None, length=K)
        return h

    r = run(params, h_fixed)
    _ = float(jnp.sum(r[:1]))
    t0 = time.perf_counter()
    r = run(params, h_fixed)
    _ = float(jnp.sum(r[:1]))
    dt = (time.perf_counter() - t0) / K * 1e3
    log(f"{name}: {dt:.3f} ms/iter")
    return dt


a = chain("pred grad wrt h (unsorted scatter)", pred_loss_base)
b = chain("pred grad wrt h (runtime-sorted segsum)", pred_loss_sorted)
log(f"speedup {a / b:.2f}x")
log("DONE")
