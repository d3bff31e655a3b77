"""Dropout-RNG cost: threefry vs rbg bit generation on this chip.

bench_student2 showed dropout=0.5 adds ~13 ms/step (43%) to the student
step — all threefry2x32 bit generation. XLA's RngBitGenerator ('rbg' PRNG
impl) uses the hardware generator. Times bernoulli masks at the step's
shapes under both impls, plus a 3-layer MLP fwd+bwd with dropout to see the
end-to-end effect. Writes to argv[1].
"""

import sys
import time

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/bench_rng.log"
log_f = open(OUT, "a", buffering=1)


def log(msg):
    log_f.write(f"[{time.strftime('%H:%M:%S')}] {msg}\n")


log("importing jax...")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

import os as _os; sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root
log(f"backend={jax.default_backend()}")

ROWS, H = 342_172, 256
K = 20


def chain(name, fn, init, operands=()):
    @jax.jit
    def run(v, *ops):
        def step(v, i):
            return fn(v, i, *ops), ()
        v, _ = lax.scan(step, v, jnp.arange(K))
        return v

    r = run(init, *operands)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(r)[0]))
    t0 = time.perf_counter()
    r = run(init, *operands)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(r)[0]))
    dt = (time.perf_counter() - t0) / K * 1e3
    log(f"  {name}: {dt:.2f} ms")
    return dt


kt = jax.random.PRNGKey(0)
kr = jax.random.key(0, impl="rbg")


def bern_it(v, i, k):
    kk = jax.random.fold_in(k, i)
    m = jax.random.bernoulli(kk, 0.5, (ROWS, H))
    return (v[0] * 0.999 + jnp.sum(m) * 1e-12,)


chain("bernoulli (342k,256) threefry", bern_it, (jnp.float32(0.0),), (kt,))
chain("bernoulli (342k,256) rbg", bern_it, (jnp.float32(0.0),), (kr,))


def unif_it(v, i, k):
    kk = jax.random.fold_in(k, i)
    u = jax.random.uniform(kk, (ROWS, H))
    return (v[0] * 0.999 + jnp.sum(u) * 1e-12,)


chain("uniform (342k,256) threefry", unif_it, (jnp.float32(0.0),), (kt,))
chain("uniform (342k,256) rbg", unif_it, (jnp.float32(0.0),), (kr,))

# 2 dropout masks (inner MLP layers) + 2 predictor masks per step, student
# shapes: how much of the 13 ms do we recover?
PRED_PAIRS = 262_144 + 160_056


def step_masks(v, i, k):
    kk = jax.random.fold_in(k, i)
    s = jnp.float32(0.0)
    for j in range(2):
        m = jax.random.bernoulli(jax.random.fold_in(kk, j), 0.5, (ROWS, H))
        s += jnp.sum(m) * 1e-12
    for j in range(2):
        m = jax.random.bernoulli(
            jax.random.fold_in(kk, 10 + j), 0.5, (PRED_PAIRS, H)
        )
        s += jnp.sum(m) * 1e-12
    return (v[0] * 0.999 + s,)


chain("all step masks threefry", step_masks, (jnp.float32(0.0),), (kt,))
chain("all step masks rbg", step_masks, (jnp.float32(0.0),), (kr,))
log("DONE")
