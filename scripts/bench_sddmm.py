"""TPU validation + timing of the fused SDDMM scorer. Writes to argv[1]."""

import sys
import time

import numpy as np

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/bench_sddmm.log"
log_f = open(OUT, "a", buffering=1)


def log(msg):
    log_f.write(f"[{time.strftime('%H:%M:%S')}] {msg}\n")


log("importing jax...")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

import os as _os; sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root
from bench import DIM, HIDDEN, N_NODES  # noqa: E402
from llp_tpu.models.predictor import init_link_predictor  # noqa: E402
from llp_tpu.ops.edge_score import hadamard_mlp_score  # noqa: E402
from llp_tpu.ops.pallas.sddmm_kernel import fused_mlp_score  # noqa: E402

K = 50
B = 131072
head = init_link_predictor(jax.random.PRNGKey(0), "mlp", HIDDEN, HIDDEN, 1, 2)
key = jax.random.PRNGKey(1)
h = jax.random.normal(key, (N_NODES, HIDDEN))
src = jax.random.randint(jax.random.fold_in(key, 1), (B,), 0, N_NODES)
dst = jax.random.randint(jax.random.fold_in(key, 2), (B,), 0, N_NODES)

# value parity on the compiled kernel
hi = jnp.take(h, src[:4096], axis=0)
hj = jnp.take(h, dst[:4096], axis=0)
ref = np.asarray(hadamard_mlp_score(head["lins"], hi, hj))
out = np.asarray(fused_mlp_score(head["lins"], hi, hj))
err = float(np.max(np.abs(out - ref)))
log(f"compiled-kernel max|fused-xla| = {err:.3e}")
assert err < 1e-4, "parity failure"


def chain(name, score_fn):
    @jax.jit
    def run(h_):
        def step(h_, _):
            hi = jnp.take(h_, src, axis=0)
            hj = jnp.take(h_, dst, axis=0)
            s = score_fn(head["lins"], hi, hj)
            return h_ + jnp.sum(s) * 1e-12, ()

        h_, _ = lax.scan(step, h_, None, length=K)
        return h_

    r = run(h)
    _ = float(jnp.sum(r[:1]))
    t0 = time.perf_counter()
    r = run(h)
    _ = float(jnp.sum(r[:1]))
    dt = (time.perf_counter() - t0) / K * 1e3
    log(f"{name}: {dt:.3f} ms/iter ({B} pairs)")
    return dt


a = chain("score_xla", hadamard_mlp_score)
b = chain("score_fused", fused_mlp_score)
log(f"speedup {a / b:.2f}x")
log("DONE")
