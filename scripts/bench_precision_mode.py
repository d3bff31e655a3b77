"""MXU precision-mode timing for the fp32 dense matmuls (chained in-jit)."""

import sys
import time

import numpy as np

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/bench_prec.log"
log_f = open(OUT, "a", buffering=1)


def log(msg):
    log_f.write(f"[{time.strftime('%H:%M:%S')}] {msg}\n")


log("importing jax...")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

K = 50
N, D = 20000, 256
rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(N, D)), jnp.float32)
w = jnp.asarray(rng.normal(size=(D, D)) * 0.05, jnp.float32)


def chain(name, body):
    @jax.jit
    def run(x_):
        def step(h, _):
            return body(h), ()

        h, _ = lax.scan(step, x_, None, length=K)
        return h

    r = run(x)
    _ = float(jnp.sum(r[:1]))
    t0 = time.perf_counter()
    r = run(x)
    _ = float(jnp.sum(r[:1]))
    dt = (time.perf_counter() - t0) / K * 1e3
    log(f"{name}: {dt:.3f} ms/iter")


for prec in ["default", "bfloat16", "bfloat16_3x", "float32", "highest"]:
    try:
        p = {
            "default": lax.Precision.DEFAULT,
            "bfloat16": lax.Precision.DEFAULT,  # data stays f32; DEFAULT
            "bfloat16_3x": jax.lax.DotAlgorithmPreset.BF16_BF16_F32_X3,
            "float32": jax.lax.DotAlgorithmPreset.F32_F32_F32,
            "highest": lax.Precision.HIGHEST,
        }[prec]
        if prec == "bfloat16":
            continue
        if isinstance(p, jax.lax.DotAlgorithmPreset):
            body = lambda h, p=p: jnp.dot(h, w, precision=p)
        else:
            body = lambda h, p=p: jnp.dot(
                h, w, precision=p, preferred_element_type=jnp.float32
            )
        chain(f"matmul[{prec}]", body)
    except Exception as ex:  # noqa: BLE001
        log(f"matmul[{prec}]: FAILED {type(ex).__name__}: {ex}")

# error check: DEFAULT vs HIGHEST
a = jnp.dot(x, w, precision=lax.Precision.DEFAULT)
b = jnp.dot(x, w, precision=lax.Precision.HIGHEST)
log(f"max |default-highest| = {float(jnp.max(jnp.abs(a - b))):.3e} "
    f"(scale {float(jnp.max(jnp.abs(b))):.3e})")
log("DONE")
