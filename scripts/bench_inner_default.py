"""TPU check: default-argument retrieval paths after the matmul rewrite.

Drives ``top_k_partners`` exactly as the daemon does (block=None auto) at
both scales, to confirm the auto tile sizing picks the measured-good shapes.
"""

import sys
import time

import numpy as np

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/bench_inner_default.log"
log_f = open(OUT, "a", buffering=1)


def log(msg):
    log_f.write(f"[{time.strftime('%H:%M:%S')}] {msg}\n")


log("importing jax...")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

import os as _os; sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root
from llp_tpu.models.mlp import init_mlp  # noqa: E402
from llp_tpu.models.predictor import init_link_predictor  # noqa: E402
from llp_tpu.serve import encode_nodes, top_k_partners  # noqa: E402
from llp_tpu.serve.quant import QuantTable, quantize_table  # noqa: E402

Q, K_TOP = 256, 10
rng = np.random.default_rng(2)
log(f"devices: {jax.devices()}")

N1, D1, H1 = 235_000, 256, 256
xs = jnp.asarray(rng.normal(size=(N1, D1)).astype(np.float32))
enc = init_mlp(jax.random.PRNGKey(0), 2, D1, H1, H1)
h32 = encode_nodes(enc, xs, block=32768)
_ = float(h32[0, 0])
qt1 = quantize_table(h32)
_ = int(np.asarray(qt1.q[0, 0]))
del xs
pred1 = init_link_predictor(jax.random.PRNGKey(1), "inner", H1, H1, 1, 2)
qiA = jnp.asarray(rng.integers(0, N1, Q).astype(np.int32))

N2, H2 = 10_000_000, 128
BLOCK_BUILD = 2_000_000


@jax.jit
def build_block(key):
    h = jax.random.normal(key, (BLOCK_BUILD, H2), jnp.float32)
    a = jnp.max(jnp.abs(h), axis=1)
    scale = jnp.where(a > 0, a / 127.0, 1.0)
    q = jnp.clip(jnp.round(h / scale[:, None]), -127, 127).astype(jnp.int8)
    return q, scale


qs, ss = [], []
for i in range(N2 // BLOCK_BUILD):
    qq, s = build_block(jax.random.fold_in(jax.random.PRNGKey(7), i))
    qs.append(qq)
    ss.append(s)
qt2 = QuantTable(q=jnp.concatenate(qs), scale=jnp.concatenate(ss))
del qs, ss
_ = int(np.asarray(qt2.q[-1, -1]))
pred2 = init_link_predictor(jax.random.PRNGKey(1), "inner", H2, H2, 1, 2)
qiB = jnp.asarray(rng.integers(0, N2, Q).astype(np.int32))
log("tables ready")


def chain(name, fn, qi, n, kchain=5):
    @jax.jit
    def run(q0, tab):
        def step(q, _):
            vals, ids = fn(q, tab)
            q2 = (q + jnp.maximum(ids[:, 0], 0)) % np.int32(n)
            return q2.astype(jnp.int32), vals[0, 0]

        qf, vs = lax.scan(step, q0, None, length=kchain)
        return qf, vs

    def go(tab):
        try:
            qf, vs = run(qi, tab)
            _ = float(vs[-1]) + float(qf[0])
            t0 = time.perf_counter()
            qf, vs = run(qi, tab)
            _ = float(vs[-1]) + float(qf[0])
            dt = (time.perf_counter() - t0) / kchain * 1e3
            log(f"{name}: {dt:.2f} ms/call ({Q*n/(dt/1e3)/1e9:.1f} B pairs/s)")
        except Exception as ex:  # noqa: BLE001
            log(f"{name}: FAILED {type(ex).__name__}: {str(ex)[:300]}")

    return go


log("--- 235k, default args ---")
chain("fp32 exact default", lambda q, t: top_k_partners(
    pred1, t, q, k=K_TOP, mode="inner"), qiA, N1)(h32)
chain("fp32 approx default", lambda q, t: top_k_partners(
    pred1, t, q, k=K_TOP, mode="inner", approx=True), qiA, N1)(h32)
chain("int8 approx default", lambda q, t: top_k_partners(
    pred1, t, q, k=K_TOP, mode="inner", approx=True), qiA, N1)(qt1)
log("--- 10M int8, default args ---")
chain("int8 approx default", lambda q, t: top_k_partners(
    pred2, t, q, k=K_TOP, mode="inner", approx=True), qiB, N2, kchain=3)(qt2)
chain("int8 exact default", lambda q, t: top_k_partners(
    pred2, t, q, k=K_TOP, mode="inner"), qiB, N2, kchain=3)(qt2)
log("DONE")
