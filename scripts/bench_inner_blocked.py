"""TPU measurement: blocked 'inner' retrieval after the matmul rewrite.

serve_scale10m_blocks.py showed the generic blocked path 26x off a direct
block matmul (the broadcast (Q,B,H) Hadamard XLA won't rewrite).  The engine
now scores 'inner' blocks as (Q,H)x(H,B) matmuls (int8 codes directly on
quantized tables).  Before numbers (BASELINE.md): 235k fp32 inner exact
27.0 ms; 10M int8 approx 672 ms.

Protocol: one process, chained scans, tables as jit args, log to argv[1].
"""

import sys
import time

import numpy as np

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/bench_inner_blocked.log"
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

# --- collab-scale fp32/int8 tables (N=235k, H=256) ---
N1, D1, H1 = 235_000, 256, 256
xs = jnp.asarray(rng.normal(size=(N1, D1)).astype(np.float32))
enc = init_mlp(jax.random.PRNGKey(0), 2, D1, H1, H1)
h32 = encode_nodes(enc, xs, block=32768)
_ = float(h32[0, 0])
qt1 = quantize_table(h32)
_ = int(np.asarray(qt1.q[0, 0]))
del xs
log(f"235k tables ready")
pred_inner1 = init_link_predictor(jax.random.PRNGKey(1), "inner", H1, H1, 1, 2)
qiA = jnp.asarray(rng.integers(0, N1, Q).astype(np.int32))


def chain(name, fn, qi, n, kchain=10):
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


log("--- 235k inner retrieval (was: exact fp32 27.0 ms) ---")
chain("exact fp32 blocked b16k", lambda q, t: top_k_partners(
    pred_inner1, t, q, k=K_TOP, mode="inner", block=16384), qiA, N1)(h32)
chain("exact int8 blocked b16k", lambda q, t: top_k_partners(
    pred_inner1, t, q, k=K_TOP, mode="inner", block=16384), qiA, N1)(qt1)
chain("approx fp32 single-pass (ref)", lambda q, t: top_k_partners(
    pred_inner1, t, q, k=K_TOP, mode="inner", approx=True), qiA, N1)(h32)
chain("approx int8 single-pass (ref)", lambda q, t: top_k_partners(
    pred_inner1, t, q, k=K_TOP, mode="inner", approx=True), qiA, N1)(qt1)

# --- 10M int8 table ---
N2, H2 = 10_000_000, 128
BLOCK_BUILD = 2_000_000


@jax.jit
def build_block(key):
    h = jax.random.normal(key, (BLOCK_BUILD, H2), jnp.float32)
    a = jnp.max(jnp.abs(h), axis=1)
    scale = jnp.where(a > 0, a / 127.0, 1.0)
    q = jnp.clip(jnp.round(h / scale[:, None]), -127, 127).astype(jnp.int8)
    return q, scale


t0 = time.time()
qs, ss = [], []
for i in range(N2 // BLOCK_BUILD):
    qq, s = build_block(jax.random.fold_in(jax.random.PRNGKey(7), i))
    qs.append(qq)
    ss.append(s)
qt2 = QuantTable(q=jnp.concatenate(qs), scale=jnp.concatenate(ss))
del qs, ss
_ = int(np.asarray(qt2.q[-1, -1]))
log(f"10M int8 table built in {time.time()-t0:.1f}s")
pred_inner2 = init_link_predictor(jax.random.PRNGKey(1), "inner", H2, H2, 1, 2)
qiB = jnp.asarray(rng.integers(0, N2, Q).astype(np.int32))

log("--- 10M int8 retrieval (was: approx 672 ms, exact 804 ms) ---")
for blk in (262144, 1_000_000, 2_000_000):
    chain(f"approx int8 blocked b{blk}", lambda q, t, b=blk: top_k_partners(
        pred_inner2, t, q, k=K_TOP, mode="inner", block=b, approx=True),
        qiB, N2, kchain=3)(qt2)
chain("exact int8 blocked b1M", lambda q, t: top_k_partners(
    pred_inner2, t, q, k=K_TOP, mode="inner", block=1_000_000), qiB, N2,
    kchain=3)(qt2)

# recall sanity after the rewrite (device, 10M)
try:
    va, ia = top_k_partners(pred_inner2, qt2, qiB, k=K_TOP, mode="inner",
                            block=1_000_000)
    vb, ib = top_k_partners(pred_inner2, qt2, qiB, k=K_TOP, mode="inner",
                            block=1_000_000, approx=True)
    a, b = np.asarray(ia), np.asarray(ib)
    rec = np.mean([
        len(set(a[i].tolist()) & set(b[i].tolist())) / K_TOP for i in range(Q)
    ])
    log(f"10M approx-vs-exact recall@{K_TOP}: {rec:.4f}; "
        f"probs sane: {np.isfinite(np.asarray(va)).all()}")
except Exception as ex:  # noqa: BLE001
    log(f"recall check FAILED {type(ex).__name__}: {str(ex)[:300]}")

log("DONE")
