"""Follow-up (round 3): mlp retrieval block-size curve + 3-layer heads.

bench_mlp_fused.py showed the UNFUSED XLA path at block=4096 runs at ~150
TFLOP/s effective (52.9 ms at 235k fp32) — faster than the fused kernel
(68-76 ms) and 2-4x faster than the r2-recorded 102-193 ms, which were
measured at block=16384 (scripts/bench_quant.py:65).  Hypothesis: XLA fuses
the 2-layer head's final (F,1) matvec as a reduce-epilogue on the first
matmul at small blocks, so z1 never materializes; large blocks break that.

This script (a) reconstructs the unfused block-size curve, (b) tests
3-LAYER heads, where the middle (F,F) matmul cannot fuse as an epilogue —
the regime where the VMEM kernel should win, (c) rechecks 10M int8 at the
best block.
"""

import sys
import time

import numpy as np

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/bench_mlp_fused2.log"
log_f = open(OUT, "a", buffering=1)


def log(msg):
    log_f.write(f"[{time.strftime('%H:%M:%S')}] {msg}\n")


log("importing jax...")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

import os as _os; sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root
from llp_tpu.models.predictor import init_link_predictor  # noqa: E402
from llp_tpu.serve.engine import top_k_partners  # noqa: E402
from llp_tpu.serve.quant import QuantTable, quantize_table  # noqa: E402

N, H, Q, K_TOP = 235_868, 256, 256, 10
KCHAIN = 10
rng = np.random.default_rng(5)
log(f"devices: {jax.devices()}")

pred2 = init_link_predictor(jax.random.PRNGKey(1), "mlp", H, H, 1, 2)
pred3 = init_link_predictor(jax.random.PRNGKey(1), "mlp", H, H, 1, 3)
h_emb = jnp.asarray(rng.normal(size=(N, H)).astype(np.float32))
_ = float(h_emb[0, 0])
qi0 = jnp.asarray(rng.integers(0, N, Q).astype(np.int32))
log("table ready")


def chain(name, fn, hp, n_total=N, kchain=KCHAIN):
    @jax.jit
    def run(qi, hpv):
        def step(q, _):
            vals, ids = fn(q, hpv)
            q2 = (q + ids[:, 0]) % np.int32(n_total)
            return q2.astype(jnp.int32), vals[0, 0]

        qf, vs = lax.scan(step, qi, None, length=kchain)
        return qf, vs

    try:
        qf, vs = run(qi0, hp)
        _ = float(vs[-1]) + float(qf[0])
        t0 = time.perf_counter()
        qf, vs = run(qi0, hp)
        _ = float(vs[-1]) + float(qf[0])
        dt = (time.perf_counter() - t0) / kchain * 1e3
        log(f"{name}: {dt:.2f} ms/call")
        return dt
    except Exception as ex:  # noqa: BLE001
        log(f"{name}: FAILED {type(ex).__name__}: {str(ex)[:300]}")
        return None


def eng(pred, **kw):
    def fn(qi, hp):
        return top_k_partners(pred, hp, qi, k=K_TOP, mode="mlp", **kw)

    return fn


BF = jnp.bfloat16

log("--- 2-layer unfused block curve (fp32, approx) ---")
for b in (1024, 2048, 4096, 8192, 16384, 65536):
    chain(f"2L unfused b{b}", eng(pred2, approx=True, mlp_fused=False,
                                  block=b), h_emb)

log("--- 3-layer head (H=F=256) ---")
chain("3L unfused b4096 fp32", eng(pred3, approx=True, mlp_fused=False),
      h_emb)
chain("3L unfused b4096 bf16", eng(pred3, approx=True, mlp_fused=False,
                                   compute_dtype=BF), h_emb)
chain("3L unfused b1024 fp32",
      eng(pred3, approx=True, mlp_fused=False, block=1024), h_emb)
chain("3L FUSED fp32 approx auto", eng(pred3, approx=True, mlp_fused=True),
      h_emb)
chain("3L FUSED bf16 approx auto",
      eng(pred3, approx=True, mlp_fused=True, compute_dtype=BF), h_emb)

log("--- 10M int8, H=128: unfused block curve + 3L ---")
try:
    N10, H10 = 10_000_000, 128
    p10_2 = init_link_predictor(jax.random.PRNGKey(2), "mlp", H10, H10, 1, 2)
    p10_3 = init_link_predictor(jax.random.PRNGKey(2), "mlp", H10, H10, 1, 3)

    @jax.jit
    def build_block(key):
        rows = jax.random.normal(key, (2_000_000, H10), jnp.float32)
        a = jnp.max(jnp.abs(rows), axis=1)
        s = jnp.where(a > 0, a / 127.0, 1.0)
        return (jnp.clip(jnp.round(rows / s[:, None]), -127, 127)
                .astype(jnp.int8), s)

    cs_ = [build_block(jax.random.PRNGKey(100 + i)) for i in range(5)]
    qt10 = QuantTable(q=jnp.concatenate([c for c, _ in cs_]),
                      scale=jnp.concatenate([s for _, s in cs_]))
    del cs_
    _ = float(qt10.scale[-1])
    log("10M table built")
    qi0 = jnp.asarray(rng.integers(0, N10, Q).astype(np.int32))
    for b in (2048, 4096, 8192):
        chain(f"10M 2L unfused b{b} bf16",
              eng(p10_2, approx=True, mlp_fused=False, block=b,
                  compute_dtype=BF), qt10, n_total=N10, kchain=4)
    chain("10M 3L unfused b4096 bf16",
          eng(p10_3, approx=True, mlp_fused=False, compute_dtype=BF),
          qt10, n_total=N10, kchain=4)
    chain("10M 3L FUSED bf16 auto",
          eng(p10_3, approx=True, mlp_fused=True, compute_dtype=BF),
          qt10, n_total=N10, kchain=4)
except Exception as ex:  # noqa: BLE001
    log(f"10M phase FAILED {type(ex).__name__}: {str(ex)[:300]}")

log("DONE")
